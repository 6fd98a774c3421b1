"""Hash-bucketed pages layout: the fetch-join scale path.

At 10^10-URL scale, a crawl wave must not scan the whole pages corpus to
fetch a budget-bounded selection.  The fix is a one-time ingest layout:
partition the pages table by ``url_hash % n_buckets`` (hive-style
``bucket=K/`` directories via ``write_parquet(partition_cols=...)``).  Each
wave then reads ONLY the buckets containing selected URLs — I/O proportional
to selection size, not corpus size, and the same layout serves every future
wave (one shuffle amortized over the whole crawl).

``layout.json`` records n_buckets so readers don't guess.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional

import numpy as np
import pyarrow as pa
import ray.data

from engine.canonicalize import canonicalize_url
from engine.ids import url_hash64

LAYOUT_FILE = "_layout.json"  # "_" prefix: ignored by pyarrow dataset discovery


def bucketize_pages(
    pages_path: str, out_dir: str, n_buckets: int = 64
) -> str:
    """One-time re-layout: pages -> out_dir/bucket=K/... by url_hash.

    The bucket is computed on the CANONICAL url (the same key the crawl
    selects on), so lookups never miss due to spelling differences.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        canon = [canonicalize_url(u) or "" for u in urls]
        b = (url_hash64(canon) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    ds = ray.data.read_parquet(pages_path).map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    # Sort by bucket before the partitioned write: without it every write
    # task emits a sliver into every bucket directory (tasks x buckets tiny
    # files) and each wave's read pays per-file task overhead.  The sort is
    # a one-time ingest shuffle that leaves ~1 file per bucket.
    ds.sort("bucket").write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, LAYOUT_FILE), "w") as f:
        json.dump({"n_buckets": n_buckets, "key": "url_hash64(canonical_url)"}, f)
    return out_dir


def bucketize_links(pages_path: str, out_dir: str, n_buckets: int = 64) -> str:
    """One-time ingest: pages -> bucketed LINK GRAPH (url, links).

    A crawl wave needs a page's out-links, not its bytes; parsing HTML per
    wave re-does the extraction pipeline's work.  This derives the link
    table once (same discover_links the oracle uses, so crawl conformance
    is unchanged) at ~10x smaller than the html column, bucketed by
    canonical-url hash for pruned per-wave reads.
    """
    from engine.pipelines.crawl_common import discover_links

    def to_links(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        canon, links = [], []
        for u, h in zip(urls, htmls):
            c = canonicalize_url(u)
            if c is None:
                continue
            canon.append(c)
            links.append(discover_links(c, h) if h is not None else [])
        b = (url_hash64(canon) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "url": pa.array(canon, pa.string()),
                "links": pa.array(links, pa.list_(pa.string())),
                "bucket": pa.array(b, pa.int32()),
            }
        )

    ds = ray.data.read_parquet(pages_path, columns=["url", "html"]).map_batches(
        to_links, batch_format="pyarrow", zero_copy_batch=True
    )
    ds.sort("bucket").write_parquet(out_dir, partition_cols=["bucket"])
    with open(os.path.join(out_dir, LAYOUT_FILE), "w") as f:
        json.dump(
            {"n_buckets": n_buckets, "key": "url_hash64(canonical_url)", "kind": "links"},
            f,
        )
    return out_dir


def is_bucketed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, LAYOUT_FILE))


def n_buckets_of(path: str) -> int:
    with open(os.path.join(path, LAYOUT_FILE)) as fh:
        return json.load(fh)["n_buckets"]


def layout_kind(path: str) -> str:
    with open(os.path.join(path, LAYOUT_FILE)) as fh:
        return json.load(fh).get("kind", "pages")


def read_buckets_for(
    path: str,
    urls: Iterable[str],
    columns: Optional[List[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Read only the bucket partitions that can contain the given URLs.

    ``override_num_blocks`` right-sizes block count to the *selection* size:
    a politeness-bounded wave over many small buckets otherwise produces
    dozens of sliver blocks whose per-task overhead dominates the wave.
    """
    import glob as _glob

    nb = n_buckets_of(path)
    needed = sorted({int(h % np.uint64(nb)) for h in url_hash64(list(urls))})
    paths = [
        f
        for k in needed
        for f in sorted(_glob.glob(os.path.join(path, f"bucket={k}", "*.parquet")))
    ]
    if not paths:
        # Empty selection: derive the empty table's types from a real
        # parquet footer of the layout (html is binary, warc_ts timestamp,
        # links list<string> — an all-string default would hand downstream
        # stages a mismatched schema).
        import pyarrow.parquet as _pq

        any_files = sorted(
            _glob.glob(os.path.join(path, "bucket=*", "*.parquet"))
        )
        cols = columns or ["url"]
        if any_files:
            schema = _pq.read_schema(any_files[0])
            fields = {f.name: f.type for f in schema}
            empty = pa.table(
                {c: pa.array([], fields.get(c, pa.string())) for c in cols}
            )
        else:
            empty = pa.table({c: pa.array([], pa.string()) for c in cols})
        return ray.data.from_arrow(empty)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = min(override_num_blocks, len(paths))
    return ray.data.read_parquet(paths, columns=columns, **kwargs)
