"""Training-ready sharded corpus export.

The last stage of an LLM data pipeline materializes the cleaned corpus as
N deterministic shards (data-loader workers each read their own shard;
re-runs must produce byte-identical shard membership).  ``export_shards``
assigns ``shard = int(md5(salt+id)[:8], 16) % n_shards`` map-side (the
repo's cross-engine hash-gate device, engine/stages/sample.py), sorts by
(shard, id) so each shard's parquet files are internally ordered and the
partitioned write produces one contiguous file run per shard (repo rule:
``partition_cols`` after a parallel map without a sort -> one sliver file
per task x partition), and writes ``out_dir/shard=K/``.

It returns a MANIFEST table derived by reading the written files back —
(shard, n_rows, sum_idh) where ``sum_idh`` sums a second, independent
32-bit slice of the id hash (md5 hex chars 9..16) — so the driver oracle
(__ray_entry__ ``export_shards``) verifies the WHOLE write+read round
trip against DuckDB computing the same manifest from the source table:
wrong shard routing, dropped rows, or duplicated part files all break the
hash sum.

Scale: assignment is a stateless streaming map; the single all-to-all is
the (shard, id) sort every deterministic exporter needs; the manifest
aggregation moves one partial row per (block, shard).
"""

from __future__ import annotations

import os
import shutil
from hashlib import md5

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def _hash_cols(ids, salt: str):
    shard_h, idh = [], []
    for v in ids:
        hx = md5((salt + str(v)).encode()).hexdigest()
        shard_h.append(int(hx[:8], 16))
        idh.append(int(hx[8:16], 16))
    return shard_h, idh


def export_shards(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    out_dir: str,
    n_shards: int = 16,
    salt: str = "",
) -> ray.data.Dataset:
    """Write ``ds`` as ``n_shards`` hash-assigned parquet shards under
    ``out_dir`` (cleared first — write_parquet appends into existing
    dirs) and return the read-back manifest (shard, n_rows, sum_idh)."""

    def assign(t: pa.Table) -> pa.Table:
        sh, idh = _hash_cols(t.column(id_col).to_pylist(), salt)
        return t.append_column(
            "shard", pa.array([h % n_shards for h in sh], pa.int64())
        ).append_column("idh", pa.array(idh, pa.int64()))

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["shard", id_col])
        .write_parquet(out_dir, partition_cols=["shard"])
    )

    # manifest FROM THE WRITTEN FILES: verifies the full write+read loop.
    # Zero input rows write NO parquet files (the known gotcha) — return a
    # typed empty manifest instead of read_parquet's FileNotFoundError,
    # so an all-filtered corpus build finishes cleanly with 0 shards.
    if not os.path.isdir(out_dir) or not any(os.scandir(out_dir)):
        return ray.data.from_arrow(
            pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                    "sum_idh": pa.array([], pa.int64()),
                }
            )
        )
    back = ray.data.read_parquet(out_dir, columns=["shard", "idh"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # hive partition columns can read back dictionary/string-typed
        t = t.set_column(
            t.schema.get_field_index("shard"),
            "shard",
            pc.cast(t.column("shard"), pa.int64()),
        )
        # select by NAME before renaming: aggregate()'s key/aggregate column
        # order is pyarrow-version-specific (keys-first in 16.x)
        return (
            t.group_by("shard")
            .aggregate([("idh", "sum"), ("shard", "count")])
            .select(["shard", "idh_sum", "shard_count"])
            .rename_columns(["shard", "sum_idh", "n_rows"])
        )

    return (
        back.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            Sum("sum_idh", alias_name="sum_idh"), Sum("n_rows", alias_name="n_rows")
        )
        .map_batches(
            lambda t: t.select(["shard", "n_rows", "sum_idh"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def export_jsonl(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    out_dir: str,
    n_shards: int = 8,
    salt: str = "jsonl",
) -> ray.data.Dataset:
    """JSONL interchange export — the loader-friendly text format most
    LLM data pipelines ship — with the same write+read-verified manifest
    as ``export_shards``: shard/idh assigned map-side by the md5 gate,
    rows sorted by (shard, id) so every file is a contiguous sorted run,
    ``write_json`` streams line-delimited JSON, and the manifest
    (shard, n_rows, sum_idh) is derived by READING THE FILES BACK with
    ``read_json``.

    Layout note: Ray's JSON writer has no ``partition_cols``, so the
    shard is a FIELD on every line rather than a hive directory —
    loaders filter by field, or use ``export_shards`` (Parquet) for the
    directory-per-shard layout.  Integrity is identical: the read-back
    manifest breaks on wrong routing, dropped rows, or duplicated files.
    """

    def assign(t: pa.Table) -> pa.Table:
        sh, idh = _hash_cols(t.column(id_col).to_pylist(), salt)
        return t.append_column(
            "shard", pa.array([h % n_shards for h in sh], pa.int64())
        ).append_column("idh", pa.array(idh, pa.int64()))

    shutil.rmtree(out_dir, ignore_errors=True)
    (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["shard", id_col])
        .write_json(out_dir)
    )

    if not os.path.isdir(out_dir) or not any(os.scandir(out_dir)):
        return ray.data.from_arrow(
            pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                    "sum_idh": pa.array([], pa.int64()),
                }
            )
        )
    back = ray.data.read_json(out_dir, lines=True)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "shard": pc.cast(t.column("shard"), pa.int64()),
                "idh": pc.cast(t.column("idh"), pa.int64()),
            }
        )
        return (
            t.group_by("shard")
            .aggregate([("idh", "sum"), ("shard", "count")])
            .select(["shard", "idh_sum", "shard_count"])
            .rename_columns(["shard", "sum_idh", "n_rows"])
        )

    return (
        back.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            Sum("sum_idh", alias_name="sum_idh"), Sum("n_rows", alias_name="n_rows")
        )
        .map_batches(
            lambda t: t.select(["shard", "n_rows", "sum_idh"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def export_warc_shards(
    ds: ray.data.Dataset,
    *,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    as_http_response: bool = True,
) -> ray.data.Dataset:
    """Archive export: the pages corpus written as ``n_shards``
    ``.warc.gz`` files (one gzip member per record, the Common Crawl
    layout) with the export_shards manifest device — the manifest is
    built by READING the written archives back with the engine's own
    WARC parser (sources.warc.read_warc), so it verifies the complete
    write+parse round trip, not just the write call.

    shard = fnv1a(url) % n_shards (map-side); each shard's records are
    sorted by url inside its group before writing (deterministic bytes);
    one ``groupby(shard).map_groups`` writes the files — n_shards tasks,
    each streaming its group once.  Manifest: (shard, n_records,
    sum_urlh) with ``sum_urlh = sum(fnv1a(url) % 1e12)`` (bounded so a
    BIGINT sum cannot overflow at any realistic shard size).

    ``out_dir`` must be shared storage on a real cluster (each map task
    writes its own file there); local fs in this sandbox.
    """
    import pandas as pd

    from engine.sources.warc import read_warc, write_warc
    from engine.stages.text import fnv1a_batch

    def assign(t: pa.Table) -> pa.Table:
        h = fnv1a_batch([(u or "").encode() for u in t.column(url_col).to_pylist()])
        import numpy as np

        return t.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int64), pa.int64())
        )

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_group(df: "pd.DataFrame") -> "pd.DataFrame":
        s = int(df["shard"].iloc[0])
        df = df.sort_values(url_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{s:05d}.warc.gz")
        ts_iter = df[ts_col] if ts_col and ts_col in df.columns else [None] * len(df)
        n = write_warc(
            zip(df[url_col], ts_iter, df[html_col]), path,
            as_http_response=as_http_response,
        )
        return pd.DataFrame({"shard": [s], "written": [n]})

    written = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
        .count()
    )
    if written == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "n_records": pa.array([], pa.int64()),
                    "sum_urlh": pa.array([], pa.int64()),
                }
            )
        )

    back = read_warc(out_dir)

    def manifest_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        h = fnv1a_batch([(u or "").encode() for u in t.column("url").to_pylist()])
        sh = (h % np.uint64(n_shards)).astype(np.int64)
        uh = (h % np.uint64(1_000_000_000_000)).astype(np.int64)
        g = (
            pd.DataFrame({"shard": sh, "n_records": 1, "sum_urlh": uh})
            .groupby("shard", sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from collections import Counter as _Counter

    from engine.stages.common import collect_arrow_blocks

    cnt: "_Counter" = _Counter()
    sums: "_Counter" = _Counter()
    for blk in collect_arrow_blocks(
        back.map_batches(manifest_partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="shard",
    ):
        for s, n, u in zip(
            blk.column("shard").to_pylist(),
            blk.column("n_records").to_pylist(),
            blk.column("sum_urlh").to_pylist(),
        ):
            cnt[int(s)] += int(n)
            sums[int(s)] += int(u)
    ks = sorted(cnt)
    return ray.data.from_arrow(
        pa.table(
            {
                "shard": pa.array(ks, pa.int64()),
                "n_records": pa.array([cnt[k] for k in ks], pa.int64()),
                "sum_urlh": pa.array([sums[k] for k in ks], pa.int64()),
            }
        )
    )


def export_warc_dedup_shards(
    captures: ray.data.Dataset,
    *,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "ts",
    content_col: str = "content",
) -> ray.data.Dataset:
    """Storage-deduplicating archive export (Heritrix/wayback dedup
    writing, WARC/1.1 §6.7.2): per content digest, ONE capture keeps its
    payload (a ``response`` record); every other capture of the same
    digest is written as a slim ``revisit`` record carrying only headers
    (WARC-Payload-Digest + WARC-Refers-To-*), resolvable back to the
    original through the CDX (stages.cdx.resolve_revisit).

    Input rows: (url, ts, content) with ``ts`` int64 CDX14
    (yyyymmddhhmmss).  The original per digest is the (ts, url)-minimum
    capture — deterministic under any block layout.

    Shape: shard = fnv1a(digest) % n_shards — DIGEST-routed, so all
    captures of one payload co-locate in the shard-writer group and
    winner selection happens inside it: the payload crosses exactly ONE
    all-to-all (same count as the plain exporter; a url-routed layout
    would need a second digest shuffle or a join just to pick winners).
    Records are written in (url, ts) order (deterministic bytes modulo
    gzip mtime); one gzip member per record (cdx_index_shards geometry).

    Returns the manifest built by READING the archive back through the
    revisit-aware cdx_index_shards: (shard, n_records, n_revisits,
    payload_bytes) with payload_bytes = decompressed original-body bytes
    actually stored — the driver oracle recomputes all three from the
    captures derivation, so parity proves digest routing, winner choice,
    the revisit writer AND the revisit-aware parser in one loop.
    """
    import datetime as _dt
    import gzip

    import numpy as np
    import pandas as pd

    from engine.stages.cdx import cdx_index_shards
    from engine.stages.text import fnv1a_batch

    def assign(t: pa.Table) -> pa.Table:
        from engine.stages.dedup import content_md5_batch

        contents = t.column(content_col).to_pylist()
        digests = content_md5_batch(contents)
        sh = (
            fnv1a_batch([d.encode() for d in digests]) % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "url": t.column(url_col),
                "ts": t.column(ts_col).cast(pa.int64()),
                "content": t.column(content_col),
                "digest": pa.array(digests, pa.string()),
                "shard": pa.array(sh, pa.int64()),
            }
        )

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def _iso(ts14: int) -> str:
        return _dt.datetime.strptime(str(int(ts14)), "%Y%m%d%H%M%S").strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )

    def write_group(df: "pd.DataFrame") -> "pd.DataFrame":
        s = int(df["shard"].iloc[0])
        # Winner per digest = the (ts, url)-minimum capture, marked
        # POSITIONALLY (one row, not every key-equal row): exact duplicate
        # captures — the most-duplicated input a dedup exporter sees —
        # must still store the payload once, matching the oracle's
        # row_number() semantics.  Write order (url, ts) is deterministic;
        # ties beyond it are identical rows, so position is stable.
        df = df.sort_values(["url", "ts"], kind="mergesort").reset_index(drop=True)
        order = df.sort_values(["ts", "url"], kind="mergesort")
        winner_idx = set(order.groupby("digest", sort=False).head(1).index)
        winners = {
            df["digest"].iloc[j]: (df["url"].iloc[j], df["ts"].iloc[j])
            for j in winner_idx
        }
        path = os.path.join(out_dir, f"shard-{s:05d}.warc.gz")
        n_rev = 0
        with open(path, "wb") as out:
            for i, (url, ts, content, digest) in enumerate(
                zip(df["url"], df["ts"], df["content"], df["digest"])
            ):
                w_url, w_ts = winners[digest]
                date = _iso(ts).encode()
                if i in winner_idx:
                    payload = (content or "").encode("utf-8")
                    http = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                        + b"Content-Length: %d\r\n\r\n" % len(payload)
                        + payload
                    )
                    rec = (
                        b"WARC/1.0\r\n"
                        b"WARC-Type: response\r\n"
                        b"WARC-Target-URI: " + url.encode() + b"\r\n"
                        b"WARC-Date: " + date + b"\r\n"
                        b"WARC-Record-ID: <urn:md5:" + digest.encode() + b">\r\n"
                        b"WARC-Payload-Digest: md5:" + digest.encode() + b"\r\n"
                        b"Content-Type: application/http; msgtype=response\r\n"
                        b"Content-Length: %d\r\n\r\n" % len(http)
                        + http
                        + b"\r\n\r\n"
                    )
                else:
                    n_rev += 1
                    rec = (
                        b"WARC/1.0\r\n"
                        b"WARC-Type: revisit\r\n"
                        b"WARC-Target-URI: " + url.encode() + b"\r\n"
                        b"WARC-Date: " + date + b"\r\n"
                        b"WARC-Record-ID: <urn:revisit:"
                        + digest.encode()
                        + b":%d>\r\n" % i
                        + b"WARC-Refers-To-Target-URI: " + w_url.encode() + b"\r\n"
                        b"WARC-Refers-To-Date: " + _iso(w_ts).encode() + b"\r\n"
                        b"WARC-Profile: http://netpreserve.org/warc/1.0/"
                        b"revisit/identical-payload-digest\r\n"
                        b"WARC-Payload-Digest: md5:" + digest.encode() + b"\r\n"
                        b"Content-Type: application/http; msgtype=response\r\n"
                        b"Content-Length: 0\r\n\r\n"
                        b"\r\n\r\n"
                    )
                out.write(gzip.compress(rec))
        return pd.DataFrame({"shard": [s], "written": [len(df)], "revisits": [n_rev]})

    written = (
        captures.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
        .count()
    )
    empty = pa.table(
        {
            "shard": pa.array([], pa.int64()),
            "n_records": pa.array([], pa.int64()),
            "n_revisits": pa.array([], pa.int64()),
            "payload_bytes": pa.array([], pa.int64()),
        }
    )
    if written == 0:
        return ray.data.from_arrow(empty)

    idx = cdx_index_shards(out_dir)

    def manifest_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        fnames = t.column("filename").to_pylist()
        sh = [int(f.split("-")[1].split(".")[0]) for f in fnames]
        rev = [m == "warc/revisit" for m in t.column("mime").to_pylist()]
        bl = t.column("body_len").to_pylist()
        g = (
            pd.DataFrame(
                {
                    "shard": sh,
                    "n_records": 1,
                    "n_revisits": [int(r) for r in rev],
                    "payload_bytes": [0 if r else int(b) for r, b in zip(rev, bl)],
                }
            )
            .groupby("shard", sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from collections import Counter as _Counter

    from engine.stages.common import collect_arrow_blocks

    cnt: "_Counter" = _Counter()
    revs: "_Counter" = _Counter()
    pay: "_Counter" = _Counter()
    for blk in collect_arrow_blocks(
        idx.map_batches(manifest_partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="shard",
    ):
        for s, n, r, p in zip(
            blk.column("shard").to_pylist(),
            blk.column("n_records").to_pylist(),
            blk.column("n_revisits").to_pylist(),
            blk.column("payload_bytes").to_pylist(),
        ):
            cnt[int(s)] += int(n)
            revs[int(s)] += int(r)
            pay[int(s)] += int(p)
    ks = sorted(cnt)
    return ray.data.from_arrow(
        pa.table(
            {
                "shard": pa.array(ks, pa.int64()),
                "n_records": pa.array([cnt[k] for k in ks], pa.int64()),
                "n_revisits": pa.array([revs[k] for k in ks], pa.int64()),
                "payload_bytes": pa.array([pay[k] for k in ks], pa.int64()),
            }
        )
    )


def export_wat_shards(
    ds: ray.data.Dataset,
    *,
    out_dir: str,
    n_shards: int = 8,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> ray.data.Dataset:
    """WAT-style metadata archive export — the third Common Crawl
    derivative format beside the page archive (export_warc_shards) and
    the extracted-text archive (the .wet query): per page, ONE WARC
    ``metadata`` record whose JSON payload carries the envelope a WAT
    stores — content digest, html character length, and the extracted
    outlinks (``crawl_common.discover_links``, the crawl's own link
    discovery, so the WAT records exactly what the frontier would see).

    Layout mirrors the other exporters: fnv1a(url) shard routing,
    url-sorted members, one gzip member per record (the cdx geometry);
    JSON serialized with sorted keys / fixed separators so bytes are
    deterministic.  The manifest is built by reading the archive BACK
    through ``read_wat``: (shard, n_records, sum_urlh, sum_links,
    sum_html_len) — the SQL oracle recomputes all of it from the
    documents derivation, so parity proves shard routing, link
    extraction, the JSON writer AND the parser in one loop."""
    import datetime as _dt
    import gzip
    import json

    import numpy as np
    import pandas as pd

    from engine.pipelines.crawl_common import discover_links
    from engine.stages.text import fnv1a_batch

    def assign(t: pa.Table) -> pa.Table:
        h = fnv1a_batch([(u or "").encode() for u in t.column(url_col).to_pylist()])
        return t.append_column(
            "shard", pa.array((h % np.uint64(n_shards)).astype(np.int64), pa.int64())
        )

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_group(df: "pd.DataFrame") -> "pd.DataFrame":
        s = int(df["shard"].iloc[0])
        df = df.sort_values(url_col, kind="mergesort")
        path = os.path.join(out_dir, f"shard-{s:05d}.warc.gz")
        ts_iter = df[ts_col] if ts_col and ts_col in df.columns else [None] * len(df)
        n = 0
        with open(path, "wb") as out:
            for url, ts, html in zip(df[url_col], ts_iter, df[html_col]):
                hb = html or b""
                if isinstance(hb, str):
                    hb = hb.encode("utf-8")
                env = {
                    "url": url,
                    "digest": md5(hb).hexdigest(),
                    "length": len(hb.decode("utf-8", "replace")),
                    "outlinks": list(discover_links(url, hb)),
                }
                payload = json.dumps(
                    env, sort_keys=True, separators=(",", ":")
                ).encode("utf-8")
                if ts is None or ts != ts:  # None or pandas NaT
                    date = _dt.datetime(1970, 1, 1)
                else:
                    date = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                rec = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: metadata\r\n"
                    b"WARC-Target-URI: " + url.encode() + b"\r\n"
                    b"WARC-Date: "
                    + date.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
                    + b"\r\n"
                    b"Content-Type: application/json\r\n"
                    b"Content-Length: %d\r\n\r\n" % len(payload)
                    + payload
                    + b"\r\n\r\n"
                )
                out.write(gzip.compress(rec))
                n += 1
        return pd.DataFrame({"shard": [s], "written": [n]})

    written = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
        .count()
    )
    empty = pa.table(
        {
            "shard": pa.array([], pa.int64()),
            "n_records": pa.array([], pa.int64()),
            "sum_urlh": pa.array([], pa.int64()),
            "sum_links": pa.array([], pa.int64()),
            "sum_html_len": pa.array([], pa.int64()),
        }
    )
    if written == 0:
        return ray.data.from_arrow(empty)

    back = read_wat(out_dir)

    def manifest_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        h = fnv1a_batch([(u or "").encode() for u in t.column("url").to_pylist()])
        sh = (h % np.uint64(n_shards)).astype(np.int64)
        uh = (h % np.uint64(1_000_000_000_000)).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "shard": sh,
                    "n_records": 1,
                    "sum_urlh": uh,
                    "sum_links": t.column("n_links").to_numpy(zero_copy_only=False),
                    "sum_html_len": t.column("html_len").to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby("shard", sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from collections import Counter as _Counter

    from engine.stages.common import collect_arrow_blocks

    agg: dict = {}
    for blk in collect_arrow_blocks(
        back.map_batches(
            manifest_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="shard",
    ):
        for s, n, u, l, hl in zip(
            blk.column("shard").to_pylist(),
            blk.column("n_records").to_pylist(),
            blk.column("sum_urlh").to_pylist(),
            blk.column("sum_links").to_pylist(),
            blk.column("sum_html_len").to_pylist(),
        ):
            c = agg.setdefault(int(s), [0, 0, 0, 0])
            c[0] += int(n); c[1] += int(u); c[2] += int(l); c[3] += int(hl)
    ks = sorted(agg)
    return ray.data.from_arrow(
        pa.table(
            {
                "shard": pa.array(ks, pa.int64()),
                "n_records": pa.array([agg[k][0] for k in ks], pa.int64()),
                "sum_urlh": pa.array([agg[k][1] for k in ks], pa.int64()),
                "sum_links": pa.array([agg[k][2] for k in ks], pa.int64()),
                "sum_html_len": pa.array([agg[k][3] for k in ks], pa.int64()),
            }
        )
    )


def read_wat(paths, *, filesystem=None) -> ray.data.Dataset:
    """Read WAT shard file(s) written by ``export_wat_shards`` back into
    rows (url, ts, digest, html_len, n_links, outlinks) — the metadata
    counterpart of sources.warc.read_warc (which deliberately skips
    ``metadata`` records; WAT readers want ONLY them).  Per-file
    parallelism, same path-expansion rule as every WARC reader."""
    import datetime as _dt
    import gzip
    import io
    import json

    from engine.sources.warc import (
        _expand_warc_paths,
        _parse_warc_date,
        _read_headers,
    )

    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "digest": pa.array([], pa.string()),
            "html_len": pa.array([], pa.int64()),
            "n_links": pa.array([], pa.int64()),
            "outlinks": pa.array([], pa.list_(pa.string())),
        }
    )
    fs, files = _expand_warc_paths(paths, filesystem)
    if not files:
        return ray.data.from_arrow(empty)
    paths_ds = ray.data.from_items(
        [{"path": f} for f in files], override_num_blocks=len(files)
    )

    def parse(t: pa.Table) -> pa.Table:
        urls, tss, digs, hls, nls, links = [], [], [], [], [], []
        for p in t.column("path").to_pylist():
            if fs is not None:
                from engine.sources.resilient import fetch_bytes

                raw = fetch_bytes(p, filesystem=fs, attempts=5)
            else:
                with open(p, "rb") as f:
                    raw = f.read()
            stream = (
                gzip.GzipFile(fileobj=io.BytesIO(raw))
                if raw[:2] == b"\x1f\x8b"
                else io.BytesIO(raw)
            )
            while True:
                head = _read_headers(stream)
                if head is None:
                    break
                _, headers = head
                length = int(headers.get(b"content-length", b"0"))
                payload = stream.read(length)
                if len(payload) < length:
                    break
                if (
                    headers.get(b"warc-type") != b"metadata"
                    or headers.get(b"warc-target-uri") is None
                ):
                    continue
                env = json.loads(payload.decode("utf-8"))
                urls.append(headers[b"warc-target-uri"].decode("utf-8", "replace"))
                tss.append(_parse_warc_date(headers.get(b"warc-date")))
                digs.append(env.get("digest", ""))
                hls.append(int(env.get("length", 0)))
                ol = env.get("outlinks", [])
                nls.append(len(ol))
                links.append(ol)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "digest": pa.array(digs, pa.string()),
                "html_len": pa.array(hls, pa.int64()),
                "n_links": pa.array(nls, pa.int64()),
                "outlinks": pa.array(links, pa.list_(pa.string())),
            }
        )

    return paths_ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def balanced_shards(
    ds: ray.data.Dataset,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> ray.data.Dataset:
    """Size-balanced shard assignment: round-robin over the size-DESC
    order — the classic LPT-style balancer for training-export shards
    (export_shards' hash sharding balances COUNTS; at 100 TB the byte
    skew between shards is what stalls the slowest loader).  Guarantees
    max-min shard byte sums <= max document size.

    Output ``(id, size, rank, shard)`` with ``rank`` = 0-based position
    in (size desc, id asc) order and ``shard = rank % n_shards`` —
    deterministic and SQL-exact (row_number window).

    Shape: ONLY the (id, size) projection sorts (text never shuffles);
    global ranks come from the pack_sequences two-phase device — one tiny
    (first-key, count) row per block to the driver, prefix sums back via
    ray.put.  Two passes over a two-column table, no corpus-sized driver
    state.
    """
    import numpy as np
    import pyarrow.compute as pc  # noqa: F401

    s = (
        ds.select_columns([id_col, size_col])
        .sort([size_col, id_col], descending=[True, False])
        .materialize()
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k_size": pa.array(
                    [t.column(size_col)[0].as_py()] if t.num_rows else [],
                    pa.int64(),
                ),
                "k_id": pa.array(
                    [t.column(id_col)[0].as_py()] if t.num_rows else [],
                    pa.int64(),
                ),
                "cnt": pa.array([t.num_rows] if t.num_rows else [], pa.int64()),
            }
        )

    parts = s.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    # block order = (size desc, id asc) of each block's first row
    parts.sort(key=lambda r: (-r["k_size"], r["k_id"]))
    offsets = {}
    acc = 0
    for r in parts:
        offsets[(r["k_size"], r["k_id"])] = acc
        acc += r["cnt"]
    off_ref = ray.put(offsets)

    def assign(t: pa.Table, ref=off_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    size_col: pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                }
            )
        offs = ray.get(ref)
        base = offs[
            (t.column(size_col)[0].as_py(), t.column(id_col)[0].as_py())
        ]
        rank = base + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                size_col: t.column(size_col).cast(pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "shard": pa.array(rank % n_shards, pa.int64()),
            }
        )

    return s.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def parquet_meta_counts(paths) -> "ray.data.Dataset":
    """Row counts from Parquet FOOTER METADATA only — zero data pages
    read (the row count lives in the file metadata; at 100 TB a
    count(*) that scans is wrong by construction).  One tiny Ray task
    per file via ``from_items``; emits ``(path, n_rows, n_row_groups,
    n_columns)`` per file.  The same device extends to per-row-group
    min/max pruning audits (``zonemap`` consumes those)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    def meta(batch):
        rows = []
        for p in batch["item"]:
            md = pq.ParquetFile(p).metadata
            rows.append((p, md.num_rows, md.num_row_groups, md.num_columns))
        return pa.table(
            {
                "path": pa.array([r[0] for r in rows], pa.string()),
                "n_rows": pa.array([r[1] for r in rows], pa.int64()),
                "n_row_groups": pa.array([r[2] for r in rows], pa.int64()),
                "n_columns": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    return ray.data.from_items(list(paths)).map_batches(
        meta, batch_format="numpy"
    )
