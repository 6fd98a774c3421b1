"""Head-metadata directives — meta-robots flags and hreflang alternates.

Two page-level signals a web-scale indexer must extract before the sink:

* **meta robots** (``<meta name="robots" content="noindex, nofollow">``)
  — the in-page analog of robots.txt.  The reference indexes every
  processed record unconditionally
  (`/root/reference/warc_indexer/indexer/process.py:215-260` has no
  robots-meta check); a production deployment of the same pipeline must
  drop ``noindex`` pages before the ES bulk sink and stop propagating
  links from ``nofollow`` pages in the crawl frontier.  Directive
  resolution (multiple tags union, most-restrictive wins, ``none`` =
  noindex+nofollow) lives in ``html_extract.get_meta_robots``.

* **hreflang alternates** (``<link rel="alternate" hreflang="de"
  href=...>``) — the multilingual-cluster annotation; flattened to one
  (doc, lang, href) row per alternate so downstream joins can build
  language clusters or validate reciprocity.

Scale shape: ONE stateless ``map_batches`` parse pass each (the same
HTMLTree stack the extraction pipeline uses — parsing per document IS
the work, like `extract.py`); no shuffle, html never leaves its block,
outputs are narrow typed tables.  At 100 TB both run as pure streaming
map stages.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_ROBOTS_COLS = ("noindex", "nofollow", "noarchive", "nosnippet")


def _parse(html):
    from engine.html_extract import HTMLTree

    try:
        return HTMLTree.parse(html if isinstance(html, str) else html.decode("utf-8", "replace"))
    except Exception:
        return None


def meta_robots(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, noindex, nofollow, noarchive, nosnippet) 0/1 int64 flags
    per page; see module docstring for semantics."""

    def per_batch(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_meta_robots

        ids, flags = [], {c: [] for c in _ROBOTS_COLS}
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = _parse(html or "")
            f = (
                get_meta_robots(tree)
                if tree is not None
                else {c: False for c in _ROBOTS_COLS}
            )
            ids.append(int(d))
            for c in _ROBOTS_COLS:
                flags[c].append(int(f[c]))
        cols = {id_col: pa.array(ids, pa.int64())}
        cols.update(
            {c: pa.array(flags[c], pa.int64()) for c in _ROBOTS_COLS}
        )
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def hreflang_map(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Flattened (doc_id, hreflang, href) rows, one per alternate link in
    document order; pages with no alternates contribute no rows."""

    def per_batch(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_hreflang_alternates

        ids, langs, hrefs = [], [], []
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = _parse(html or "")
            if tree is None:
                continue
            for lang, href in get_hreflang_alternates(tree):
                ids.append(int(d))
                langs.append(lang)
                hrefs.append(href)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "hreflang": pa.array(langs, pa.string()),
                "href": pa.array(hrefs, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def hreflang_reciprocal(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: str = "url",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Hreflang reciprocity validation: an alternate annotation only
    counts (Google's documented rule) when the TARGET page annotates
    back — non-reciprocal links are ignored by search engines and are
    the #1 hreflang deployment bug.  Output: one row per alternate edge
    ``(doc_id, hreflang, href, reciprocal)`` with reciprocal=1 iff the
    reverse (href -> page url) edge exists anywhere in the corpus.

    Shape: the parse pass emits (src_url, dst_url) edges (self-links
    drop); reciprocity is a semi-join of the edge set against its own
    reverse, done union+groupby style per CLAUDE.md — pair key (lo, hi)
    = sorted url pair, bucketed by a COARSE uniform fnv1a hash so the
    map_groups python overhead is per-bucket, and each bucket resolves
    vectorized (pandas groupby nunique over directions).  Text/html
    never shuffles; edge rows are narrow strings.
    """
    import numpy as np

    def edges(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_hreflang_alternates
        from engine.stages.text import fnv1a_batch

        ids, langs, srcs, dsts = [], [], [], []
        for d, u, html in zip(
            t.column(id_col).to_pylist(),
            t.column(url_col).to_pylist(),
            t.column(html_col).to_pylist(),
        ):
            tree = _parse(html or "")
            if tree is None:
                continue
            for lang, href in get_hreflang_alternates(tree):
                if href == u:
                    continue
                ids.append(int(d))
                langs.append(lang)
                srcs.append(u or "")
                dsts.append(href)
        lo = [min(a, b) for a, b in zip(srcs, dsts)]
        hi = [max(a, b) for a, b in zip(srcs, dsts)]
        bkt = (
            fnv1a_batch([f"{a}|{b}".encode() for a, b in zip(lo, hi)])
            .astype(np.int64) & ((1 << 63) - 1)
        ) % n_buckets
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "hreflang": pa.array(langs, pa.string()),
                "src": pa.array(srcs, pa.string()),
                "href": pa.array(dsts, pa.string()),
                "lo": pa.array(lo, pa.string()),
                "hi": pa.array(hi, pa.string()),
                "bucket": pa.array(bkt, pa.int64()),
            }
        )

    def resolve(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "hreflang": pd.Series([], dtype="object"),
                    "href": pd.Series([], dtype="object"),
                    "reciprocal": pd.Series([], dtype="int64"),
                }
            )
        fwd = df["src"] == df["lo"]
        dirs = np.where(fwd, 0, 1).astype(np.int64)
        key = df["lo"] + "\x00" + df["hi"]
        both = (
            pd.DataFrame({"k": key, "d": dirs})
            .groupby("k")["d"].transform("nunique") == 2
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "hreflang": df["hreflang"],
                "href": df["href"],
                "reciprocal": both.astype("int64").values,
            }
        )

    edge_ds = ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
    return edge_ds.groupby("bucket").map_groups(resolve, batch_format="pandas")
