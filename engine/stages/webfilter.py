"""Web-corpus filtering signals: badword dictionary stats, mirror-host
detection, soft-404 classification.

Three small, shuffle-light operators a crawl->training-data pipeline
runs between extraction and dedup:

``badword_stats``
    Dictionary-based token filter (the C4/CCNet "blocklist" pass): per
    document, how many tokens are in a banned-word list, as exact counts
    plus a bit-reproducible ppm integer and a threshold flag.  Fully
    vectorized: ``split_pattern_regex`` -> flatten -> ``pc.is_in`` ->
    ``np.add.reduceat`` over list offsets; no per-row Python, no shuffle.

``mirror_detect``
    Mirrored-content detection across hosts (the classic crawl problem:
    the same page served from N mirrors).  Content md5 per page (the
    same cross-engine hash formula sample.py standardizes on — DuckDB
    has ``md5`` natively), grouped by hash; hashes seen on more than one
    distinct host are mirrors.  The hash cardinality is corpus-sized, so
    the group step uses the COARSE-BUCKET map_groups reduce (PERF.md
    #31/#37): bucket by a slice of the md5, resolve each bucket with one
    vectorized pandas groupby — per-group Python overhead paid per
    BUCKET, not per hash.  Only (md5, host, id) rows shuffle, never text.

``soft404_detect``
    Soft-404 classification (a 200-status page whose content says "not
    found"): an error-marker regex over the title plus a thin-body
    gate.  One stateless vectorized pass.
"""

from __future__ import annotations

from hashlib import md5
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_WS_RX = r"[\t\n\x0b\x0c\r ]+"
_SOFT404_RX = r"(?i)(not found|404|error|does not exist|no longer available)"


def badword_stats(
    ds: ray.data.Dataset,
    words: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bad_ppm: int = 100_000,
) -> ray.data.Dataset:
    """(id, n_tokens, n_bad, bad_ppm, flagged) per document.

    ``bad_ppm = floor(1e6 * n_bad / max(n_tokens, 1))`` (the text.py
    quality_scores fixed-point convention — bit-reproducible across
    engines); ``flagged = 1`` iff ``bad_ppm >= max_bad_ppm``.  Exact,
    case-sensitive token membership against ``words``.
    """
    value_set = pa.array(sorted(set(words)), pa.string())
    out_schema = {
        id_col: pa.int64(),
        "n_tokens": pa.int64(),
        "n_bad": pa.int64(),
        "bad_ppm": pa.int64(),
        "flagged": pa.int64(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        text = pc.fill_null(t.column(text_col), "")
        toks = pc.split_pattern_regex(text, pattern=_WS_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # regex split leaves '' fragments at string edges — they are not
        # tokens; count only non-empty pieces
        nonempty = (
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
        )
        bad = (
            pc.is_in(flat, value_set=value_set)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )

        def roll(v: np.ndarray) -> np.ndarray:
            if len(v) == 0:
                return np.zeros(len(lens), dtype=np.int64)
            out = np.add.reduceat(v.astype(np.int64), starts)
            # reduceat repeats values for zero-length segments; mask them
            return np.where(lens > 0, out, 0)

        n_tok = roll(nonempty)
        n_bad = roll(bad)
        ppm = np.floor(
            1_000_000.0 * n_bad / np.maximum(n_tok, 1)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_bad": pa.array(n_bad, pa.int64()),
                "bad_ppm": pa.array(ppm, pa.int64()),
                "flagged": pa.array(
                    (ppm >= max_bad_ppm).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def md5_hex_batch(values) -> list:
    """md5 hex digests of string values — THE content-hash formula
    (matches DuckDB ``md5(col)`` for ascii/utf-8 strings)."""
    return [md5((v or "").encode()).hexdigest() for v in values]


def mirror_detect(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    host_col: str = "host",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """(content_md5, n_hosts, n_pages, rep_doc) for every content hash
    served by MORE THAN ONE distinct host (rep_doc = min id).  See
    module docstring for the shuffle shape."""

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "content_md5": pa.array([], pa.string()),
                    host_col: pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                }
            )
        hx = md5_hex_batch(
            pc.fill_null(t.column(content_col), "").to_pylist()
        )
        bucket = pa.array(
            [int(h[:8], 16) % n_buckets for h in hx], pa.int64()
        )
        return pa.table(
            {
                "bucket": bucket,
                "content_md5": pa.array(hx, pa.string()),
                host_col: t.column(host_col).cast(pa.string()),
                id_col: t.column(id_col).cast(pa.int64()),
            }
        )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("content_md5", sort=False)
            .agg(
                n_hosts=(host_col, "nunique"),
                n_pages=(id_col, "size"),
                rep_doc=(id_col, "min"),
            )
            .reset_index()
        )
        g = g[g["n_hosts"] > 1]
        for c in ("n_hosts", "n_pages", "rep_doc"):
            g[c] = g[c].astype(np.int64)
        return g

    out = (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )

    def strip(t: pa.Table) -> pa.Table:
        cols = ["content_md5", "n_hosts", "n_pages", "rep_doc"]
        if t.num_rows == 0 or "content_md5" not in t.column_names:
            return pa.table(
                {
                    "content_md5": pa.array([], pa.string()),
                    "n_hosts": pa.array([], pa.int64()),
                    "n_pages": pa.array([], pa.int64()),
                    "rep_doc": pa.array([], pa.int64()),
                }
            )
        return t.select(cols)

    return out.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def soft404_detect(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    title_col: str = "title",
    chars_col: str = "n_chars",
    thin_chars: int = 600,
    marker_rx: str = _SOFT404_RX,
) -> ray.data.Dataset:
    """(id, marker, soft404): ``marker=1`` iff the title matches the
    error regex; ``soft404=1`` iff marker AND body length below
    ``thin_chars`` (a 200-status page masquerading as an error)."""

    out_schema = {
        id_col: pa.int64(),
        "marker": pa.int64(),
        "soft404": pa.int64(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        title = pc.fill_null(t.column(title_col), "")
        marker = (
            pc.match_substring_regex(title, marker_rx)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        chars = (
            pc.fill_null(t.column(chars_col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        soft = marker & (chars < thin_chars)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "marker": pa.array(marker.astype(np.int64), pa.int64()),
                "soft404": pa.array(soft.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def host_boilerplate(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    min_docs: int = 3,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Host-scoped boilerplate lines: every (host, line) pair that occurs
    in at least ``min_docs`` DISTINCT documents of that host — site
    chrome (nav bars, footers, cookie banners) that CCNet-style
    cross-corpus line dedup (clean.line_dedup) would dilute across
    hosts.  Output (host, line, n_docs, n_occurrences).

    Shape: one split pass emits (bucket, host, line, doc) rows — the
    per-batch pre-aggregation dedups (host, line, doc) triples and sums
    occurrence counts, so repeated lines within one batch collapse
    before the shuffle; the distinct-doc count then uses the
    coarse-bucket map_groups reduce (PERF.md #31): bucket = md5 slice of
    host||line, one vectorized pandas groupby per bucket.  Text leaves
    its block only as (short) line strings that survive per-batch dedup.
    """
    import pyarrow.compute as pc

    def keyed(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                host_col: pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "n_occurrences": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        text = pc.fill_null(t.column(text_col), "")
        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines).to_pylist()
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        hosts = t.column(host_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        agg: dict = {}
        k = 0
        for row, ln in enumerate(lens):
            h, d = hosts[row], int(ids[row])
            for _ in range(int(ln)):
                key = (h, flat[k], d)
                agg[key] = agg.get(key, 0) + 1
                k += 1
        if not agg:
            return empty
        keys = list(agg.keys())
        return pa.table(
            {
                "bucket": pa.array(
                    [
                        int(md5((h + "\x00" + s).encode()).hexdigest()[:8], 16)
                        % n_buckets
                        for h, s, _ in keys
                    ],
                    pa.int64(),
                ),
                host_col: pa.array([h for h, _, _ in keys], pa.string()),
                "line": pa.array([s for _, s, _ in keys], pa.string()),
                id_col: pa.array([d for _, _, d in keys], pa.int64()),
                "n_occurrences": pa.array(
                    [agg[key] for key in keys], pa.int64()
                ),
            }
        )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([host_col, "line"], sort=False)
            .agg(
                n_docs=(id_col, "nunique"),
                n_occurrences=("n_occurrences", "sum"),
            )
            .reset_index()
        )
        g = g[g["n_docs"] >= min_docs]
        for c in ("n_docs", "n_occurrences"):
            g[c] = g[c].astype(np.int64)
        return g

    out = (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )

    def strip(t: pa.Table) -> pa.Table:
        cols = [host_col, "line", "n_docs", "n_occurrences"]
        if t.num_rows == 0 or "line" not in t.column_names:
            return pa.table(
                {
                    host_col: pa.array([], pa.string()),
                    "line": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        return t.select(cols)

    return out.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
