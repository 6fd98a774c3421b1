"""HTTP Cache-Control -> crawler revisit policy.

A polite recrawler honors origin caching directives (RFC 9111) the same
way a shared cache does: ``no-store`` / ``no-cache`` / ``private`` mean
"do not reuse — refetch on next visit" (a crawler's store is a shared
cache, so ``private`` excludes it), ``max-age=N`` bounds reuse at N
seconds, and an absent header falls back to the crawl default.  The
reference fetches WARCs (headers travel in the records,
`/root/reference/warc_indexer/indexer/warcio.py` record payloads) but
never interprets them; a live recrawl scheduler must.

``cache_policy`` maps a header-string column to
``(id, max_age, no_store, revisit_s)``:

- ``max_age``   — parsed ``max-age`` seconds, -1 when absent/unparsable
- ``no_store``  — 1 when any of no-store / no-cache / private is present
                  (token-boundary matched, so ``no-cachex`` never counts)
- ``revisit_s`` — 0 when no_store, else max_age when present, else
                  ``default_s``

Shape: one stateless ``map_batches`` pass, ZERO per-row Python — the
directives are matched by ``pc.match_substring_regex`` with token
boundaries and ``max-age`` is pulled by one ``pc.extract_regex``; all
decisions are int64 numpy algebra.  No shuffle; headers never leave
their block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# token-boundary directive match: start-or-separator before, end-or-
# separator after (RFC 9111 directives are comma-separated tokens)
_NOSTORE_RX = r"(?i)(?:^|[\s,])(?:no-store|no-cache|private)(?:$|[\s,=])"
_MAXAGE_RX = r"(?i)(?:^|[\s,])max-age=(?P<age>[0-9]+)(?:$|[\s,])"


def cache_policy(
    ds: ray.data.Dataset,
    *,
    header_col: str = "cache_control",
    id_col: str = "doc_id",
    default_s: int = 86400,
) -> ray.data.Dataset:
    """(id, max_age, no_store, revisit_s) per row; see module docstring."""

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "max_age": pa.array([], pa.int64()),
                "no_store": pa.array([], pa.int64()),
                "revisit_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hdr = pc.fill_null(t.column(header_col), "")
        no_store = np.asarray(
            pc.match_substring_regex(hdr, pattern=_NOSTORE_RX)
            .to_numpy(zero_copy_only=False),
            bool,
        )
        ext = pc.extract_regex(hdr, pattern=_MAXAGE_RX)
        age_str = pc.fill_null(pc.struct_field(ext, "age"), "-1")
        max_age = np.asarray(
            pc.cast(age_str, pa.int64()).to_numpy(zero_copy_only=False)
        )
        revisit = np.where(
            no_store, np.int64(0), np.where(max_age >= 0, max_age, default_s)
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "max_age": pa.array(max_age, pa.int64()),
                "no_store": pa.array(no_store.astype(np.int64), pa.int64()),
                "revisit_s": pa.array(revisit, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def change_rate_schedule(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url_id",
    changed_col: str = "changed",
    hot_ppm: int = 500_000,
    warm_ppm: int = 100_000,
    hot_s: int = 3600,
    warm_s: int = 86400,
    cold_s: int = 604800,
) -> ray.data.Dataset:
    """Adaptive recrawl scheduling from revisit history (Cho &
    Garcia-Molina, "Estimating frequency of change", TOIT 2003: estimate
    a page's change frequency from repeated visit observations and
    allocate revisit intervals accordingly).  Input: the visit log, one
    row per (url, visit) with a 0/1 ``changed`` flag.  Per url the
    Laplace-smoothed change ratio is computed in exact integers —
    ``ratio_ppm = floor(1e6 * (changes+1) / (visits+2))`` — and mapped
    to the interval ladder hot/warm/cold (>= hot_ppm -> hot_s, >=
    warm_ppm -> warm_s, else cold_s), keeping every value
    bit-verifiable (the paper's log-based lambda estimator is monotone
    in this ratio for fixed n, so the LADDER decisions are identical;
    the float lambda itself is deliberately not emitted).

    Shape: per-batch partial (url, n, x) counts via an in-batch Arrow
    group_by, ONE corpus-keyed groupby Sum merge (url cardinality is
    corpus-sized — a real groupby per CLAUDE.md), then a vectorized
    verdict pass.  The visit log never shuffles raw; only (url, n, x)
    triples move.
    """
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table(
                {
                    url_col: pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                }
            )
        gt = pa.table(
            {
                url_col: pc.cast(t.column(url_col), pa.int64()),
                "c": pc.cast(t.column(changed_col), pa.int64()),
            }
        )
        agg = gt.group_by([url_col]).aggregate([("c", "count"), ("c", "sum")])
        return pa.table(
            {
                url_col: agg.column(url_col),
                "n": pa.compute.cast(agg.column("c_count"), pa.int64()),
                "x": pa.compute.cast(agg.column("c_sum"), pa.int64()),
            }
        )

    def verdict(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    url_col: pa.array([], pa.int64()),
                    "visits": pa.array([], pa.int64()),
                    "changes": pa.array([], pa.int64()),
                    "ratio_ppm": pa.array([], pa.int64()),
                    "revisit_s": pa.array([], pa.int64()),
                }
            )
        n = t.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.int64)
        x = t.column("sum(x)").to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = (1_000_000 * (x + 1)) // (n + 2)
        interval = np.select(
            [ratio >= hot_ppm, ratio >= warm_ppm],
            [np.int64(hot_s), np.int64(warm_s)],
            default=np.int64(cold_s),
        ).astype(np.int64)
        return pa.table(
            {
                url_col: t.column(url_col),
                "visits": pa.array(n, pa.int64()),
                "changes": pa.array(x, pa.int64()),
                "ratio_ppm": pa.array(ratio, pa.int64()),
                "revisit_s": pa.array(interval, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(url_col)
        .aggregate(Sum("n"), Sum("x"))
    )
    return merged.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)
