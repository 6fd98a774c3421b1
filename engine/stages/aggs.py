"""ES metrics-aggregation parity — ``extended_stats`` in exact integers.

Elasticsearch's ``extended_stats`` aggregation returns count / min / max /
sum / sum_of_squares / variance per bucket.  Floating-point sums are not
bit-reproducible across engines (summation order), so this engine follows
the repo's fixed-point discipline: values are quantized once to
milli-units with the identical IEEE expression ``floor(v*1000 + 0.5)``
on both sides, every moment is an exact int64 sum of int64s, and the
variance is derived from the moments in EXACT arbitrary-precision
integer arithmetic as ``floor((n*ssq - s*s) / (n*n))`` (milli-units
squared) — DuckDB mirrors it in HUGEINT.  ``std`` is deliberately not
emitted (sqrt is not reproducible); callers derive it.

Scale shape: bucket cardinality here is the events table's
``event_type`` — DRIVER-sized, so per CLAUDE.md the reduce happens on
the driver over per-batch partials (one tiny row per (batch, group)),
never through a groupby shuffle: ``map_batches`` emits (group, n, s,
ssq, mn, mx) partials, the driver merges them with Python ints
(overflow-free), and the output is one small Arrow table.  At 100 TB
the partial rows total (blocks x groups) — still driver-trivial.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def extended_stats(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    scale: int = 1000,
) -> pa.Table:
    """(group, n, sum_m, min_m, max_m, ssq_m, var_m2) per bucket, all
    exact int64 in milli-units (``scale``); see module docstring."""

    def partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ssq": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        g = t.column(group_col)
        ok = ~np.isnan(v)
        if not ok.any():
            return empty
        vm = np.floor(v[ok] * scale + 0.5).astype(np.int64)
        gt = pa.table(
            {
                group_col: pc.cast(g.filter(pa.array(ok)), pa.string()),
                "v": pa.array(vm, pa.int64()),
                "v2": pa.array(vm * vm, pa.int64()),
            }
        )
        agg = gt.group_by([group_col]).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum"),
             ("v", "min"), ("v", "max")]
        )
        # select by NAME (positional rename is pyarrow-version-fragile)
        return pa.table(
            {
                group_col: agg.column(group_col),
                "n": pa.compute.cast(agg.column("v_count"), pa.int64()),
                "s": pa.compute.cast(agg.column("v_sum"), pa.int64()),
                "ssq": pa.compute.cast(agg.column("v2_sum"), pa.int64()),
                "mn": pa.compute.cast(agg.column("v_min"), pa.int64()),
                "mx": pa.compute.cast(agg.column("v_max"), pa.int64()),
            }
        )

    acc: dict = {}
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in ray.get(part.to_arrow_refs()):
        # zero-row blocks bypass map_batches and can surface schemaless
        if not isinstance(tab, pa.Table) or tab.num_rows == 0:
            continue
        for grp, n, s, ssq, mn, mx in zip(
            tab.column(group_col).to_pylist(), tab.column("n").to_pylist(),
            tab.column("s").to_pylist(), tab.column("ssq").to_pylist(),
            tab.column("mn").to_pylist(), tab.column("mx").to_pylist(),
        ):
            a = acc.get(grp)
            if a is None:
                acc[grp] = [n, s, ssq, mn, mx]
            else:
                a[0] += n
                a[1] += s          # Python ints: overflow-free
                a[2] += ssq
                a[3] = min(a[3], mn)
                a[4] = max(a[4], mx)
    groups = sorted(acc)
    var = [
        (acc[g][0] * acc[g][2] - acc[g][1] * acc[g][1])
        // (acc[g][0] * acc[g][0])
        for g in groups
    ]
    return pa.table(
        {
            group_col: pa.array(groups, pa.string()),
            "n": pa.array([acc[g][0] for g in groups], pa.int64()),
            "sum_m": pa.array([acc[g][1] for g in groups], pa.int64()),
            "min_m": pa.array([acc[g][3] for g in groups], pa.int64()),
            "max_m": pa.array([acc[g][4] for g in groups], pa.int64()),
            "ssq_m": pa.array([acc[g][2] for g in groups], pa.int64()),
            "var_m2": pa.array(var, pa.int64()),
        }
    )


def adjacency_matrix(
    ds: ray.data.Dataset,
    terms,
    *,
    text_col: str = "text",
) -> pa.Table:
    """ES ``adjacency_matrix`` aggregation: given named filters (here:
    term-presence filters over the text), the doc count of every filter
    intersection — the co-occurrence matrix ES renders for graph
    exploration.  Output one row per unordered pair (i <= j):
    ``(filter_a, filter_b, doc_count)``, diagonal = single-filter counts,
    zero-count pairs kept (ES emits empty buckets only when non-zero;
    keeping zeros makes the contract deterministic — documented
    deviation).

    Shape: per batch ONE tokenize pass -> docs x k presence bool matrix
    -> k x k partial co-occurrence via one matmul; k is query-sized so
    the (k*(k+1)/2)-row partials reduce on the DRIVER (CLAUDE.md
    driver-sized-key rule).  Text never shuffles.
    """
    terms = list(terms)
    k = len(terms)

    def partials(t: pa.Table) -> pa.Table:
        from engine.stages.text import _TOKEN

        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        tset = [set(_TOKEN.findall(x or "")) for x in texts]
        m = np.zeros((len(texts), k), np.int64)
        for j, term in enumerate(terms):
            m[:, j] = [term in s for s in tset]
        co = m.T @ m  # k x k int64
        iu, ju = np.triu_indices(k)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "n": pa.array(co[iu, ju], pa.int64()),
            }
        )

    acc = np.zeros((k, k), dtype=object)  # Python ints: overflow-free
    acc[:] = 0
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in ray.get(part.to_arrow_refs()):
        if not isinstance(tab, pa.Table) or tab.num_rows == 0:
            continue
        for i, j, n in zip(
            tab.column("i").to_pylist(), tab.column("j").to_pylist(),
            tab.column("n").to_pylist(),
        ):
            acc[i, j] += n
    iu, ju = np.triu_indices(k)
    return pa.table(
        {
            "filter_a": pa.array([terms[i] for i in iu], pa.string()),
            "filter_b": pa.array([terms[j] for j in ju], pa.string()),
            "doc_count": pa.array([int(acc[i, j]) for i, j in zip(iu, ju)], pa.int64()),
        }
    )


def bucket_pipeline(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    limit: int = 20,
) -> pa.Table:
    """ES pipeline-aggregation trio over a date_histogram: per
    (day, group) bucket compute n and the exact milli-quantized sum, then

    - ``bucket_script``: ``avg_m = s_m // n`` (exact integer milli-mean),
    - ``bucket_selector``: keep buckets STRICTLY above the mean bucket
      size (``n * n_buckets > total_n`` — integer cross-multiplication,
      no division, scale-free), and
    - ``bucket_sort``: order by (avg_m desc, day asc, group asc), first
      ``limit``.

    Like ES pipeline aggs — which operate on the response histogram, not
    the corpus — the second stage runs on the driver over the collected
    per-bucket partials: bucket cardinality is (days x groups),
    driver-sized, so per CLAUDE.md the reduce is per-batch partials +
    driver merge, never a groupby shuffle.  Values are quantized ONCE with
    the repo-wide ``floor(v*1000 + 0.5)`` IEEE expression.
    """

    def partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "day": pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s_m": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        us = pc.cast(t.column(ts_col), pa.int64())
        day = pc.divide(us, 86_400_000_000)  # int64 floor for positive epochs
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        vm = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        gt = pa.table(
            {
                "day": day,
                group_col: pc.cast(t.column(group_col), pa.string()),
                "v": pa.array(vm, pa.int64()),
            }
        )
        agg = gt.group_by(["day", group_col]).aggregate(
            [("v", "count"), ("v", "sum")]
        )
        return pa.table(
            {
                "day": pa.compute.cast(agg.column("day"), pa.int64()),
                group_col: agg.column(group_col),
                "n": pa.compute.cast(agg.column("v_count"), pa.int64()),
                "s_m": pa.compute.cast(agg.column("v_sum"), pa.int64()),
            }
        )

    acc: dict = {}
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in ray.get(part.to_arrow_refs()):
        if not isinstance(tab, pa.Table) or tab.num_rows == 0:
            continue
        for day, grp, n, s in zip(
            tab.column("day").to_pylist(), tab.column(group_col).to_pylist(),
            tab.column("n").to_pylist(), tab.column("s_m").to_pylist(),
        ):
            a = acc.get((day, grp))
            if a is None:
                acc[(day, grp)] = [n, s]
            else:
                a[0] += n
                a[1] += s
    total_n = sum(a[0] for a in acc.values())
    n_buckets = len(acc)
    rows = [
        (day, grp, n, s, s // n)
        for (day, grp), (n, s) in acc.items()
        if n * n_buckets > total_n
    ]
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    rows = rows[:limit]
    return pa.table(
        {
            "day": pa.array([r[0] for r in rows], pa.int64()),
            group_col: pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "s_m": pa.array([r[3] for r in rows], pa.int64()),
            "avg_m": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def dispersion_stats(
    ds: ray.data.Dataset,
    *,
    group_col: str = "l_returnflag",
    value_col: str = "l_quantity",
) -> pa.Table:
    """ES ``boxplot`` + ``median_absolute_deviation`` aggregations in
    exact integers: per bucket ``(group, n, min_v, max_v, q1, median, q3,
    iqr, mad)`` over an INTEGER-VALUED numeric column.

    Discrete quantile rule: ``sorted[floor(q * (n-1))]`` — exactly
    DuckDB's ``percentile_disc`` / ES's nearest-rank convention, so every
    emitted statistic is an actual data value and bit-reproducible
    (no interpolation, no floats).  MAD is the median of ``|v - median|``
    under the same rule.

    Scale shape: the value domain is bounded (quantities, scores, ages —
    here TPC-H quantity 1..50) and bucket cardinality is driver-sized, so
    per-batch partials emit one ``(group, v, cnt)`` row per distinct
    value seen — a VALUE HISTOGRAM, not the rows — and the driver merges
    histograms and reads every quantile exactly off the merged CDF.  At
    100 TB the partial volume is blocks x groups x |domain|, still
    driver-trivial, and nothing shuffles.  (An unbounded-domain column
    would need the t-digest path in ``quantiles.py`` instead — this
    operator trades generality for exactness, like ``extended_stats``.)
    """

    def partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        if not ok.any():
            return empty
        vi = np.floor(v[ok] + 0.5).astype(np.int64)
        gt = pa.table(
            {
                group_col: pa.compute.cast(
                    t.column(group_col).filter(pa.array(ok)), pa.string()
                ),
                "v": pa.array(vi, pa.int64()),
            }
        )
        agg = gt.group_by([group_col, "v"]).aggregate([("v", "count")])
        return pa.table(
            {
                group_col: agg.column(group_col),
                "v": agg.column("v"),
                "cnt": pa.compute.cast(agg.column("v_count"), pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    hist: dict = {}
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in collect_arrow_blocks(part):
        for grp, v, c in zip(
            tab.column(group_col).to_pylist(),
            tab.column("v").to_pylist(),
            tab.column("cnt").to_pylist(),
        ):
            g = hist.setdefault(grp, {})
            g[v] = g.get(v, 0) + c

    def _q_disc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
        # sorted[floor(q*(n-1))] read off the CDF without expanding rows
        n = int(cnts.sum())
        idx = int(np.floor(q * (n - 1)))
        cdf = np.cumsum(cnts)
        return int(vals[np.searchsorted(cdf, idx + 1)])

    groups = sorted(hist)
    rows = []
    for g in groups:
        items = sorted(hist[g].items())
        vals = np.array([v for v, _ in items], np.int64)
        cnts = np.array([c for _, c in items], np.int64)
        n = int(cnts.sum())
        q1 = _q_disc(vals, cnts, 0.25)
        med = _q_disc(vals, cnts, 0.5)
        q3 = _q_disc(vals, cnts, 0.75)
        # MAD: fold the histogram through |v - med| (bins merge)
        dev: dict = {}
        for v, c in items:
            d = abs(v - med)
            dev[d] = dev.get(d, 0) + c
        ditems = sorted(dev.items())
        mad = _q_disc(
            np.array([v for v, _ in ditems], np.int64),
            np.array([c for _, c in ditems], np.int64),
            0.5,
        )
        rows.append(
            (g, n, int(vals[0]), int(vals[-1]), q1, med, q3, q3 - q1, mad)
        )
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "min_v": pa.array([r[2] for r in rows], pa.int64()),
            "max_v": pa.array([r[3] for r in rows], pa.int64()),
            "q1": pa.array([r[4] for r in rows], pa.int64()),
            "median": pa.array([r[5] for r in rows], pa.int64()),
            "q3": pa.array([r[6] for r in rows], pa.int64()),
            "iqr": pa.array([r[7] for r in rows], pa.int64()),
            "mad": pa.array([r[8] for r in rows], pa.int64()),
        }
    )


def terms_error_bounds(
    ds: ray.data.Dataset,
    *,
    n_shards: int = 4,
    shard_size: int = 5,
    size: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """ES ``terms`` aggregation WITH its distributed error accounting —
    the part of ES most engines gloss over: each shard returns only its
    own top ``shard_size`` terms by doc count, the coordinator sums what
    was reported, and every merged term carries
    ``doc_count_error`` = the sum, over shards that did NOT report it, of
    that shard's LAST returned count (the worst case it could have missed)
    — ES's ``show_term_doc_count_error``.  Output: the top ``size`` terms
    by merged count, ``(term, doc_count, doc_count_error, rank)``; ties
    break by term asc everywhere (deterministic where ES is not).

    Shapes: doc counts are per-batch partials keyed ``(shard, term)``
    (one tokenize pass, DISTINCT terms per doc — ES counts documents, not
    occurrences; shard = id % n_shards, the fixed routing ES uses) merged
    on the driver — partial volume is blocks x shards x vocab, fine for
    the keyword-cardinality fields terms aggs target (an unbounded-vocab
    field needs the groupby exchange instead; same downstream math).
    The shard top-k / error reconstruction is coordinator work in ES too.
    """
    from engine.stages.text import _TOKEN

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "shard": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        shards = ids % n_shards
        acc: dict = {}
        for sh, txt in zip(shards.tolist(), t.column(text_col).to_pylist()):
            for term in set(_TOKEN.findall(txt or "")):
                k = (sh, term)
                acc[k] = acc.get(k, 0) + 1
        if not acc:
            return empty
        keys = sorted(acc)
        return pa.table(
            {
                "shard": pa.array([k[0] for k in keys], pa.int64()),
                "term": pa.array([k[1] for k in keys], pa.string()),
                "cnt": pa.array([acc[k] for k in keys], pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    counts: dict = {}
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in collect_arrow_blocks(part):
        for sh, term, c in zip(
            tab.column("shard").to_pylist(),
            tab.column("term").to_pylist(),
            tab.column("cnt").to_pylist(),
        ):
            counts[(sh, term)] = counts.get((sh, term), 0) + c

    # coordinator phase: per-shard top shard_size, last count, merge
    by_shard: dict = {}
    for (sh, term), c in counts.items():
        by_shard.setdefault(sh, []).append((term, c))
    kept: dict = {}
    last_cnt: dict = {}
    for sh, items in by_shard.items():
        items.sort(key=lambda tc: (-tc[1], tc[0]))
        top = items[:shard_size]
        last_cnt[sh] = top[-1][1] if top else 0
        for term, c in top:
            kept.setdefault(term, {})[sh] = c
    merged = sorted(
        ((term, sum(per.values())) for term, per in kept.items()),
        key=lambda tc: (-tc[1], tc[0]),
    )[:size]
    terms_out, dc_out, err_out = [], [], []
    for term, dc in merged:
        per = kept[term]
        err = sum(lc for sh, lc in last_cnt.items() if sh not in per)
        terms_out.append(term)
        dc_out.append(dc)
        err_out.append(err)
    return pa.table(
        {
            "term": pa.array(terms_out, pa.string()),
            "doc_count": pa.array(dc_out, pa.int64()),
            "doc_count_error": pa.array(err_out, pa.int64()),
            "rank": pa.array(range(1, len(terms_out) + 1), pa.int64()),
        }
    )


# fixed-width interval ladder (seconds): minute, hour, day, 30-day month
# — the calendar-month ES rung is deliberately replaced by a fixed 30-day
# width so bucket starts stay integer-exact on both engines
AUTO_HISTO_LADDER = (60, 3600, 86400, 2_592_000)


def auto_date_histogram(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    target_buckets: int = 50,
) -> pa.Table:
    """ES ``auto_date_histogram``: pick the smallest interval from a
    fixed ladder such that the data's span produces at most
    ``target_buckets`` buckets, then histogram timestamps into
    epoch-aligned buckets of that width.  Output ``(bucket_s, n,
    interval_s)`` — the chosen interval rides along so the parity check
    pins the LADDER DECISION, not just the counts.

    Two streaming passes (exactly ES's own shape — the reduce phase picks
    the final interval): pass 1 is a per-batch min/max partial merged on
    the driver; pass 2 buckets each batch vectorized (int64 micros
    floor-divided by the interval) into per-batch count partials, driver
    merged (bucket cardinality <= target_buckets by construction).
    All arithmetic is int64 epoch-microseconds — no float time math.
    """

    def minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"mn": pa.array([], pa.int64()), "mx": pa.array([], pa.int64())}
            )
        v = t.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        return pa.table(
            {
                "mn": pa.array([int(v.min())], pa.int64()),
                "mx": pa.array([int(v.max())], pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    mn, mx = None, None
    ds = ds.materialize()
    for tab in collect_arrow_blocks(
        ds.map_batches(minmax, batch_format="pyarrow", zero_copy_batch=True)
    ):
        for a, b in zip(tab.column("mn").to_pylist(), tab.column("mx").to_pylist()):
            mn = a if mn is None else min(mn, a)
            mx = b if mx is None else max(mx, b)
    if mn is None:
        return pa.table(
            {
                "bucket_s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "interval_s": pa.array([], pa.int64()),
            }
        )
    interval_s = AUTO_HISTO_LADDER[-1]
    for cand in AUTO_HISTO_LADDER:
        iu = cand * 1_000_000
        if (mx // iu) - (mn // iu) + 1 <= target_buckets:
            interval_s = cand
            break
    iu = interval_s * 1_000_000

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket_s": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        v = t.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        b = (v // iu) * interval_s  # epoch seconds of the bucket start
        ub, cn = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket_s": pa.array(ub, pa.int64()),
                "n": pa.array(cn.astype(np.int64), pa.int64()),
            }
        )

    acc: dict = {}
    for tab in collect_arrow_blocks(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    ):
        for b, n in zip(
            tab.column("bucket_s").to_pylist(), tab.column("n").to_pylist()
        ):
            acc[b] = acc.get(b, 0) + n
    buckets = sorted(acc)
    return pa.table(
        {
            "bucket_s": pa.array(buckets, pa.int64()),
            "n": pa.array([acc[b] for b in buckets], pa.int64()),
            "interval_s": pa.array([interval_s] * len(buckets), pa.int64()),
        }
    )


def ip_prefix_agg(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    prefix_len: int = 16,
) -> pa.Table:
    """ES ``ip_prefix`` aggregation over the crawl's (synthetic) server
    IPs: bucket documents by the /``prefix_len`` IPv4 network and report
    per network the doc count and the number of distinct /24 subnets
    inside it — the IP-locality signal hosting-level politeness and
    link-farm detection use (thousands of "domains" collapsing into one
    /24 is a farm).

    The IP derives deterministically from the id (Knuth multiplicative
    hash mod 2^32) — reproducible in SQL, no external data.  Shapes:
    per-batch partials keyed (prefix, subnet24) — bounded at 2^24 keys
    but in practice blocks x live-subnets — merged on the driver into
    (prefix, n_docs, n_subnets).  Output prefix rendered dotted
    ("a.b.0.0/16") exactly as ES renders the bucket key.
    """
    span = 32 - prefix_len

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pfx": pa.array([], pa.int64()),
                "s24": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        ip = (ids * np.uint64(2654435761)) % np.uint64(2**32)
        pfx = (ip >> np.uint64(span)).astype(np.int64)
        s24 = (ip >> np.uint64(8)).astype(np.int64)
        key = pfx * (1 << 24) + s24  # composite for one unique() pass
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "pfx": pa.array(uk // (1 << 24), pa.int64()),
                "s24": pa.array(uk % (1 << 24), pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    acc: dict = {}
    for tab in collect_arrow_blocks(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    ):
        for p, s, n in zip(
            tab.column("pfx").to_pylist(),
            tab.column("s24").to_pylist(),
            tab.column("n").to_pylist(),
        ):
            d = acc.setdefault(p, {})
            d[s] = d.get(s, 0) + n
    prefixes = sorted(acc)
    labels = []
    for p in prefixes:
        ip_base = p << span
        labels.append(
            f"{(ip_base >> 24) & 255}.{(ip_base >> 16) & 255}."
            f"{(ip_base >> 8) & 255}.{ip_base & 255}/{prefix_len}"
        )
    return pa.table(
        {
            "prefix": pa.array(labels, pa.string()),
            "n_docs": pa.array(
                [sum(acc[p].values()) for p in prefixes], pa.int64()
            ),
            "n_subnets": pa.array([len(acc[p]) for p in prefixes], pa.int64()),
        }
    )


def cohort_retention(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Cohort retention matrix — the product-analytics staple: users
    cohorted by their FIRST active day; for every (cohort_day,
    offset_day) cell, how many of that cohort were active offset days
    later.  Output ``(cohort_day, offset_day, n_users)``, days as exact
    epoch-day int64.

    Join-free two-shuffle shape: per batch, DISTINCT (user, day) pairs
    (vectorized composite-key unique); ONE groupby on a COARSE uniform
    user bucket (PERF.md #31 — distinct users are corpus-sized, so the
    per-user min-day resolves VECTORIZED inside each bucket with a
    pandas transform, never per-group Python), emitting one
    (cohort, offset) row per distinct (user, day); ONE final
    groupby((cohort, offset)) Count.  No join, nothing driver-sized
    assumed anywhere — cohort matrices stay small but users never do.
    """
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401

    from engine.stages.common import as_arrow
    from ray.data.aggregate import Count

    nb = 1 << max(0, n_buckets.bit_length() - 1)

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "ub": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        day = ts // 86_400_000_000
        if u.size and int(u.max()) < (1 << 43) and int(u.min()) >= 0:
            # composite int64 key: day fits 20 bits (2^20 days ~ 2870
            # years), so ids below 2^43 pack losslessly
            key = u * np.int64(1 << 20) + day
            uk = np.unique(key)
            uu, dd = uk // (1 << 20), uk % (1 << 20)
        else:
            # huge/negative id space: 2-column unique via lexsort
            order = np.lexsort((day, u))
            us, ds_ = u[order], day[order]
            keep = np.ones(len(us), bool)
            keep[1:] = (us[1:] != us[:-1]) | (ds_[1:] != ds_[:-1])
            uu, dd = us[keep], ds_[keep]
        return pa.table(
            {
                "u": pa.array(uu, pa.int64()),
                "day": pa.array(dd, pa.int64()),
                "ub": pa.array(uu & (nb - 1), pa.int64()),
            }
        )

    def cohortize(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "cohort_day": np.asarray([], np.int64),
                    "offset_day": np.asarray([], np.int64),
                }
            )
        # rows inside a bucket may repeat (u, day) across input blocks —
        # the per-batch unique is only per batch
        df = df.drop_duplicates(["u", "day"])
        cohort = df.groupby("u")["day"].transform("min")
        return pd.DataFrame(
            {
                "cohort_day": cohort.to_numpy(np.int64),
                "offset_day": (df["day"] - cohort).to_numpy(np.int64),
            }
        )

    cells = as_arrow(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ub")
        .map_groups(
            lambda df: cohortize(df.drop(columns=["ub"])),
            batch_format="pandas",
        )
    )
    return (
        cells.groupby(["cohort_day", "offset_day"])
        .aggregate(Count(alias_name="n_users"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cohort_day": t.column("cohort_day"),
                    "offset_day": t.column("offset_day"),
                    "n_users": t.column("n_users").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def event_bigrams(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Sequential pattern mining, order 2: counts of CONSECUTIVE event
    transitions per user stream — the Markov transition matrix behind
    next-action prediction and funnel discovery (which pairs actually
    happen, vs ``funnel``'s fixed hypothesis).  Output ``(e_from, e_to,
    n)``; within-user order is (ts, order_col) with the id tiebreak so
    simultaneous events are deterministic.

    Shapes: ONE coarse user-bucket groupby co-locates each user's events
    (PERF.md #31 — users are corpus-sized, buckets uniform); inside the
    bucket one vectorized pandas sort + shift builds adjacent pairs with
    a same-user mask (no per-user Python); per-bucket partial counts
    feed ONE final (e_from, e_to) groupby Sum.
    """
    import pandas as pd

    from engine.stages.common import as_arrow
    from ray.data.aggregate import Sum

    nb = 1 << max(0, n_buckets.bit_length() - 1)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column(ts_col).cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "tsu": pa.array(ts, pa.int64()),
                "oid": t.column(order_col).cast(pa.int64()),
                "et": t.column(type_col).cast(pa.string()),
                "ub": pa.array(u & np.int64(nb - 1), pa.int64()),
            }
        )

    def bigrams(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame(
                {
                    "e_from": pd.Series([], dtype="string"),
                    "e_to": pd.Series([], dtype="string"),
                    "n": np.asarray([], np.int64),
                }
            )
        df = df.sort_values(["u", "tsu", "oid"], kind="mergesort")
        same = df["u"].to_numpy()[1:] == df["u"].to_numpy()[:-1]
        ef = df["et"].to_numpy()[:-1][same]
        et = df["et"].to_numpy()[1:][same]
        out = (
            pd.DataFrame({"e_from": ef, "e_to": et})
            .groupby(["e_from", "e_to"], as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "e_from": out["e_from"].astype("string"),
                "e_to": out["e_to"].astype("string"),
                "n": out["size"].to_numpy(np.int64),
            }
        )

    partial = as_arrow(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ub")
        .map_groups(
            lambda df: bigrams(df.drop(columns=["ub"])), batch_format="pandas"
        )
    )
    return (
        partial.groupby(["e_from", "e_to"])
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "e_from": t.column("e_from"),
                    "e_to": t.column("e_to"),
                    "n": t.column("n").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def fair_share(
    ds: ray.data.Dataset,
    *,
    key_col: str = "host",
    demand_col: str = "demand",
    budget: int = 1000,
) -> ray.data.Dataset:
    """Max-min fair (water-filling) allocation of a global crawl budget
    across competing hosts: every host gets min(demand, level) where the
    water level is the largest integer making the total fit the budget —
    the standard fair scheduler (progressive filling), here for per-wave
    fetch quotas so mega-hosts cannot starve the long tail (the
    politeness groupby bounds per-host RATE; this bounds per-host
    SHARE).

    Exact integer algorithm, fully distributed: per-batch partials
    reduce demands per host (ONE groupby Sum); the driver solves the
    level on the demand HISTOGRAM (distinct demand values — bounded,
    like dispersion_stats' value-domain trade), never on per-host rows:
    level = max L with sum(min(d_i, L)) <= budget, found by scanning the
    sorted unique demands with cumulative sums, then the leftover
    ``budget - sum(min(d_i, L))`` goes one unit each to the
    lexicographically first hosts capped at L (deterministic where
    max-min fairness is tie-agnostic).  Allocation attaches in one final
    vectorized map_batches against the broadcast (level, leftover
    boundary) — per-host rows never reach the driver.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    demands = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    key_col: t.column(key_col).cast(pa.string()),
                    "d": t.column(demand_col).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(key_col)
        .aggregate(Sum("d", alias_name="d"))
        .map_batches(
            lambda t: pa.table(
                {key_col: t.column(key_col), "d": t.column("d").cast(pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    # demand-value histogram partials -> driver level solve
    from engine.stages.common import collect_arrow_blocks

    hist: dict = {}
    for tab in collect_arrow_blocks(
        demands.map_batches(
            lambda t: (
                lambda v: (
                    lambda ub, cn: pa.table(
                        {
                            "v": pa.array(ub, pa.int64()),
                            "c": pa.array(cn.astype(np.int64), pa.int64()),
                        }
                    )
                )(*np.unique(v, return_counts=True))
            )(t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ):
        for v, c in zip(tab.column("v").to_pylist(), tab.column("c").to_pylist()):
            hist[v] = hist.get(v, 0) + c
    if not hist:
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "demand": pa.array([], pa.int64()),
                    "alloc": pa.array([], pa.int64()),
                }
            )
        )
    vals = np.array(sorted(hist), np.int64)
    cnts = np.array([hist[int(v)] for v in vals], np.int64)
    n = int(cnts.sum())
    total = int((vals * cnts).sum())
    if total <= budget:
        level = int(vals[-1])
        leftover = 0
    else:
        # sum(min(d, L)) = sum_{v <= L} v*c + L * count(v > L)
        cum_v = np.cumsum(vals * cnts)
        cum_c = np.cumsum(cnts)
        level, used = 0, 0
        for i in range(len(vals)):
            below = int(cum_v[i - 1]) if i else 0
            above = n - (int(cum_c[i - 1]) if i else 0)
            # largest L in (vals[i-1], vals[i]] keeping below + L*above
            # within budget
            cap = (budget - below) // max(1, above)
            lv = min(int(vals[i]), cap)
            if lv > level:
                level, used = lv, below + lv * above
            if cap < int(vals[i]):
                break
        leftover = budget - used
    level_ref = ray.put((level, leftover))

    # leftover units go to the lexicographically first capped hosts —
    # a per-block partial top-k (never a full collect: capped hosts can
    # be corpus-sized; the bonus set is leftover-sized by definition)
    bonus: set = set()
    if leftover > 0:
        from engine.stages.topk import global_topk

        capped = demands.map_batches(
            lambda t, _l=level: pa.table(
                {key_col: t.column(key_col).filter(pc.greater(t.column("d"), _l))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        top = global_topk(
            capped,
            order_cols=[key_col],
            descending=[False],
            k=leftover,
            rank_col="_r",
        ).materialize()
        bonus = set(
            k
            for tab in collect_arrow_blocks(top)
            for k in tab.column(key_col).to_pylist()
        )
    bonus_ref = ray.put(bonus)

    def alloc(t: pa.Table) -> pa.Table:
        lv, _ = ray.get(level_ref)
        bs = ray.get(bonus_ref)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        keys = t.column(key_col).to_pylist()
        a = np.minimum(d, lv)
        extra = np.fromiter((k in bs for k in keys), bool, count=len(keys))
        a = a + extra.astype(np.int64)
        return pa.table(
            {
                key_col: t.column(key_col),
                "demand": pa.array(d, pa.int64()),
                "alloc": pa.array(a, pa.int64()),
            }
        )

    return demands.map_batches(alloc, batch_format="pyarrow", zero_copy_batch=True)
