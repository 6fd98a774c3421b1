"""Deterministic (stratified) sampling for training-data pipelines.

Down-sampling a 100 TB corpus must be reproducible across runs, engines,
and partitionings — ``random_sample`` is none of those.  The standard
pattern is hash-gating: keep a row iff ``H(id) mod 100 < rate_pct`` with a
cross-engine hash.  md5 is used (DuckDB has it natively), taking the first
8 hex chars as an integer — every engine that can md5 a string reproduces
the same sample, which also makes the operator SQL-verifiable
(__ray_entry__ oracle ``sample_stratified``).

Stateless, vectorized ``map_batches``; no shuffle, no RNG, no state.
"""

from __future__ import annotations

from hashlib import md5
from typing import Dict, Optional

import pyarrow as pa
import ray
import ray.data


def _bucket(vals, salt: str) -> list:
    """Deterministic 0-99 bucket per value: first 8 hex chars of
    md5(salt + str(value)) as an int, mod 100."""
    return [
        int(md5((salt + str(v)).encode()).hexdigest()[:8], 16) % 100 for v in vals
    ]


def deterministic_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    rate_pct: int = 10,
    salt: str = "",
) -> ray.data.Dataset:
    """Keep ~rate_pct% of rows, chosen by id hash (reproducible anywhere)."""

    def keep(t: pa.Table) -> pa.Table:
        b = _bucket(t.column(id_col).to_pylist(), salt)
        return t.filter(pa.array([x < rate_pct for x in b]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    rates: Optional[Dict[str, int]] = None,
    default_rate_pct: int = 10,
    salt: str = "",
) -> ray.data.Dataset:
    """Per-stratum hash-gated sampling: each ``strata_col`` value gets its
    own keep-rate (percent), e.g. up-sample rare languages while
    down-sampling the head.  Same determinism guarantees as
    ``deterministic_sample``."""
    rates = rates or {}

    def keep(t: pa.Table) -> pa.Table:
        b = _bucket(t.column(id_col).to_pylist(), salt)
        strata = t.column(strata_col).to_pylist()
        mask = [
            x < rates.get(s, default_rate_pct) for x, s in zip(b, strata)
        ]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    domain_col: str = "source",
    weights_bp: Dict[str, int],
    out_frac_pct: int = 40,
    salt: str = "",
) -> ray.data.Dataset:
    """Deterministic mixture sampling to TARGET per-domain proportions —
    the data-mixing step of LLM pretraining (e.g. The Pile / Dolma source
    weighting): the output corpus should be ``out_frac_pct``% of the input
    with domain ``s`` contributing fraction ``weights_bp[s]/10000`` of it.

    Two passes, all-integer arithmetic so the DuckDB oracle reproduces it
    bit-for-bit (__ray_entry__ oracle ``mixture_sample``):

    1. per-domain counts — per-batch pre-aggregated AND filtered to the
       WEIGHTED domains (``weights_bp`` is a driver-sized dict by
       definition, so each block emits <= |weights| + 1 partial rows: the
       weighted-domain counts plus one total-row count), then a driver
       reduce over O(|weights| x blocks) tiny rows — no shuffle at all.
       (A ``groupby(domain)`` here costs 5-15 s of hash-aggregator actor
       spin-up per run at bench scale — measured, PERF.md #24 — to move
       20 rows.)  The driver turns counts into basis-point acceptance
       rates ``rate_bp[s] = min(10000, (weights_bp[s] * out_target) //
       n_s)`` with ``out_target = (total_rows * out_frac_pct) // 100``.
       A domain without enough rows caps at 100% (you cannot mint data —
       its shortfall is NOT redistributed, by design: deterministic and
       composable across runs).  Domains absent from ``weights_bp`` are
       dropped.
    2. hash-gate filter — keep iff ``md5(salt+id) % 10000 < rate_bp[s]``:
       stateless, partitioning-independent, reproducible on any engine.
    """
    weighted = set(weights_bp)

    def domain_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dom = t.column(domain_col)
        sub = t.select([domain_col]).filter(
            pc.is_in(dom, value_set=pa.array(sorted(weighted), dom.type))
        )
        # select by NAME before renaming: aggregate()'s key/aggregate column
        # order is pyarrow-version-specific (keys-first in 16.x)
        part = (
            sub.group_by(domain_col)
            .aggregate([(domain_col, "count")])
            .select([domain_col, f"{domain_col}_count"])
            .rename_columns([domain_col, "n"])
        )
        # one extra row carries this block's TOTAL count (domain null)
        return pa.table(
            {
                domain_col: pa.concat_arrays(
                    [part.column(domain_col).combine_chunks(),
                     pa.array([None], part.column(domain_col).type)]
                ),
                "n": pa.concat_arrays(
                    [part.column("n").cast(pa.int64()).combine_chunks(),
                     pa.array([t.num_rows], pa.int64())]
                ),
            }
        )

    counts: Dict = {}
    total = 0
    for tab in ray.get(
        ds.map_batches(domain_counts, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    ):
        # zero-row blocks bypass map_batches and can surface as empty
        # pandas frames (e.g. downstream of a map_groups stage) — skip
        if not isinstance(tab, pa.Table) or tab.num_rows == 0:
            continue
        for s, n in zip(tab.column(domain_col).to_pylist(), tab.column("n").to_pylist()):
            if s is None:
                total += n
            else:
                counts[s] = counts.get(s, 0) + n
    out_target = (total * out_frac_pct) // 100
    rates_bp = {
        s: min(10000, (w_bp * out_target) // counts[s])
        for s, w_bp in weights_bp.items()
        if counts.get(s)
    }
    rates_ref = ray.put(rates_bp)

    def keep(t: pa.Table) -> pa.Table:
        rates = ray.get(rates_ref)
        ids = t.column(id_col).to_pylist()
        doms = t.column(domain_col).to_pylist()
        mask = [
            int(md5((salt + str(i)).encode()).hexdigest()[:8], 16) % 10000
            < rates.get(s, 0)
            for i, s in zip(ids, doms)
        ]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def shuffle_keys(ids, seed: int) -> list:
    """``md5(f"{seed}:{id}")`` hex key per id — THE shuffle-key formula.
    Single source of truth for shuffle_corpus, build_corpus's shuffled
    packing, and the ``shuffle_corpus`` SQL oracle (md5('SEED:' || id))."""
    pre = f"{seed}:"
    return [md5((pre + str(v)).encode()).hexdigest() for v in ids]


def shuffle_corpus(
    ds: ray.data.Dataset,
    *,
    seed: int = 0,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Seeded DETERMINISTIC global shuffle: every row gets ``shuf_key =
    md5(f"{seed}:{id}")`` and ``pos``, its 0-based rank in (shuf_key, id)
    order — the pre-packing example shuffle of an LLM training pipeline,
    reproducible across runs/engines/partitionings (``random_shuffle`` is
    none of those; a different ``seed`` is a fresh permutation).

    Shape: one keyed global sort (a shuffle by nature) over (id, key)
    rows only — call it BEFORE attaching text/payload columns and join
    the permutation back by id, so the wide columns never enter the
    exchange.  Global positions use pack.py's two-phase pattern: one tiny
    (block_key, count) row per block to the driver, prefix sum, broadcast
    offsets, per-block arange.  SQL-verifiable (md5 + ROW_NUMBER — oracle
    ``shuffle_corpus``)."""
    def key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "shuf_key": pa.array(
                    shuffle_keys(t.column(id_col).to_pylist(), seed),
                    pa.string(),
                ),
            }
        )

    s = (
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["shuf_key", id_col])
        .materialize()
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = t.num_rows == 0
        return pa.table(
            {
                "block_key": pa.array(
                    [] if empty else [t.column("shuf_key")[0].as_py()],
                    pa.string(),
                ),
                "block_n": pa.array(
                    [] if empty else [t.num_rows], pa.int64()
                ),
            }
        )

    parts = s.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    parts.sort(key=lambda r: r["block_key"])
    offsets = {}
    acc = 0
    for r in parts:
        offsets[r["block_key"]] = acc
        acc += r["block_n"]
    off_ref = ray.put(offsets)

    def assign(t: pa.Table, ref=off_ref) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.column(id_col).type),
                    "shuf_key": pa.array([], pa.string()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        base = ray.get(ref)[t.column("shuf_key")[0].as_py()]
        return t.append_column(
            "pos", pa.array(base + np.arange(t.num_rows), pa.int64())
        )

    return s.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def split_corpus(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    splits=(("train", 90), ("val", 5), ("test", 5)),
    salt: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: every row gains a
    ``split`` column chosen by the md5 hash gate (``_bucket`` with a
    dedicated salt so the split is independent of any sampling gate on
    the same ids).  The splits are DISJOINT and EXHAUSTIVE by
    construction — cumulative thresholds over one 0-99 bucket — and
    reproducible across engines, runs and partitionings, which is the
    property a 100 TB corpus split needs: re-running a failed shard
    yields the same assignment, and no global shuffle or coordination
    is involved (stateless vectorized map, zero shuffle).

    ``splits`` is an ordered (name, pct) list summing to 100.
    """
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percentages must sum to 100")
    bounds = []
    acc = 0
    for name, pct in splits:
        acc += pct
        bounds.append((acc, name))

    def assign(t: pa.Table) -> pa.Table:
        b = _bucket(t.column(id_col).to_pylist(), salt)
        names = [next(n for hi, n in bounds if x < hi) for x in b]
        return t.append_column("split", pa.array(names, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = 100,
    salt: str = "ws",
    carry_cols=(),
    rank_col: str = "sample_rank",
) -> ray.data.Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets the key ``u ** (1/w)`` where u is
    a hash-derived uniform in (0, 1] and w = max(weight, 1); the k rows
    with the largest keys are exactly a weight-proportional sample
    without replacement.  The hash replaces the RNG (the repo's sampling
    convention), so the sample is reproducible across engines, runs and
    partitionings — and SQL-verifiable, selection AND rank.

    Shape: one stateless key pass + ``global_topk``'s per-block-candidate
    selection (<= k x blocks rows to the final resolve — never an
    all-to-all sort of the corpus).  Output: (id_col, weight_col,
    *carry_cols, rank_col); the float key is internal only."""
    import pyarrow.compute as pc

    from engine.stages.topk import global_topk

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        ws = t.column(weight_col).to_pylist()
        keys = [
            ((int(md5((salt + str(i)).encode()).hexdigest()[:8], 16) + 1)
             / 4294967296.0)
            ** (1.0 / max(int(w or 0), 1))
            for i, w in zip(ids, ws)
        ]
        cols = {
            id_col: t.column(id_col),
            weight_col: t.column(weight_col),
            "_key": pa.array(keys, pa.float64()),
        }
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    out = global_topk(
        ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True),
        order_cols=["_key", id_col],
        descending=[True, False],
        k=k,
        rank_col=rank_col,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["_key"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def diversified_sample(
    ds: ray.data.Dataset,
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    value_col: str = "n_chars",
    max_per_key: int = 3,
) -> pa.Table:
    """ES ``diversified_sampler`` aggregation: de-bias a sample by capping
    it at ``max_per_key`` documents per key, then run the sub-aggregation
    over the de-biased sample.  ES picks the first hits in score order;
    this engine's deterministic analog picks the ``max_per_key`` LOWEST
    ids per key (documented: id order stands in for score order, making
    the sample reproducible).  Output per key: the sampled ids' count,
    exact value sum, and min/max id — the sub-agg a "diversity report"
    needs.

    Scale shape: each block emits its own bottom-``max_per_key``-per-key
    partial (a tiny (key, id, value) table), the driver re-collapses —
    key cardinality is driver-sized (sources, hosts, langs), so per
    CLAUDE.md no groupby shuffle; the corpus never leaves the map stage.
    """
    import heapq

    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sub = pa.table(
            {
                key_col: pc.cast(t.column(key_col), pa.string()),
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "v": pc.cast(t.column(value_col), pa.int64()),
            }
        )
        # bottom-max_per_key ids per key inside the block: one sort of the
        # block (small) + per-key head via pandas-free grouped take
        idx = pc.sort_indices(
            sub, sort_keys=[(key_col, "ascending"), (id_col, "ascending")]
        )
        sub = sub.take(idx)
        keys = sub.column(key_col).to_pylist()
        keep = []
        run_key, run_n = None, 0
        for i, k in enumerate(keys):
            if k != run_key:
                run_key, run_n = k, 0
            if run_n < max_per_key:
                keep.append(i)
                run_n += 1
        return sub.take(pa.array(keep, pa.int64()))

    best: dict = {}  # key -> heap of (-id, v) keeping the max_per_key LOWEST ids
    part = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    for tab in ray.get(part.to_arrow_refs()):
        if not isinstance(tab, pa.Table) or tab.num_rows == 0:
            continue
        for k, i, v in zip(
            tab.column(key_col).to_pylist(), tab.column(id_col).to_pylist(),
            tab.column("v").to_pylist(),
        ):
            h = best.setdefault(k, [])
            heapq.heappush(h, (-i, v))
            if len(h) > max_per_key:
                heapq.heappop(h)  # drops the LARGEST id
    keys = sorted(best)
    n_s, s_v, mn, mx = [], [], [], []
    for k in keys:
        ids = sorted((-ni, v) for ni, v in best[k])
        n_s.append(len(ids))
        s_v.append(sum(v for _, v in ids))
        mn.append(ids[0][0])
        mx.append(ids[-1][0])
    return pa.table(
        {
            key_col: pa.array(keys, pa.string()),
            "n_sampled": pa.array(n_s, pa.int64()),
            "sum_value": pa.array(s_v, pa.int64()),
            "min_id": pa.array(mn, pa.int64()),
            "max_id": pa.array(mx, pa.int64()),
        }
    )
