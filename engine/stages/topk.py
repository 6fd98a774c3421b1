"""Distributed grouped top-k (per-key ranking).

Ray Data has a global ``sort().limit(k)`` but no per-GROUP top-k; this is
the standard two-stage candidate pattern (same shape as the crawl's salted
politeness selection, `engine/pipelines/crawl.py`, but fully generic):

1. local candidates — inside ``map_batches``, each block keeps only its
   own top-k rows PER GROUP (vectorized pandas sort+head).  Candidate
   volume is bounded by ``k x groups x blocks`` regardless of row count,
   so the shuffle that follows never moves the data itself.
2. final ranking — ``groupby(group).map_groups`` sorts each group's
   candidate pool (<= k x blocks rows, tiny) and emits the global top-k
   with a dense 1-based ``rank``.

Correct for any total order expressible as a column sort: a row in the
true global top-k of its group is by definition in its block's local
top-k, so stage 1 never discards a winner.

``domain_terms`` composes it with a distributed term-count (per-batch
Counter partials -> groupby Sum, the inverted-index exchange: the shuffle
carries (group, token, count) rows, never text) into "top-k terms per
domain" — the per-source vocabulary signal web-corpus pipelines use for
domain profiling.  SQL-verified (__ray_entry__ oracle ``domain_terms``:
regexp tokenizer + window row_number).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _TOKEN


def grouped_topk(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    order_cols: Sequence[str],
    descending: Sequence[bool],
    k: int,
    rank_col: str = "rank",
) -> ray.data.Dataset:
    """Top-k rows per ``group_col`` value under the total order given by
    ``order_cols``/``descending`` (must be a TOTAL order — include a
    tiebreaker column), with a 1-based ``rank_col`` appended."""
    asc = [not d for d in descending]
    cols = list(order_cols)

    def local_candidates(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(cols, ascending=asc, kind="mergesort")
            .groupby(group_col, sort=False)
            .head(k)
        )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(cols, ascending=asc, kind="mergesort").head(k)
        out[rank_col] = pd.Series(
            range(1, len(out) + 1), index=out.index, dtype="int64"
        )
        return out

    return (
        ds.map_batches(local_candidates, batch_format="pandas")
        .groupby(group_col)
        .map_groups(final_topk, batch_format="pandas")
    )


def domain_terms(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k most frequent tokens per domain: (group_col, token,
    term_count, rank); ties break token-ascending (module docstring)."""

    def partials(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for g, txt in zip(
            t.column(group_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            for tok in _TOKEN.findall(txt or ""):
                cnt[(g, tok)] += 1
        keys: List = list(cnt.keys())
        return pa.table(
            {
                group_col: pa.array([g for g, _ in keys], t.column(group_col).type),
                "token": pa.array([tok for _, tok in keys], pa.string()),
                "term_count": pa.array([cnt[key] for key in keys], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "token"])
        .aggregate(Sum("term_count", alias_name="term_count"))
    )
    return grouped_topk(
        counts,
        group_col=group_col,
        order_cols=["term_count", "token"],
        descending=[True, False],
        k=k,
        rank_col="term_rank",
    )


def global_topk(
    ds: ray.data.Dataset,
    *,
    order_cols: Sequence[str],
    descending: Sequence[bool],
    k: int,
    rank_col: str = "rank",
) -> ray.data.Dataset:
    """Global top-k without an all-to-all sort: the grouped_topk candidate
    pattern over one constant group — each block forwards only its own
    top-k, the final resolve sees <= k x blocks rows."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array([0] * t.num_rows, pa.int64()))

    out = grouped_topk(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        group_col="_g",
        order_cols=order_cols,
        descending=descending,
        k=k,
        rank_col=rank_col,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["_g"]), batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decay_topk(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    anchor_days: int,
    halflife_days: int = 7,
    k: int = 20,
) -> ray.data.Dataset:
    """ES ``function_score`` decay analog (the recency boost ChatNoir-style
    frontends layer over BM25): each event contributes
    ``1_000_000 >> (age_days // halflife)`` — an exact INTEGER half-life
    decay (float ``exp`` decays are not bit-stable across engines; the
    shift form is, and is the same curve sampled at half-life steps).
    ``age_days`` counts from the fixed ``anchor_days`` (days since epoch),
    clamped at 0 and capped at 62 half-lives so the shift stays defined.

    Shape: one vectorized map_batches pass (int64 µs -> epoch days ->
    per-batch (key, partial score) via pyarrow group_by), ONE
    corpus-keyed groupby Sum — keys are users, corpus-sized at scale —
    then the global_topk candidate merge.  (key, score desc) ties break
    key-ascending via the total order (score DESC, key ASC)."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        us = pc.cast(t.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        age = np.maximum(anchor_days - day, 0)
        w = np.int64(1_000_000) >> np.minimum(age // halflife_days, 62)
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype("int64")
        part = pa.table(
            {key_col: pa.array(keys, pa.int64()), "score": pa.array(w, pa.int64())}
        )
        return (
            part.group_by(key_col)
            .aggregate([("score", "sum")])
            .select([key_col, "score_sum"])
            .rename_columns([key_col, "score"])
        )

    summed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(_Sum("score", alias_name="score"))
    )
    return global_topk(
        summed, order_cols=["score", key_col], descending=[True, False], k=k
    )


def composite_page(
    ds: ray.data.Dataset,
    *,
    keys: Sequence[str],
    after: Sequence | None = None,
    size: int = 20,
) -> ray.data.Dataset:
    """ES ``composite`` aggregation page: buckets = groupby(``keys``)
    with doc count and min event id, ordered by the composite key
    ascending; ``after`` (the previous page's last key tuple) returns
    the page STRICTLY after it — ES's after_key cursor, the only way ES
    paginates aggregations without re-ranking.

    Shape: one groupby over the key columns, then the after-filter is a
    stateless vectorized lexicographic compare and the page selection is
    ``global_topk`` ascending (per-block bottom-``size`` candidates ->
    one tiny driver merge) — no vocab-wide AllToAll sort (the
    search.py:179 lesson).  Output (keys..., n_rows, min_id, rank).
    """
    from ray.data.aggregate import Count, Min

    agg = ds.groupby(list(keys)).aggregate(
        Count(alias_name="n_rows"), Min("event_id", alias_name="min_id")
    )

    def after_filter(t: pa.Table) -> pa.Table:
        if after is None or t.num_rows == 0:
            return t
        import numpy as np
        import pyarrow.compute as pc

        n = t.num_rows
        gt = np.zeros(n, bool)   # strictly greater so far
        eq = np.ones(n, bool)    # equal on every key so far
        for col, av in zip(keys, after):
            c = t.column(col)
            g = pc.greater(c, av).to_numpy(zero_copy_only=False).astype(bool)
            e = pc.equal(c, av).to_numpy(zero_copy_only=False).astype(bool)
            gt |= eq & g
            eq &= e
        return t.filter(pa.array(gt))

    page = agg.map_batches(
        after_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    return global_topk(
        page,
        order_cols=list(keys),
        descending=[False] * len(keys),
        k=size,
    )
