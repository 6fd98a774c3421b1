"""Crawl-snapshot diffing and latest-per-key selection.

``snapshot_diff``: compare two crawl snapshots (old/new page or document
tables) by content hash and classify every key as 'added' / 'removed' /
'changed' / 'same' — the incremental-reindex primitive (only 'added' +
'changed' keys need re-extraction/re-indexing on the next run; the
reference achieves the same effect via its Redis resume cache, one URL at
a time).  Ray-Data-first: each side is reduced to (key, md5) in a
map_batches (text never shuffles), the sides are UNIONed with a side tag
and classified in one groupby — never an outer join (the native acero
join loses schema on empty hash partitions; see stages/clean.py).

``latest_events``: per-key argmax row selection (latest event per user) —
the ARGMAX pattern Ray's built-in Min/Max aggregates cannot express
(they drop the other columns).  Per-batch pre-aggregation keeps one
candidate row per (key, batch), so the shuffle moves at most
|keys| x |blocks| rows, then one map_groups picks the winner with a
deterministic tie-break (max ts, then max event_id).
"""

from __future__ import annotations

from hashlib import md5
from typing import Tuple

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_col: str = "url",
    content_col: str = "text",
) -> ray.data.Dataset:
    """(key, status) for every key in either snapshot; status in
    {'added','removed','changed','same'}.  Each side must be unique per
    key (crawl outputs are)."""

    # each side contributes (key, h_old|null, h_new|null); the groupby
    # aggregate Max picks the single non-null hash per side — fully
    # vectorized, no per-key Python call (a per-key map_groups would be
    # billions of interpreter calls at web scale)
    def summarize(side: str):
        def f(t: pa.Table) -> pa.Table:
            hs = pa.array(
                [
                    md5((x or "").encode()).hexdigest()
                    for x in t.column(content_col).to_pylist()
                ],
                pa.string(),
            )
            nulls = pa.array([None] * t.num_rows, pa.string())
            return pa.table(
                {
                    key_col: t.column(key_col),
                    "h_old": hs if side == "old" else nulls,
                    "h_new": hs if side == "new" else nulls,
                }
            )

        return f

    from ray.data.aggregate import Max

    agg = (
        old.map_batches(summarize("old"), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            new.map_batches(
                summarize("new"), batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby(key_col)
        .aggregate(
            Max("h_old", alias_name="h_old", ignore_nulls=True),
            Max("h_new", alias_name="h_new", ignore_nulls=True),
        )
    )

    def classify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ho, hn = t.column("h_old"), t.column("h_new")
        status = pc.if_else(
            pc.is_null(ho),
            pa.scalar("added", pa.string()),
            pc.if_else(
                pc.is_null(hn),
                pa.scalar("removed", pa.string()),
                pc.if_else(
                    pc.equal(ho, hn),
                    pa.scalar("same", pa.string()),
                    pa.scalar("changed", pa.string()),
                ),
            ),
        )
        return pa.table({key_col: t.column(key_col), "status": status})

    return agg.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


def latest_events(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    carry_cols: Tuple[str, ...] = (),
) -> ray.data.Dataset:
    """One row per key: the row with the maximum (ts, tiebreak) — argmax
    with a total order, so the result is partitioning-independent."""
    cols = [key_col, ts_col, tiebreak_col, *carry_cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # one candidate per key per batch: the shuffle moves candidates,
        # not events
        df = df[cols].sort_values(
            [key_col, ts_col, tiebreak_col], kind="mergesort"
        )
        return df.groupby(key_col, sort=False, as_index=False).tail(1)

    cand = ds.map_batches(partial, batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, tiebreak_col], kind="mergesort")
        return df.tail(1)

    return cand.groupby(key_col).map_groups(pick, batch_format="pandas")
