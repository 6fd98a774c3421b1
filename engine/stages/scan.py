"""Distributed prefix scan (segmented cumulative sum) + index rollover.

A cumulative sum over a defined total order is the one aggregation shape
Ray Data has no operator for — it is inherently sequential per prefix —
yet index lifecycle management needs it (ES rollover: a write index rolls
to the next generation when its cumulative size crosses a budget), as do
byte-offset assignment for archive packing and global row numbering.

The classic two-phase segmented scan, Ray-Data-shaped:

Phase 1 (map_batches, streaming): per batch, partial sums keyed by a
    COARSE key bucket ``key // bucket_span`` — partial volume is
    blocks x live-buckets, driver-trivial.  The driver sorts the bucket
    sums and takes the running total: an EXCLUSIVE offset per bucket.
Phase 2 (ONE groupby(bucket).map_groups): each bucket's rows co-locate,
    sort by key inside the group, local cumsum + the bucket's broadcast
    offset = the exact global prefix sum.  Buckets are uniform by
    construction (contiguous key ranges), so the shuffle has no hot key;
    per-group work is a vectorized numpy cumsum.

Nothing corpus-sized ever reaches the driver; the offsets table is
``ray.put`` once and read per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# offsets deserialize once per worker process, not once per group (the
# dedup._PLANES_CACHE device): map_groups calls the fn per group, and a
# fine bucket_span means many groups per task
_OFFSETS_CACHE: dict = {}


def _cached_offsets(ref) -> dict:
    key = ref.hex()
    offs = _OFFSETS_CACHE.get(key)
    if offs is None:
        _OFFSETS_CACHE.clear()  # one live scan per worker is the norm
        offs = ray.get(ref)
        _OFFSETS_CACHE[key] = offs
    return offs


def prefix_sum(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    value_col: str,
    out_col: str = "cum",
    bucket_span: int = 4096,
) -> ray.data.Dataset:
    """INCLUSIVE cumulative sum of ``value_col`` in ``key_col`` order
    (keys must be unique int64 — a doc id / row id).  Emits the input's
    two columns plus ``out_col``; int64 exact."""

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"b": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = k // bucket_span
        ub, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(ub), np.int64)
        np.add.at(s, inv, v)
        return pa.table({"b": pa.array(ub, pa.int64()), "s": pa.array(s, pa.int64())})

    from engine.stages.common import collect_arrow_blocks

    sums: dict = {}
    for tab in collect_arrow_blocks(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    ):
        for b, s in zip(tab.column("b").to_pylist(), tab.column("s").to_pylist()):
            sums[b] = sums.get(b, 0) + s
    offsets: dict = {}
    run = 0
    for b in sorted(sums):
        offsets[b] = run
        run += sums[b]
    off_ref = ray.put(offsets)

    def scan_group(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    key_col: np.asarray([], np.int64),
                    value_col: np.asarray([], np.int64),
                    out_col: np.asarray([], np.int64),
                }
            )
        offs = _cached_offsets(off_ref)
        df = df.sort_values(key_col, kind="mergesort")
        k = df[key_col].to_numpy(np.int64)
        v = df[value_col].to_numpy(np.int64)
        base = offs.get(int(k[0]) // bucket_span, 0)
        return pd.DataFrame(
            {key_col: k, value_col: v, out_col: base + np.cumsum(v)}
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                value_col: t.column(value_col).cast(pa.int64()),
                "_pb": pa.array(k // bucket_span, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(
            lambda df: scan_group(df.drop(columns=["_pb"])),
            batch_format="pandas",
        )
    )


def rollover_assign(
    ds: ray.data.Dataset,
    *,
    key_col: str = "doc_id",
    size_col: str = "n_chars",
    budget: int = 8000,
    bucket_span: int = 4096,
) -> ray.data.Dataset:
    """ES index-rollover assignment: documents fill write-index
    generation g while the index's cumulative size stays under
    ``budget`` — deterministically, generation = exclusive-prefix-bytes
    // budget (a doc starts a new generation exactly when the previous
    docs filled the budget).  Emits ``(key, n_bytes, cum_bytes,
    index_gen)``; the prefix sum is the segmented scan above."""
    import pyarrow.compute as pc

    scanned = prefix_sum(
        ds,
        key_col=key_col,
        value_col=size_col,
        out_col="cum_bytes",
        bucket_span=bucket_span,
    )

    def gen(t: pa.Table) -> pa.Table:
        cum = t.column("cum_bytes")
        v = t.column(size_col)
        return pa.table(
            {
                key_col: t.column(key_col),
                "n_bytes": v.cast(pa.int64()),
                "cum_bytes": cum.cast(pa.int64()),
                "index_gen": pc.cast(
                    pc.divide(pc.subtract(cum, v), budget), pa.int64()
                ),
            }
        )

    from engine.stages.common import as_arrow

    return as_arrow(scanned).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )
