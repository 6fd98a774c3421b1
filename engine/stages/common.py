"""Cross-stage helpers."""

from __future__ import annotations

import ray.data


def as_arrow(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Convert a dataset's blocks to Arrow format via an identity
    map_batches.

    Use after any ``map_groups(..., batch_format="pandas")`` whose result
    feeds another SHUFFLE (groupby / aggregate / sort / join): Ray's hash
    exchange over pandas-format blocks is ~20x slower than over Arrow
    blocks (measured 7.7 s -> 0.3 s grouping 6.8k rows at 8 CPUs —
    PERF.md #31).  Terminal map_groups results that are only collected or
    written don't need it.
    """
    return ds.map_batches(
        lambda t: t, batch_format="pyarrow", zero_copy_batch=True
    )
