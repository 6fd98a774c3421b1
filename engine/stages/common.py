"""Cross-stage helpers."""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import ray
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


def collect_arrow_blocks(
    ds: ray.data.Dataset, required_col: Optional[str] = None
) -> List[pa.Table]:
    """Collect a (small, driver-gated) dataset's non-empty Arrow blocks.

    Zero-row blocks BYPASS map_batches and can surface downstream of a
    map_groups stage as empty columnless pandas frames in
    ``to_arrow_refs()`` — any driver reduce must skip blocks that are not
    a non-empty ``pa.Table`` (CLAUDE.md; PERF.md).  ``required_col``
    additionally drops blocks that kept an UPSTREAM schema (zero-row
    blocks skip the map fn entirely, so their columns are the input's,
    not the output's).  Only for driver-side merges of gated-small or
    per-block-candidate results — never for corpus-sized data.
    """
    return [
        t
        for t in ray.get(ds.to_arrow_refs())
        if isinstance(t, pa.Table)
        and t.num_rows
        and (required_col is None or required_col in t.column_names)
    ]
