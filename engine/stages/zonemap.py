"""Zone maps — min/max pruning statistics for sharded storage.

The storage-engine primitive behind Parquet row-group skipping and
ClickHouse/ORC zone indexes (public: Moerkotte's "small materialized
aggregates", VLDB'98): per shard, keep ``(min, max, count)`` of a sort- or
time-correlated column; a range predicate can SKIP any shard whose zone is
disjoint from the query interval without touching its rows.  For this
engine it is the planning half of the resumable sharded exports
(`engine/stages/export.py`): the manifest's per-shard zones tell a reader
which shard files a time-bounded reprocess must open at all.

Shape: one vectorized map_batches pass computes per-batch ``(shard, min,
max, count)`` partials via pyarrow ``group_by`` (a batch only ever sees a
handful of distinct shards when the input is even loosely key-ordered);
one shard-keyed groupby merges them — shards are corpus-sized (rows /
shard_size), so this is a real groupby, not a driver reduce.  Row values
never shuffle: only the per-batch zone partials move.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

_EMPTY = pa.table(
    {
        "shard": pa.array([], pa.int64()),
        "n_rows": pa.array([], pa.int64()),
        "vmin": pa.array([], pa.int64()),
        "vmax": pa.array([], pa.int64()),
    }
)


def zone_maps(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    val_col: str,
    shard_size: int,
) -> ray.data.Dataset:
    """Per-shard zone maps: ``shard = key // shard_size`` -> ``(shard,
    n_rows, vmin, vmax)`` over the int64 ``val_col``."""

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return _EMPTY
        # numpy // floors like SQL's integer // on non-negative keys
        keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        shard = pa.array(keys // shard_size, pa.int64())
        vals = pa.table(
            {
                "shard": shard,
                "v": pc.cast(t.column(val_col), pa.int64()),
            }
        )
        out = vals.group_by("shard").aggregate(
            [("v", "count"), ("v", "min"), ("v", "max")]
        )
        return out.select(["shard", "v_count", "v_min", "v_max"]).rename_columns(
            ["shard", "n_rows", "vmin", "vmax"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
        )
    )


def zone_map_prune(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    val_col: str,
    shard_size: int,
    lo: int,
    hi: int,
) -> pa.Table:
    """Zone maps plus the pruning verdict for the half-open predicate
    ``lo <= val < hi``: ``skipped`` is true when the shard's zone is
    disjoint from the interval (``vmax < lo or vmin >= hi``) — those
    shards' rows never need to be read.

    Returns a driver table sorted by shard: the zone index is
    ``rows / shard_size`` entries (10^4 at 10^10 rows with 10^6-row
    shards), the planner artifact a reader consults before opening any
    shard file — driver-sized by construction, so the merge uses the
    guarded block collect (zero-row blocks keep upstream schemas)."""
    import pyarrow.compute as pc

    from engine.stages.common import collect_arrow_blocks

    zm = zone_maps(ds, key_col=key_col, val_col=val_col, shard_size=shard_size)
    blocks = collect_arrow_blocks(zm, required_col="vmin")
    if not blocks:
        return _EMPTY.append_column("skipped", pa.array([], pa.bool_()))
    t = pa.concat_tables(blocks, promote_options="default").sort_by("shard")
    t = t.select(["shard", "n_rows", "vmin", "vmax"]).cast(_EMPTY.schema)
    skipped = pc.or_(
        pc.less(t.column("vmax"), lo), pc.greater_equal(t.column("vmin"), hi)
    )
    return t.append_column("skipped", skipped)
