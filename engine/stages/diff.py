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


def incremental_reindex(
    old_state: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key_col: str = "doc_id",
    content_col: str = "text",
    process_fn,
    state_h_col: str = "h",
    broadcast_max: int = 5_000_000,
):
    """Incremental re-indexing: produce the index state for the NEW crawl
    snapshot while re-processing ONLY added/changed documents — the
    reference's whole operating model (its Redis resume cache skips
    already-indexed records one URL at a time,
    /root/reference/warc_indexer/indexer/es_sink.py resume path; here the
    skip-set is derived distributedly from content hashes in one pass).

    ``old_state`` is the previous run's PROCESSED output and must carry
    the content hash in ``state_h_col`` plus the same columns
    ``process_fn`` emits.  ``new`` is the raw (key, text) snapshot.
    ``process_fn`` is a map_batches callable (pa.Table -> pa.Table) that
    must include (key_col, state_h_col) in its output.

    Plan (no text ever shuffles):
    1. (key, h) rows from BOTH sides — old side reads its stored hash, new
       side hashes its text map-side — union + one groupby(key) classify
       (same exchange as ``snapshot_diff``; hash rows only).
    2. The classified key sets (reprocess = added|changed, keep = same)
       are applied as FILTERS against the raw sides.  Below
       ``broadcast_max`` keys the sets broadcast via ``ray.put`` (the
       normal case: a daily diff is small relative to the corpus);
       above it, each side unions with its key set and a groupby(key)
       semi-join selects survivors (documented fallback: the new side's
       text then shuffles once by key — unavoidable when the diff itself
       is corpus-sized).  Both paths are test-pinned identical.
    3. result = process_fn(new rows needing work) UNION old rows kept
       verbatim.  Bit-identical to a full reprocess (pinned by
       tests/test_stages.py::test_incremental_reindex_matches_full).

    Returns (result_dataset, n_reprocessed, n_carried).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def old_kh(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                key_col: t.column(key_col),
                "h_old": t.column(state_h_col),
                "h_new": pa.array([None] * n, pa.string()),
            }
        )

    def new_kh(t: pa.Table) -> pa.Table:
        hs = pa.array(
            [
                md5((x or "").encode()).hexdigest()
                for x in t.column(content_col).to_pylist()
            ],
            pa.string(),
        )
        return pa.table(
            {
                key_col: t.column(key_col),
                "h_old": pa.array([None] * t.num_rows, pa.string()),
                "h_new": hs,
            }
        )

    agg = (
        old_state.map_batches(old_kh, batch_format="pyarrow", zero_copy_batch=True)
        .union(new.map_batches(new_kh, batch_format="pyarrow", zero_copy_batch=True))
        .groupby(key_col)
        .aggregate(
            Max("h_old", alias_name="h_old", ignore_nulls=True),
            Max("h_new", alias_name="h_new", ignore_nulls=True),
        )
        .materialize()
    )

    # reprocess: in new, and (not in old, or hash differs).  Kleene
    # variants: added keys have h_old NULL, and plain and_/or_ PROPAGATE
    # null — the filter would silently drop every added doc.
    reproc = agg.map_batches(
        lambda t: t.filter(
            pc.and_kleene(
                pc.is_valid(t.column("h_new")),
                pc.or_kleene(
                    pc.is_null(t.column("h_old")),
                    pc.not_equal(t.column("h_old"), t.column("h_new")),
                ),
            )
        ).select([key_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    keep = agg.map_batches(
        lambda t: t.filter(
            pc.and_kleene(
                pc.is_valid(t.column("h_new")),
                pc.and_kleene(
                    pc.is_valid(t.column("h_old")),
                    pc.equal(t.column("h_old"), t.column("h_new")),
                ),
            )
        ).select([key_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # both gate counts in ONE pass over the (corpus-sized) statuses table
    # — two ints per block to the driver, instead of two full .count()
    # executions
    def gate_counts(t: pa.Table) -> pa.Table:
        ho, hn = t.column("h_old"), t.column("h_new")
        in_new = pc.is_valid(hn)
        same = pc.and_kleene(
            in_new, pc.and_kleene(pc.is_valid(ho), pc.equal(ho, hn))
        )
        n_new = int(pc.sum(pc.cast(in_new, pa.int64())).as_py() or 0)
        n_same = int(pc.sum(pc.cast(same, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "n_reproc": pa.array([n_new - n_same], pa.int64()),
                "n_keep": pa.array([n_same], pa.int64()),
            }
        )

    n_reproc = 0
    n_keep = 0
    for tab in ray.get(
        agg.map_batches(gate_counts, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    ):
        n_reproc += sum(tab.column("n_reproc").to_pylist())
        n_keep += sum(tab.column("n_keep").to_pylist())

    def select_by(ds: ray.data.Dataset, keys: ray.data.Dataset, n_keys: int):
        return select_by_keys(
            ds, keys, n_keys, key_col=key_col, broadcast_max=broadcast_max
        )

    to_process = select_by(new, reproc, n_reproc)
    carried = select_by(old_state, keep, n_keep)
    processed = to_process.map_batches(
        process_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    return processed.union(carried), n_reproc, n_keep


def select_by_keys(
    ds: ray.data.Dataset,
    keys: ray.data.Dataset,
    n_keys: int,
    *,
    key_col: str,
    broadcast_max: int = 5_000_000,
    invert: bool = False,
) -> ray.data.Dataset:
    """Semi-join: rows of ``ds`` whose ``key_col`` appears in ``keys``
    (a one-column key dataset, unique per key) — or the anti-join with
    ``invert=True``.  Below ``broadcast_max`` keys the set broadcasts via
    ``ray.put`` (one streaming filter pass); above it, a union +
    groupby(key) semi-join co-locates each key's rows with its marker row
    (documented fallback: ``ds`` then shuffles once by key).  Both paths
    are pinned identical by the incremental_reindex and build-corpus
    tests."""
    if n_keys <= broadcast_max:
        kset = []
        for tab in ray.get(keys.to_arrow_refs()):
            # a block-less materialized Dataset loses its schema (repo
            # rule) — an empty key set arrives as zero-column tables or
            # empty pandas passthrough blocks
            if isinstance(tab, pa.Table) and key_col in tab.column_names:
                kset.extend(tab.column(key_col).to_pylist())
        ref = ray.put(set(kset))

        def f(t: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            mask = pa.array(
                [(k in ks) != invert for k in t.column(key_col).to_pylist()]
            )
            return t.filter(mask)

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    # scale fallback: union + groupby(key) semi-join — the marker row
    # (payload columns null, _sel true) flags its key group as selected
    schema = {f.name: f.type for f in ds.schema().base_schema}
    payload = [(c, schema[c]) for c in schema if c != key_col]

    def markers(t: pa.Table) -> pa.Table:
        out = {key_col: t.column(key_col).cast(schema[key_col])}
        for c, typ in payload:
            out[c] = pa.array([None] * t.num_rows, typ)
        out["_sel"] = pa.array([True] * t.num_rows, pa.bool_())
        return pa.table(out)

    def tag(t: pa.Table) -> pa.Table:
        out = {key_col: t.column(key_col)}
        for c, _ in payload:
            out[c] = t.column(c)
        out["_sel"] = pa.array([False] * t.num_rows, pa.bool_())
        return pa.table(out)

    # null marker rows promote int64 payload to float64 inside the
    # group frame — astype back once the markers are dropped (repo
    # rule), and re-emit Arrow blocks with the original schema so
    # downstream sorts/groupbys never see mixed block types
    int_cols = [c for c, typ in payload if pa.types.is_integer(typ)]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        selected = bool(df["_sel"].any()) != invert
        out = (df[~df["_sel"]] if selected else df.iloc[0:0]).drop(
            columns=["_sel"]
        )
        for c in int_cols:
            out = out.assign(**{c: out[c].astype("int64")})
        return out

    def to_arrow(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {c: pa.array(df[c], schema[c]) for c in [key_col] + [p[0] for p in payload]}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    marked = keys.map_batches(markers, batch_format="pyarrow", zero_copy_batch=True)
    return (
        tagged.union(marked)
        .groupby(key_col)
        .map_groups(pick, batch_format="pandas")
        .map_batches(to_arrow, batch_format="pandas")
    )


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

    # Arrow-convert before the shuffle: a groupby over pandas-format
    # blocks is ~20x slower than over Arrow blocks (PERF.md #31)
    from engine.stages.common import as_arrow

    cand = as_arrow(ds.map_batches(partial, batch_format="pandas"))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, tiebreak_col], kind="mergesort")
        return df.tail(1)

    return cand.groupby(key_col).map_groups(pick, batch_format="pandas")


def recrawl_schedule(
    diff: "ray.data.Dataset",
    *,
    key_col: str = "doc_id",
    status_col: str = "status",
    base_interval_s: int = 86_400,
    min_s: int = 3_600,
    max_s: int = 604_800,
) -> "ray.data.Dataset":
    """Adaptive revisit policy over a snapshot diff (Cho & Garcia-Molina,
    "Effective Page Refresh Policies" family: halve the revisit interval
    for pages observed changed, double it for pages observed unchanged,
    seed new pages at the base interval, stop scheduling removed ones —
    the reschedule step that closes the crawl lifecycle loop:
    discover -> fetch -> extract -> diff -> RESCHEDULE).

    One stateless vectorized map over the diff rows (np.select on the
    status column), integer seconds throughout (SQL-exact).  Emits
    (key, status, interval_s) with interval_s = -1 for removed keys
    (kept for lineage; the frontier drops them).
    """
    import numpy as np

    changed_iv = max(min_s, base_interval_s // 2)
    same_iv = min(max_s, base_interval_s * 2)

    def plan(t: pa.Table) -> pa.Table:
        st = np.asarray(t.column(status_col).to_pylist(), dtype=object)
        iv = np.select(
            [st == "changed", st == "same", st == "added"],
            [np.int64(changed_iv), np.int64(same_iv), np.int64(base_interval_s)],
            default=np.int64(-1),
        ).astype(np.int64)
        return pa.table(
            {
                key_col: t.column(key_col),
                status_col: t.column(status_col),
                "interval_s": pa.array(iv, pa.int64()),
            }
        )

    return diff.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)


def ivm_maintain(
    base: "ray.data.Dataset",
    inserts: "ray.data.Dataset",
    deletes: "ray.data.Dataset",
    *,
    group_col: str = "lang",
    value_col: str = "n_chars",
) -> pa.Table:
    """Incremental materialized-view maintenance for a distributive
    aggregate (count + sum per group): given the standing view's BASE
    rows plus an insert and a delete delta, produce the refreshed view by
    touching ONLY the delta — agg' = agg(base) + agg(inserts) -
    agg(deletes).  This is the recompute-avoidance contract every
    snapshot-diff consumer wants (``snapshot_diff`` produces exactly such
    deltas): at 100 TB the base aggregate is a stored artifact and each
    refresh costs O(delta), not O(corpus).

    Shapes: three per-batch partial passes (group cardinality is
    driver-sized here, so partials merge on the driver — CLAUDE.md rule;
    a corpus-keyed view would use one union+groupby with signed
    weights instead, same algebra).  Groups whose refreshed count
    reaches zero drop out of the view (relational semantics).  Output
    ``(group, n_rows, sum_value)``, int64 exact.
    """
    import ray as _ray

    def partial_of(ds, sign: int) -> dict:
        def partials(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0:
                return empty
            gt = pa.table(
                {
                    group_col: t.column(group_col).cast(pa.string()),
                    "v": t.column(value_col).cast(pa.int64()),
                }
            )
            agg = gt.group_by([group_col]).aggregate(
                [("v", "count"), ("v", "sum")]
            )
            return pa.table(
                {
                    group_col: agg.column(group_col),
                    "n": pa.compute.cast(agg.column("v_count"), pa.int64()),
                    "s": pa.compute.cast(agg.column("v_sum"), pa.int64()),
                }
            )

        from engine.stages.common import collect_arrow_blocks

        acc: dict = {}
        out = ds.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        for tab in collect_arrow_blocks(out):
            for g, n, s in zip(
                tab.column(group_col).to_pylist(),
                tab.column("n").to_pylist(),
                tab.column("s").to_pylist(),
            ):
                a = acc.setdefault(g, [0, 0])
                a[0] += sign * n
                a[1] += sign * s
        return acc

    view = partial_of(base, 1)
    for g, (n, s) in partial_of(inserts, 1).items():
        a = view.setdefault(g, [0, 0])
        a[0] += n
        a[1] += s
    for g, (n, s) in partial_of(deletes, -1).items():
        a = view.setdefault(g, [0, 0])
        a[0] += n
        a[1] += s
    groups = sorted(g for g, (n, _) in view.items() if n > 0)
    return pa.table(
        {
            group_col: pa.array(groups, pa.string()),
            "n_rows": pa.array([view[g][0] for g in groups], pa.int64()),
            "sum_value": pa.array([view[g][1] for g in groups], pa.int64()),
        }
    )
