"""The flagship pipeline: pages -> extracted docs -> meta/data Parquet.

Ray-Data-native re-expression of the reference's main entry point
(/root/reference/warc_indexer/index.py:161-185):

    ReadWarcs | WindowInto | ProcessRecords | 2x ElasticsearchBulkSink

becomes

    read_parquet(pages) -> map_batches(ExtractPages, actor pool)
        -> write_parquet(extracted/, full columns)
    meta/data views = column-pruned reads of extracted/

The two-sink split (beam.Partition at process.py:91-92) is NOT two filtered
consumers of the same lazy dataset (that would run extraction twice): the
extraction output is written ONCE with all columns, and the meta/data tables
are cheap columnar projections of that Parquet — the idiomatic columnar
answer, and what makes re-runs resumable (checkpoint manifests cover the
extracted partitions).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data


def _keep_unskipped(t: pa.Table) -> pa.Table:
    return t.filter(pc.is_null(t["skip_reason"]))


def _read_extracted(extracted_dir: str, columns):
    """read_parquet tolerating an empty output dir (zero-row pipelines write
    no part files; downstream must see an empty typed dataset, not ENOENT)."""
    from engine.stages.extract import _OUT_SCHEMA

    has_files = os.path.isdir(extracted_dir) and any(
        f.endswith(".parquet") for f in os.listdir(extracted_dir)
    )
    if not has_files:
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in _OUT_SCHEMA}
        ).select(columns)
        return ray.data.from_arrow(empty)
    return ray.data.read_parquet(extracted_dir, columns=columns)

from engine import schema
from engine.sources.pages import read_pages
from engine.stages.extract import ExtractPages

META_COLS = [f.name for f in schema.META] + ["skip_reason"]
DATA_COLS = [f.name for f in schema.DATA]


def load_lookup_dict(path: str) -> Dict[str, tuple]:
    """Load the rank lookup table into a broadcast-able dict.

    Small-side join: read once on the driver, ``ray.put`` the dict, let every
    extract actor fetch it once in ``__init__`` (replaces the reference's
    per-record Redis hgetall, process.py:178-180).
    """
    t = pq.read_table(path)
    return {
        d: (s, p)
        for d, s, p in zip(
            t.column("doc_id").to_pylist(),
            t.column("spam_rank").to_pylist(),
            t.column("page_rank").to_pylist(),
        )
    }


def extract_dataset(
    pages: ray.data.Dataset,
    *,
    doc_id_prefix: str = "cc",
    lookup_path: Optional[str] = None,
    concurrency: Any = (1, 8),
    batch_size: int = 128,
    always_index_meta: bool = False,
    trust_content_type: bool = False,
) -> ray.data.Dataset:
    """pages Dataset -> extracted Dataset (one row per input page).

    Actor pool so the (cheap here, model-heavy in real deployments) setup
    and the broadcast lookup fetch happen once per actor, not per batch.
    ``batch_size`` is small because HTML rows are wide (SURVEY.md §7.3).

    SIZING: ``concurrency`` x num_cpus must leave headroom for the read and
    write stages — a fixed pool equal to the cluster CPU count deadlocks the
    streaming executor (ReadParquet backpressured forever waiting for a CPU
    the pool never releases).  Rule of thumb: <= ~0.75 x cluster CPUs, or an
    autoscaling ``(min, max)`` tuple.
    """
    lookup_ref = None
    if lookup_path:
        lookup_ref = ray.put(load_lookup_dict(lookup_path))
    return pages.map_batches(
        ExtractPages,
        fn_constructor_kwargs=dict(
            doc_id_prefix=doc_id_prefix,
            always_index_meta=always_index_meta,
            trust_content_type=trust_content_type,
            lookup_ref=lookup_ref,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def run_index_pipeline(
    pages_path: str,
    out_dir: str,
    *,
    doc_id_prefix: str = "cc",
    lookup_path: Optional[str] = None,
    concurrency: Any = (1, 8),
    batch_size: int = 128,
    always_index_meta: bool = False,
) -> Tuple[str, str]:
    """End-to-end: pages Parquet -> extracted/ Parquet; returns view paths.

    Output is a directory of part files (resumable unit; never one giant
    file).  ``meta_view`` / ``data_view`` below project the two logical
    tables out of it.
    """
    pages = read_pages(pages_path)
    extracted = extract_dataset(
        pages,
        doc_id_prefix=doc_id_prefix,
        lookup_path=lookup_path,
        concurrency=concurrency,
        batch_size=batch_size,
        always_index_meta=always_index_meta,
    )
    ex_dir = os.path.join(out_dir, "extracted")
    # replace, never append: write_parquet into an existing directory adds
    # part files, silently duplicating rows on re-runs (idempotent-overwrite
    # is the semantic; the resumable variant handles partial re-runs)
    import shutil as _shutil

    _shutil.rmtree(ex_dir, ignore_errors=True)
    extracted.write_parquet(ex_dir)
    return ex_dir, ex_dir


def run_index_pipeline_resumable(
    pages_path: str,
    out_dir: str,
    *,
    doc_id_prefix: str = "cc",
    lookup_path: Optional[str] = None,
    concurrency: Any = (1, 8),
    batch_size: int = 128,
    always_index_meta: bool = False,
    files_per_partition: int = 4,
) -> str:
    """Checkpointed variant: input files grouped into partitions, each
    written atomically + recorded in the manifest; a killed run restarts and
    processes ONLY pending partitions (SURVEY.md §4; engine.state.checkpoint).

    Partitions are sized (files_per_partition) so each execution saturates
    the cluster; the driver loop over partitions is the resume boundary, not
    a parallelism limit.
    """
    import glob as _glob
    import time as _time

    from engine.state import checkpoint as ckpt

    if os.path.isdir(pages_path):
        files = sorted(_glob.glob(os.path.join(pages_path, "*.parquet")))
        if not files:  # WARC container directory (third ingest format)
            files = sorted(
                _glob.glob(os.path.join(pages_path, "*.warc"))
                + _glob.glob(os.path.join(pages_path, "*.warc.gz"))
            )
    else:
        files = [pages_path]
    from engine.sources.pages import is_warc_path

    warc_input = bool(files) and is_warc_path(files[0])
    parts = ckpt.partition_inputs(files, files_per_partition)
    pending = ckpt.pending_partitions(out_dir, parts)
    os.makedirs(out_dir, exist_ok=True)

    lookup_ref = None
    if lookup_path:
        lookup_ref = ray.put(load_lookup_dict(lookup_path))

    for pid, fp, pfiles in pending:
        t0 = _time.monotonic()
        if warc_input:
            from engine.sources.warc import read_warc

            pages = read_warc(pfiles)
        else:
            pages = ray.data.read_parquet(pfiles)
        extracted = pages.map_batches(
            ExtractPages,
            fn_constructor_kwargs=dict(
                doc_id_prefix=doc_id_prefix,
                always_index_meta=always_index_meta,
                lookup_ref=lookup_ref,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )
        part_dir = os.path.join(out_dir, f"part-{pid}")
        tmp_dir = part_dir + ".tmp"
        import shutil as _shutil

        _shutil.rmtree(tmp_dir, ignore_errors=True)
        extracted.write_parquet(tmp_dir)
        # stats for the manifest (cheap: reads only the skip_reason column).
        # A zero-row partition writes NO part files — read_parquet on the
        # empty dir would raise; record an empty partition instead.
        part_files = sorted(_glob.glob(os.path.join(tmp_dir, "*.parquet")))
        if part_files:
            skip_tbl = (
                ray.data.read_parquet(part_files, columns=["skip_reason"])
                .to_pandas()["skip_reason"]
                .value_counts(dropna=False)
            )
            skip_counts = {
                ("kept" if (k is None or k != k) else str(k)): int(v)
                for k, v in skip_tbl.items()
            }
        else:
            skip_counts = {}
        # WARC containers have no row-count footer; measure rows_in with an
        # INDEPENDENT header-walk pass over the input files (payloads
        # skipped) so the manifest's in-vs-out check can actually reveal
        # lost rows, same as the Parquet path's footer counts do
        if warc_input:
            from engine.sources.warc import count_page_records

            rows_in = count_page_records(pfiles)
        else:
            rows_in = sum(pq.read_metadata(f).num_rows for f in pfiles)
        rows_out = int(sum(skip_counts.values()))
        _shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)
        ckpt.record_partition(
            out_dir, pid, fp, rows_in, rows_out, skip_counts,
            int((_time.monotonic() - t0) * 1000),
        )
    return out_dir


def extracted_parts_view(out_dir: str) -> ray.data.Dataset:
    """Read all completed partition outputs of the resumable pipeline."""
    import glob as _glob

    dirs = sorted(_glob.glob(os.path.join(out_dir, "part-*")))
    files = [f for d in dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    return ray.data.read_parquet(files)


def write_partitioned_by_uuid(
    ds: ray.data.Dataset, out_dir: str, num_partitions: int = 16
) -> str:
    """Write a doc table partitioned by uuid range (reference
    uuid_prefix_partitioner, index.py:50-51): ``partition=K/`` directories,
    so consumers can address a doc-id range without scanning everything and
    re-runs can replace one range atomically."""
    from engine.ids import uuid_prefix_partition_batch

    def add_part(t: pa.Table) -> pa.Table:
        p = uuid_prefix_partition_batch(t.column("uuid").to_pylist(), num_partitions)
        return t.append_column("partition", pa.array(p, pa.int32()))

    import shutil as _shutil

    _shutil.rmtree(out_dir, ignore_errors=True)  # partitioned writes append
    # sort before the partitioned write so each partition gets ~1 file, not
    # one sliver per (task x partition)
    ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True).sort(
        "partition"
    ).write_parquet(out_dir, partition_cols=["partition"])
    return out_dir


def apply_updates(
    base: ray.data.Dataset, updates: ray.data.Dataset, key: str = "uuid"
) -> ray.data.Dataset:
    """Upsert-by-id merge: rows from ``updates`` win over ``base``.

    The reference's ``update_action`` mode ("additional-only" runs,
    index.py:120,131-133 + es_sink.py:210-217) relies on Elasticsearch
    upsert-by-_id; the Parquet-native equivalent is a delta table merged by
    deterministic doc id.  Hash-shuffle on the id (groupby), pick the delta
    row per group — last-write-wins with a deterministic winner.
    """
    b = base.map_batches(
        lambda t: t.append_column("_src", pa.array([0] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    u = updates.map_batches(
        lambda t: t.append_column("_src", pa.array([1] * t.num_rows, pa.int8())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pick(df):
        # one output row per key: the update row if present, else the base
        # row.  Tie-break WITHIN the updates delta deterministically — a
        # bare _src sort would surface whichever duplicate arrived last in
        # the shuffle.  idx_id (present in meta/data tables) is a total
        # order; for tables without it, every sortable column participates
        # (strings ARE object dtype in pandas and must be included;
        # list/array-valued columns are unsortable and are excluded by
        # value inspection, not dtype).
        def sortable(c):
            if c == "_src":
                return False
            s = df[c].dropna()
            if s.empty:
                return True  # all-null sorts stably
            import numpy as _np

            return not isinstance(
                s.iloc[0], (list, tuple, dict, set, _np.ndarray)
            )

        tiebreak = (
            ["idx_id"]
            if "idx_id" in df.columns
            else [c for c in df.columns if sortable(c)]
        )
        df = df.sort_values(["_src"] + tiebreak, kind="mergesort")
        return df.tail(1).drop(columns=["_src"])

    return b.union(u).groupby(key).map_groups(pick, batch_format="pandas")


def meta_view(extracted_dir: str, always_index_meta: bool = False) -> ray.data.Dataset:
    """Meta table (reference meta_index): column-pruned read of extracted/.

    With ``always_index_meta`` (reference --always-index-meta flag,
    index.py:112) every parseable record appears; default keeps only rows
    whose payload was indexed (process.py:190-193 semantics).
    """
    ds = _read_extracted(extracted_dir, META_COLS)
    if not always_index_meta:
        ds = ds.map_batches(_keep_unskipped, batch_format="pyarrow", zero_copy_batch=True)
    return ds.select_columns([c for c in META_COLS if c != "skip_reason"])


def data_view(extracted_dir: str) -> ray.data.Dataset:
    """Data table (reference data_index): kept docs only."""
    ds = _read_extracted(extracted_dir, DATA_COLS + ["skip_reason"])
    return ds.map_batches(
        _keep_unskipped, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(DATA_COLS)
