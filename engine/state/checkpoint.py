"""Per-partition checkpoint manifests for the index pipeline (SURVEY.md §4).

Replaces the reference's Redis resume cache (completed byte-span sets keyed
by sha256(path), warcio.py:120-134,172-174) with a Parquet manifest:

- the input is split into *partitions* (groups of input files sized so one
  partition's pipeline execution saturates the cluster);
- each partition's output is written to a tmp dir and atomically renamed,
  then a manifest row (partition_id, input_fingerprint, rows_in, rows_out,
  skip_counts JSON, wall_ms) is appended (write-new-file-per-row: append-
  safe on any filesystem, no read-modify-write);
- on restart, pending partitions = inputs whose (partition_id, fingerprint)
  is absent from the manifest — a driver-side anti-join over a tiny table.

Idempotency comes from deterministic doc ids (engine.ids) + atomic renames:
re-running a half-written partition replaces it wholesale.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import time
from hashlib import blake2b
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

_log = logging.getLogger("engine.checkpoint")


def _read_manifest_file(path: str) -> Optional[pa.Table]:
    """Read one manifest part, treating an unreadable/truncated file as
    ABSENT (the partition simply re-runs and the next record_partition
    atomically overwrites it) — resume must never crash on a corrupt
    manifest: the writes are atomic (tmp + os.replace), so corruption
    means external interference, and redoing one partition is the safe
    answer."""
    try:
        return pq.read_table(path)
    except Exception as exc:  # ArrowInvalid / OSError
        _log.warning("ignoring unreadable manifest %s: %s", path, exc)
        return None

MANIFEST_DIR = "_manifest"


def partition_inputs(files: Sequence[str], files_per_partition: int = 4) -> List[List[str]]:
    """Group sorted input files into partitions (the resume granularity)."""
    files = sorted(files)
    return [
        list(files[i : i + files_per_partition])
        for i in range(0, len(files), files_per_partition)
    ]


def fingerprint_files(files: Sequence[str]) -> str:
    """Path + size + mtime_ns: size alone would treat a same-size rewrite
    as already-processed on resume (silently stale output)."""
    h = blake2b(digest_size=16)
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())
    return h.hexdigest()


def partition_id_for(files: Sequence[str]) -> str:
    return blake2b("|".join(sorted(files)).encode(), digest_size=8).hexdigest()


def completed_partitions(out_dir: str) -> Dict[str, str]:
    """partition_id -> input_fingerprint for all completed partitions."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: Dict[str, str] = {}
    if not os.path.isdir(mdir):
        return done
    for f in sorted(glob.glob(os.path.join(mdir, "*.parquet"))):
        t = _read_manifest_file(f)
        if t is None:
            continue
        for pid, fp in zip(
            t.column("partition_id").to_pylist(), t.column("input_fingerprint").to_pylist()
        ):
            done[pid] = fp
    return done


def record_partition(
    out_dir: str,
    partition_id: str,
    input_fingerprint: str,
    rows_in: int,
    rows_out: int,
    skip_counts: Dict[str, int],
    wall_ms: int,
) -> None:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    t = pa.table(
        {
            "partition_id": pa.array([partition_id], pa.string()),
            "input_fingerprint": pa.array([input_fingerprint], pa.string()),
            "rows_in": pa.array([rows_in], pa.int64()),
            "rows_out": pa.array([rows_out], pa.int64()),
            "skip_counts": pa.array([json.dumps(skip_counts, sort_keys=True)], pa.string()),
            "wall_ms": pa.array([wall_ms], pa.int64()),
        }
    )
    tmp = os.path.join(mdir, f".{partition_id}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(mdir, f"{partition_id}.parquet"))


def load_manifest(out_dir: str) -> Optional[pa.Table]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    files = sorted(glob.glob(os.path.join(mdir, "*.parquet")))
    parts = [t for f in files if (t := _read_manifest_file(f)) is not None]
    if not parts:
        return None
    return pa.concat_tables(parts)


def pending_partitions(
    out_dir: str, partitions: List[List[str]]
) -> List[Tuple[str, str, List[str]]]:
    """Anti-join input partitions against the manifest.

    Returns (partition_id, fingerprint, files) for work still to do; a
    partition whose inputs changed (fingerprint mismatch) is re-done.
    """
    done = completed_partitions(out_dir)
    pending = []
    for files in partitions:
        pid = partition_id_for(files)
        fp = fingerprint_files(files)
        if done.get(pid) != fp:
            pending.append((pid, fp, files))
    return pending
