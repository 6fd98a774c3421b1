"""Resumable index pipeline: manifest anti-join, atomic partition writes,
no re-processing on restart (SURVEY.md §5 layer 6)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from engine.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def sharded_pages(fixture_dir, tmp_path_factory):
    """Split the fixture pages into 6 files so partitions are meaningful."""
    out = tmp_path_factory.mktemp("sharded")
    t = pq.read_table(os.path.join(fixture_dir, "pages.parquet"))
    n = t.num_rows
    step = (n + 5) // 6
    for i in range(6):
        pq.write_table(t.slice(i * step, step), str(out / f"pages_{i:02d}.parquet"))
    return str(out)


def test_partitioning_and_fingerprints(sharded_pages):
    files = sorted(glob.glob(os.path.join(sharded_pages, "*.parquet")))
    parts = ckpt.partition_inputs(files, files_per_partition=2)
    assert [len(p) for p in parts] == [2, 2, 2]
    pids = [ckpt.partition_id_for(p) for p in parts]
    assert len(set(pids)) == 3
    assert ckpt.fingerprint_files(parts[0]) == ckpt.fingerprint_files(list(reversed(parts[0])))


def test_resumable_pipeline_skips_done(ray_session, sharded_pages, tmp_path):
    from engine.pipelines.index_pipeline import (
        extracted_parts_view,
        run_index_pipeline_resumable,
    )

    out = str(tmp_path / "ckpt_out")
    run_index_pipeline_resumable(sharded_pages, out, files_per_partition=2, concurrency=2)
    manifest = ckpt.load_manifest(out)
    assert manifest.num_rows == 3
    total_rows = extracted_parts_view(out).count()
    n_in = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(sharded_pages, "*.parquet"))
    )
    assert total_rows == n_in

    # record mtimes; a second run must not rewrite anything
    before = {
        d: os.path.getmtime(d) for d in glob.glob(os.path.join(out, "part-*"))
    }
    run_index_pipeline_resumable(sharded_pages, out, files_per_partition=2, concurrency=2)
    after = {d: os.path.getmtime(d) for d in glob.glob(os.path.join(out, "part-*"))}
    assert before == after, "completed partitions were re-processed"

    # simulate a killed run: drop one partition + its manifest row
    victim = sorted(glob.glob(os.path.join(out, "part-*")))[0]
    pid = os.path.basename(victim)[len("part-"):]
    import shutil

    shutil.rmtree(victim)
    os.remove(os.path.join(out, ckpt.MANIFEST_DIR, f"{pid}.parquet"))
    run_index_pipeline_resumable(sharded_pages, out, files_per_partition=2, concurrency=2)
    assert ckpt.load_manifest(out).num_rows == 3
    assert extracted_parts_view(out).count() == n_in
    # untouched partitions kept their mtimes
    for d, m in after.items():
        if d != victim:
            assert os.path.getmtime(d) == m


def test_manifest_skip_counts(ray_session, sharded_pages, tmp_path):
    from engine.pipelines.index_pipeline import run_index_pipeline_resumable

    out = str(tmp_path / "counts_out")
    run_index_pipeline_resumable(sharded_pages, out, files_per_partition=3, concurrency=2)
    m = ckpt.load_manifest(out).to_pandas()
    assert (m["rows_in"] == m["rows_out"]).all()  # every row lands with a status
    import json

    merged = {}
    for s in m["skip_counts"]:
        for k, v in json.loads(s).items():
            merged[k] = merged.get(k, 0) + v
    assert merged.get("kept", 0) > 500
    assert "too_short" in merged


def test_corrupt_manifest_rerun_not_crash(tmp_path):
    """A truncated/corrupt manifest part must NOT crash resume — the
    partition reads as not-done and re-runs (atomic writes mean
    corruption is external; redo is the safe answer)."""
    from engine.state.checkpoint import (
        completed_partitions,
        load_manifest,
        partition_id_for,
        pending_partitions,
        record_partition,
    )

    out = str(tmp_path / "out")
    f1 = tmp_path / "a.parquet"
    f2 = tmp_path / "b.parquet"
    f1.write_bytes(b"x" * 64)
    f2.write_bytes(b"y" * 64)
    parts = [[str(f1)], [str(f2)]]
    # mark both done
    for files in parts:
        pid = partition_id_for(files)
        from engine.state.checkpoint import fingerprint_files

        record_partition(out, pid, fingerprint_files(files), 1, 1, {}, 5)
    assert pending_partitions(out, parts) == []
    # corrupt ONE manifest part
    import glob
    import os

    from engine.state.checkpoint import MANIFEST_DIR

    mfiles = sorted(glob.glob(os.path.join(out, MANIFEST_DIR, "*.parquet")))
    with open(mfiles[0], "wb") as fh:
        fh.write(b"not parquet")
    pend = pending_partitions(out, parts)
    assert len(pend) == 1  # only the corrupt partition re-runs
    m = load_manifest(out)
    assert m is not None and m.num_rows == 1  # the intact part survives
