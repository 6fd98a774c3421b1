"""Fault-injection tests for the resilient remote-fetch layer
(engine/sources/resilient.py) — the sandbox-testable stand-in for the
reference's S3 retry/resume semantics (warcio.py:164-230).  No network
exists here, so a flaky LOCAL filesystem injects the failures."""

from __future__ import annotations

import datetime as dt

import pytest

from engine.sources.faults import FlakyFS
from engine.sources.resilient import fetch_bytes, resolve_filesystem
from engine.sources.warc import read_warc, write_warc


@pytest.fixture()
def payload_file(tmp_path):
    p = tmp_path / "blob.bin"
    data = bytes(range(256)) * 1000  # 256 000 bytes, several 4 KiB chunks
    p.write_bytes(data)
    return str(p), data


def test_fetch_clean_path(payload_file):
    path, data = payload_file
    fs = FlakyFS()
    assert fetch_bytes(path, fs, chunk_size=4096) == data
    assert fs.log[0]["opens"] == 1


def test_fetch_retries_failed_opens(payload_file):
    path, data = payload_file
    fs = FlakyFS(fail_opens=2)
    waits = []
    out = fetch_bytes(
        path, fs, attempts=4, base_backoff=0.5, sleep=waits.append
    )
    assert out == data
    assert fs.log[0]["opens"] == 3
    assert waits == [0.5, 1.0]  # exponential backoff, no real sleeping


def test_fetch_resumes_mid_stream_at_offset(payload_file):
    path, data = payload_file
    # chunk_size 4096 → read #0..#62 return data; fail read #3 and #40.
    fs = FlakyFS(fail_reads={3, 40})
    out = fetch_bytes(path, fs, chunk_size=4096, sleep=lambda s: None)
    assert out == data
    # Each failure re-opened and RESUMED at the already-fetched offset —
    # never a seek back to zero after progress.
    seeks = [pos for op, pos in fs.log[1:] if op == "seek"]
    assert seeks == [3 * 4096, 39 * 4096]  # read idx 40 = 39 data chunks in
    assert fs.log[0]["opens"] == 3


def test_fetch_gives_up_after_consecutive_failures(payload_file):
    path, _ = payload_file
    fs = FlakyFS(fail_opens=10**9)
    with pytest.raises(OSError, match="giving up opening"):
        fetch_bytes(path, fs, attempts=3, sleep=lambda s: None)
    assert fs.log[0]["opens"] == 3


def test_progress_refills_attempt_budget(payload_file):
    path, data = payload_file
    # Fail EVERY OTHER read: 63 failures total but never 2 consecutive —
    # attempts=2 must still complete (the reference's resume semantics:
    # a flaky-but-progressing stream is not a dead host).
    fs = FlakyFS(fail_reads=frozenset(range(1, 200, 2)))
    out = fetch_bytes(path, fs, attempts=2, chunk_size=4096, sleep=lambda s: None)
    assert out == data


def test_fetch_mid_stream_give_up_names_offset(payload_file):
    path, _ = payload_file
    fs = FlakyFS(fail_reads=frozenset(range(2, 10**6)))
    with pytest.raises(OSError, match="at offset 8192"):
        fetch_bytes(path, fs, attempts=3, chunk_size=4096, sleep=lambda s: None)


def test_resolve_filesystem_local(tmp_path):
    fs, rel = resolve_filesystem(str(tmp_path / "x"))
    from pyarrow import fs as pafs

    assert isinstance(fs, pafs.LocalFileSystem)
    assert rel == str(tmp_path / "x")


def test_resolve_filesystem_s3_dispatch(monkeypatch):
    """s3:// paths construct an S3FileSystem with the reference's timeout
    pair (warcio.py:212-214) — constructor intercepted; no network here."""
    from pyarrow import fs as pafs

    seen = {}

    class FakeS3:
        def __init__(self, **kw):
            seen.update(kw)

    monkeypatch.setattr(pafs, "S3FileSystem", FakeS3)
    fs, rel = resolve_filesystem("s3://bucket/key/file.warc.gz")
    assert isinstance(fs, FakeS3)
    assert rel == "bucket/key/file.warc.gz"
    assert seen == {"connect_timeout": 60.0, "request_timeout": 240.0}


def test_read_warc_remote_prefix_listing(tmp_path, ray_session):
    """A URI prefix (here file://, standing in for s3://) is listed
    recursively through the scheme's filesystem and every .warc.gz under
    it is read via the resilient fetch path."""
    d = tmp_path / "corpus" / "shard0"
    d.mkdir(parents=True)
    for fi, n in (("a", 3), ("b", 4)):
        write_warc(
            iter(
                (f"https://{fi}.com/{i}", dt.datetime(2024, 1, 2),
                 f"<html>{fi}{i}</html>".encode())
                for i in range(n)
            ),
            str(d / f"{fi}.warc.gz"),
        )
    (d / "ignore.txt").write_text("not a warc")

    ds = read_warc(f"file://{tmp_path / 'corpus'}")
    rows = ds.take_all()
    assert len(rows) == 7
    assert sorted(r["url"] for r in rows)[0] == "https://a.com/0"

    # the BARE local spelling of the same tree expands identically
    # (recursive os.walk — one rule across local and remote spellings)
    local_rows = read_warc(str(tmp_path / "corpus")).take_all()
    assert sorted(r["url"] for r in local_rows) == sorted(
        r["url"] for r in rows
    )

    # an EXPLICIT filesystem lists directories through that same
    # filesystem (listing and fetching can't use different stores)
    from pyarrow import fs as pafs

    fs_rows = read_warc(
        str(tmp_path / "corpus"), filesystem=pafs.LocalFileSystem()
    ).take_all()
    assert sorted(r["url"] for r in fs_rows) == sorted(r["url"] for r in rows)

    # one call = one store: remote + local mixes are a loud error
    with pytest.raises(ValueError, match="mixing remote and local"):
        read_warc([f"file://{tmp_path}/corpus", str(tmp_path / "corpus")])


def test_read_warc_through_flaky_filesystem(tmp_path, ray_session):
    """End-to-end: read_warc with an injected-failure filesystem yields the
    same rows as the clean local path — the retry layer is transparent."""
    rows = [
        (f"https://ex.com/{i}", dt.datetime(2024, 1, 1, 0, 0, i),
         f"<html><body>doc {i}</body></html>".encode())
        for i in range(20)
    ]
    warc = str(tmp_path / "pages.warc.gz")
    write_warc(iter(rows), warc)

    clean = read_warc(warc).take_all()
    flaky = read_warc(
        warc, filesystem=FlakyFS(fail_opens=1, fail_reads={2})
    ).take_all()
    assert flaky == clean
    assert len(flaky) == 20
    assert flaky[0]["url"] == "https://ex.com/0"


def test_fetch_bytes_random_failure_schedules(tmp_path):
    """Property: ANY failure schedule without `attempts` consecutive
    no-progress errors yields exactly the file's bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    p = tmp_path / "h.bin"
    data = bytes(range(256)) * 40  # 10240 bytes → 10 chunks of 1024
    p.write_bytes(data)

    def _gives_up(fail_reads, fail_opens, attempts):
        # Simulate the engine's consumed read-index prefix: the failure
        # run can MIX the initial open failures (FlakyFS fails the first
        # `fail_opens` opens — a consecutive run at the start) with read
        # failures, and reading STOPS at the terminating empty read
        # (10 data chunks + 1 EOF success) — failures scheduled beyond
        # that prefix are never reached.
        if fail_opens >= attempts:
            return True
        run = fail_opens  # reads start with this many consecutive fails
        succ, i = 0, 0
        while succ < 11:  # 10 × 1024-byte chunks + the empty EOF read
            if i in fail_reads:
                run += 1
                if run >= attempts:
                    return True
            else:
                run = 0
                succ += 1
            i += 1
        return False

    @settings(max_examples=40, deadline=None)
    @given(
        fail_reads=st.sets(st.integers(min_value=0, max_value=60), max_size=20),
        fail_opens=st.integers(min_value=0, max_value=2),
    )
    def prop(fail_reads, fail_opens):
        fs = FlakyFS(fail_opens=fail_opens, fail_reads=fail_reads)
        try:
            out = fetch_bytes(
                str(p), fs, attempts=3, chunk_size=1024, sleep=lambda s: None
            )
        except OSError:
            # give-up is only legal after 3 consecutive no-progress errors
            assert _gives_up(fail_reads, fail_opens, 3)
            return
        assert out == data
        assert not _gives_up(fail_reads, fail_opens, 3)

    prop()
