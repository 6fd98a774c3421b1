"""Unit tests for engine.ids against hand-derived vectors from the reference
algorithms (/root/reference/warc_indexer/indexer/process.py:309-389)."""

import uuid
from base64 import b64encode

import numpy as np
import pytest

from engine.ids import (
    clip_warc_date,
    index_uuid,
    index_uuid_batch,
    url_hash64,
    urlsafe_b64,
    uuid_prefix_partitioner,
    webis_uuid,
    webis_uuid_batch,
)


def test_urlsafe_b64_translation():
    # '/'->'-' and '+'->'_' (NOT the RFC 4648 mapping).
    assert urlsafe_b64("a/b+c") == "a-b_c"
    assert urlsafe_b64("AB==") == "AB=="


def test_webis_uuid_matches_manual_uuid5():
    prefix, internal = "clueweb09", "clueweb09-en0044-22-32198"
    expected_uuid = uuid.uuid5(uuid.NAMESPACE_URL, f"{prefix}:{internal}")
    expected = b64encode(expected_uuid.bytes)[:-2].decode().translate({47: 45, 43: 95})
    assert webis_uuid(prefix, internal) == expected
    assert len(webis_uuid(prefix, internal)) == 22  # 16 bytes b64 minus '=='


def test_webis_uuid_batch_agrees_with_scalar():
    ids = [f"doc-{i}" for i in range(50)]
    assert webis_uuid_batch("cc", ids) == [webis_uuid("cc", i) for i in ids]


def test_index_uuid_fields_roundtrip():
    # Rebuild the UUID from the b64 output and check field packing.
    t_ms, pos, name, doc = 1670000000123, 0xABCD1234, "file.warc.gz", "docid"
    out = index_uuid(t_ms, pos, name, doc)
    raw = out.translate({45: 47, 95: 43}) + "=="
    import base64

    u = uuid.UUID(bytes=base64.b64decode(raw))
    assert u.time_low == t_ms & 0xFFFFFFFF
    assert u.time_mid == (t_ms >> 32) & 0xFFFF
    assert u.time_hi_version == (((pos >> 16) & 0x3FFF) | 0x1000)
    assert u.clock_seq_low == pos & 0xFF
    assert u.clock_seq_hi_variant == (((pos >> 8) & 0x3F) | 0x80)


def test_index_uuid_time_sortable():
    a = index_uuid(1000, 0, "f", "d")
    b = index_uuid(1670000000000, 0, "f", "d")
    # UUIDv1 layout packs low time bits first, so raw-byte order is not
    # lexicographic across the full 64-bit range -- but ids for the same
    # second-granularity era sort by time_low.
    assert a != b


def test_index_uuid_batch():
    out = index_uuid_batch([1, 2], [3, 4], ["a", "b"], ["x", "y"])
    assert out == [index_uuid(1, 3, "a", "x"), index_uuid(2, 4, "b", "y")]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2009-03-82T07:34:44-0700", "2009-03-31T07:34:44-0700"),
        ("2009-02-30T00:00:00Z", "2009-02-28T00:00:00Z"),
        ("2008-02-30T00:00:00Z", "2008-02-29T00:00:00Z"),  # leap year
        ("2009-03-15T07:34:44-0700", "2009-03-15T07:34:44-0700"),
        ("2023-01-01T00:00:00", "2023-01-01T00:00:00"),
    ],
)
def test_clip_warc_date(raw, expected):
    assert clip_warc_date(raw) == expected


def test_uuid_prefix_partitioner_range():
    assert uuid_prefix_partitioner("00000000-0000-0000-0000-000000000000", 10) == 0
    assert uuid_prefix_partitioner("ffffffff-ffff-ffff-ffff-ffffffffffff", 10) == 9
    mid = uuid_prefix_partitioner("80000000-0000-0000-0000-000000000000", 10)
    assert mid == 5


def test_url_hash64_deterministic_and_spread():
    urls = [f"https://h{i}.com/p{i}" for i in range(1000)]
    h1 = url_hash64(urls)
    h2 = url_hash64(urls)
    assert (h1 == h2).all()
    assert h1.dtype == np.uint64
    assert len(set(h1.tolist())) == 1000
    # shard spread: no shard of 16 gets more than 3x its fair share
    counts = np.bincount((h1 % 16).astype(int), minlength=16)
    assert counts.max() < 3 * 1000 / 16
