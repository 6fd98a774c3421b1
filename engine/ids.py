"""Deterministic document-ID derivation.

Semantics match the reference implementation exactly
(/root/reference/warc_indexer/indexer/process.py:309-389 and
/root/reference/warc_indexer/index.py:50-51), re-expressed as batch-friendly
functions for use inside ``Dataset.map_batches``: the scalar forms are kept
for unit tests / the oracle, and ``*_batch`` forms amortize setup over a
column of values (hashing itself is C-speed; the per-row Python overhead is
negligible next to HTML parsing in the same stage).

All functions are pure: same input -> same output on every worker, which is
what makes re-execution / resume idempotent (the engine's replacement for the
reference's ES upsert-by-_id idempotency, es_sink.py:200-207).
"""

from __future__ import annotations

import re
import uuid
from base64 import b64encode
from calendar import monthrange
from hashlib import blake2b
from typing import Iterable, List

import numpy as np

# '/' (47) -> '-' (45), '+' (43) -> '_' (95).  Nonstandard vs RFC 4648
# (which maps '+'->'-', '/'->'_') but intentional: reference process.py:309-316.
_B64_URLSAFE = {47: 45, 43: 95}

_DATE_PART = re.compile(r"(\d{4})-(\d{2})-(\d+)")


def urlsafe_b64(s: str) -> str:
    """URL-safe Base64: '/'->'-', '+'->'_' (reference process.py:309-316)."""
    return s.translate(_B64_URLSAFE)


def webis_uuid(corpus_prefix: str, internal_id: str) -> str:
    """Truncated URL-safe b64 of UUIDv5(NAMESPACE_URL, prefix:id).

    Reference: process.py:319-329.
    """
    u = uuid.uuid5(uuid.NAMESPACE_URL, f"{corpus_prefix}:{internal_id}")
    return urlsafe_b64(b64encode(u.bytes)[:-2].decode())


def webis_uuid_batch(corpus_prefix: str, internal_ids: Iterable[str]) -> List[str]:
    """Column form of :func:`webis_uuid` for map_batches projections."""
    ns = uuid.NAMESPACE_URL
    pre = corpus_prefix + ":"
    tr = _B64_URLSAFE
    return [
        b64encode(uuid.uuid5(ns, pre + i).bytes)[:-2].decode().translate(tr)
        for i in internal_ids
    ]


def index_uuid(unix_time_ms: int, warc_pos: int, warc_name: str, doc_id: str) -> str:
    """Time-sortable UUIDv1-layout doc id (reference process.py:347-374).

    Packs (unix-ms timestamp, source byte offset, blake2b-3(file name) ||
    blake2b-3(doc id)) into the UUIDv1 field layout so ids sort roughly by
    capture time, then truncated-b64 + URL-safe like :func:`webis_uuid`.
    """
    time_low = unix_time_ms & 0xFFFFFFFF
    time_mid = (unix_time_ms >> 32) & 0xFFFF

    pos = warc_pos & 0xFFFFFFFF
    time_hi_version = ((pos >> 16) & 0x3FFF) | 0x1000
    clock_seq_hi_variant = ((pos >> 8) & 0x3F) | 0x80
    clock_seq_low = pos & 0xFF

    node = int.from_bytes(
        blake2b(warc_name.encode(), digest_size=3).digest()
        + blake2b(doc_id.encode(), digest_size=3).digest(),
        "big",
    )
    u = uuid.UUID(
        fields=(time_low, time_mid, time_hi_version, clock_seq_hi_variant, clock_seq_low, node)
    )
    return urlsafe_b64(b64encode(u.bytes)[:-2].decode())


def index_uuid_batch(
    unix_time_ms: Iterable[int],
    warc_pos: Iterable[int],
    warc_names: Iterable[str],
    doc_ids: Iterable[str],
) -> List[str]:
    return [
        index_uuid(int(t), int(p), n, d)
        for t, p, n, d in zip(unix_time_ms, warc_pos, warc_names, doc_ids)
    ]


def clip_warc_date(date_val: str) -> str:
    """Clamp out-of-range day-of-month in ISO-ish dates.

    ClueWeb WARCs carry values like '2009-03-82T07:34:44-0700'; the day is
    clipped to the month's length (reference process.py:377-389).
    """

    def fix(m: re.Match) -> str:
        y, mo, d = m.group(1), m.group(2), m.group(3)
        day = min(int(d), monthrange(int(y), int(mo))[1])
        return f"{y}-{mo}-{day:02}"

    return _DATE_PART.sub(fix, date_val)


def uuid_prefix_partitioner(key: str, num_partitions: int) -> int:
    """Range-partition a hex UUID string into ``num_partitions`` buckets.

    Reference: index.py:50-51 (``UUID(key).int * n // 16**32``).
    """
    return uuid.UUID(key).int * num_partitions // pow(16, 32)


def uuid_prefix_partition_batch(b64_ids: Iterable[str], num_partitions: int) -> np.ndarray:
    """Range-partition truncated-b64 uuids (webis/index ids) into buckets.

    Column form of :func:`uuid_prefix_partitioner` for our b64 id spelling:
    decode back to the 128-bit integer, then ``int * n // 2**128``.  Used to
    partition output tables by doc-id range (reference index.py:50-51).
    """
    from base64 import b64decode

    vals = []
    inv = {45: 47, 95: 43}  # '-'->'/', '_'->'+'
    for s in b64_ids:
        raw = b64decode(s.translate(inv) + "==")
        vals.append(int.from_bytes(raw, "big") * num_partitions >> 128)
    return np.array(vals, dtype=np.int64)


def url_hash64(urls: Iterable[str]) -> np.ndarray:
    """64-bit stable content hash of each URL (blake2b-8, big-endian).

    This is the engine's frontier key: cuckoo shard routing is
    ``url_hash % num_shards`` and exact frontier dedup groups on it.
    Deterministic across processes (unlike Python ``hash``).
    """
    return np.fromiter(
        (
            int.from_bytes(blake2b(u.encode(), digest_size=8).digest(), "big")
            for u in urls
        ),
        dtype=np.uint64,
    )
