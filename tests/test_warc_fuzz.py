"""Property-based fuzz for the WARC container parser
(engine/sources/warc.py) — hand-built record streams with adversarial
payloads, record-type mixes, chunked bodies and overlong records must
round-trip exactly, in both uncompressed and gzip-member layouts, and the
payload-skipping counter must agree with the full parser record-for-record."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.sources.warc import (
    count_page_records_bytes,
    iter_warc_records,
)

# Payloads that stress the framing: empty, binary with CRLFCRLF inside,
# gzip magic at the start, very long runs.
payload_st = st.one_of(
    st.binary(max_size=200),
    st.just(b""),
    st.just(b"\r\n\r\n\r\n"),
    st.just(b"\x1f\x8b not actually gzip"),
    st.binary(min_size=300, max_size=2000),
)

record_st = st.fixed_dictionaries(
    {
        "rtype": st.sampled_from(
            [b"response", b"resource", b"conversion", b"request",
             b"metadata", b"warcinfo", b"revisit"]
        ),
        "url": st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1,
                max_size=40,
            ).map(lambda s: f"https://f.test/{s}"),
        ),
        "payload": payload_st,
        "http_wrap": st.booleans(),
        "chunked": st.booleans(),
    }
)

_PAGE_TYPES = {b"response", b"resource", b"conversion"}


def _chunk(body: bytes, size: int = 7) -> bytes:
    out = []
    for i in range(0, len(body), size):
        c = body[i : i + size]
        out.append(b"%x\r\n" % len(c) + c + b"\r\n")
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def _build(records, overlong_limit=None):
    """Serialize records to raw WARC bytes + the expected parse output."""
    blobs = []
    expected = []
    for i, r in enumerate(records):
        body = r["payload"]
        if (
            r["rtype"] == b"response"
            and not r["http_wrap"]
            and body.startswith(b"HTTP/")
        ):
            # an unwrapped response whose body opens with "HTTP/" is
            # indistinguishable from a captured HTTP response — keep the
            # fuzz deterministic by breaking the magic
            body = b"X" + body
        if r["rtype"] == b"response" and r["http_wrap"]:
            if r["chunked"]:
                wire = _chunk(body)
                head = (
                    b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                )
            else:
                wire = body
                head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            payload = head + wire
        else:
            payload = body
        hdr = [b"WARC/1.0", b"WARC-Type: " + r["rtype"]]
        if r["url"] is not None:
            hdr.append(b"WARC-Target-URI: " + r["url"].encode())
        hdr.append(b"WARC-Date: 2024-06-01T00:00:%02dZ" % (i % 60))
        hdr.append(b"Content-Length: %d" % len(payload))
        blobs.append(
            b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
        wanted = r["rtype"] in _PAGE_TYPES and r["url"] is not None
        if not wanted:
            continue
        if overlong_limit is not None and len(payload) > overlong_limit:
            expected.append((r["url"], None))
        elif r["rtype"] == b"response" and r["http_wrap"]:
            # parser splits HTTP head and de-chunks — body comes back
            expected.append((r["url"], body))
        else:
            expected.append((r["url"], payload))
    return b"".join(blobs), expected


@settings(max_examples=60, deadline=None)
@given(st.lists(record_st, max_size=12), st.booleans())
def test_warc_stream_roundtrip(records, compress):
    raw, expected = _build(records)
    if compress:
        # one gzip member per record is the CC layout; a single member over
        # the whole stream is also legal — alternate by record count
        if len(records) % 2:
            raw = gzip.compress(raw)
        else:
            raw = b"".join(
                gzip.compress(raw[i : i + 997])
                for i in range(0, len(raw), 997)
            ) or gzip.compress(b"")
    got = [(u, h) for u, _, h in iter_warc_records(raw)]
    assert got == expected
    assert count_page_records_bytes(raw) == len(expected)


@settings(max_examples=30, deadline=None)
@given(st.lists(record_st, max_size=10), st.integers(min_value=0, max_value=300))
def test_warc_overlong_keeps_metadata_row(records, limit):
    raw, expected = _build(records, overlong_limit=limit)
    got = [(u, h) for u, _, h in iter_warc_records(raw, max_content_length=limit)]
    assert got == expected
    assert count_page_records_bytes(raw, max_content_length=limit) == len(expected)


def test_warc_truncated_final_record():
    """A truncated final normal record is dropped by parser AND counter;
    records before it survive."""
    recs = [
        {"rtype": b"resource", "url": "https://a.test/1", "payload": b"ok",
         "http_wrap": False, "chunked": False},
        {"rtype": b"resource", "url": "https://a.test/2", "payload": b"x" * 100,
         "http_wrap": False, "chunked": False},
    ]
    raw, _ = _build(recs)
    cut = raw[: raw.rfind(b"x" * 50)]  # mid-payload of record 2
    got = list(iter_warc_records(cut))
    assert [u for u, _, _ in got] == ["https://a.test/1"]
    assert count_page_records_bytes(cut) == 1


def test_warc_garbage_header_raises():
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
