"""CDX capture index — the web archive's random-access index.

The reference feeds an Elasticsearch index; real web archives (pywb,
OpenWayback, Common Crawl's cdx-*.gz / cluster.idx) pair the WARC payload
store with a CDX index: one line per capture, SORTED by (SURT key,
timestamp), carrying the (file, offset, length) needed to seek straight to
a record inside a .warc.gz without scanning it.  Two operators:

- ``cdx_index``: the LOGICAL index over a captures dataset (url, ts,
  content) — SURT key, content digest, length, and the archive-dedup
  ``revisit`` flag (a later capture of the same URL with an unchanged
  digest is stored as a slim revisit record, not a second payload copy —
  WARC/1.1 §6.7.2 semantics).  SQL-verifiable.
- ``cdx_index_shards``: the PHYSICAL index over written ``.warc.gz``
  shards — per record (offset, compressed length, digest, HTTP status,
  mime), built by walking each file's gzip members once.  Verified by
  round-trip: ``cdx_fetch`` seeks to (offset, length) and re-parses the
  single record.

Scale shape: shard indexing is one task per file (same parallelism story
as sources.warc.read_warc — WARC has no random access WITHOUT this index,
which is exactly why archives build it); the logical index's revisit flag
needs captures of one (url, digest) co-located, done with ONE coarse
hash-bucket groupby (rule: bucket uniform, resolve vectorized in-bucket),
and the final (surt, ts) sort is inherent — a CDX *is* its sort order
(binary-search lookup, demonstrated by ``cdx_lookup``).  Content/html
never rides the revisit shuffle; digests stand in for payloads.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import os
import zlib
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from engine.canonicalize import canonicalize_batch
from engine.stages.common import as_arrow


def _empty_index() -> pa.Table:
    return pa.table(
        {
            "surt": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
            "length": pa.array([], pa.int64()),
            "revisit": pa.array([], pa.bool_()),
        }
    )


def cdx_index(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    ts_col: str = "ts",
    content_col: str = "content",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Logical CDX over a captures dataset: one row per capture with
    (surt, ts, url, digest, length, revisit), globally sorted by
    (surt, ts).  ``ts`` is any int64 total order (epoch seconds or CDX14);
    ``digest`` is the repo-wide md5 content hash (dedup.content_md5_batch
    definition, natively mirrorable in DuckDB); ``revisit`` is true iff an
    earlier capture (strictly smaller ts) of the SAME url carries the SAME
    digest — equal-ts duplicates are all originals, keeping the flag a
    pure function of the row multiset (deterministic under any block
    layout).
    """
    from engine.stages.dedup import content_md5_batch

    if ds.count() == 0:
        return ray.data.from_arrow(_empty_index())

    def to_rows(t: pa.Table) -> pa.Table:
        from engine.stages.text import fnv1a_batch

        urls = t.column(url_col).to_pylist()
        cols = canonicalize_batch(urls)
        contents = t.column(content_col).to_pylist()
        digests = content_md5_batch(contents)
        lengths = np.fromiter(
            (len((c or "").encode("utf-8")) for c in contents),
            dtype=np.int64,
            count=len(contents),
        )
        # bucket on BOTH url and digest so a (url, digest) group is whole
        # inside one bucket; fnv1a (not Python hash(), which is salted
        # per PROCESS — the same url would bucket differently in different
        # map tasks and split its group).
        kb = (
            fnv1a_batch(
                [(u or "").encode() + b"\x00" + d.encode() for u, d in zip(urls, digests)]
            )
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "kb": pa.array(kb, pa.int64()),
                "surt": pa.array(cols["surt"], pa.string()),
                "ts": t.column(ts_col).cast(pa.int64()),
                "url": pa.array(urls, pa.string()),
                "digest": pa.array(digests, pa.string()),
                "length": pa.array(lengths, pa.int64()),
            }
        )

    def mark_revisits(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["kb"])
        first_ts = df.groupby(["url", "digest"], sort=False)["ts"].transform("min")
        df["revisit"] = df["ts"].to_numpy() > first_ts.to_numpy()
        return df

    rows = ds.map_batches(to_rows, batch_format="pyarrow", zero_copy_batch=True)
    marked = as_arrow(
        rows.groupby("kb").map_groups(mark_revisits, batch_format="pandas")
    )
    return marked.sort(["surt", "ts"])


# ---------------------------------------------------------------------------
# physical index over .warc.gz shards
# ---------------------------------------------------------------------------

def _iter_gzip_members(raw: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, decompressed_bytes) per gzip
    member of a multi-member stream — the byte geometry a CDX records.
    Chunked feed keeps the scan O(n) (no per-member tail copy)."""
    mv = memoryview(raw)
    n = len(raw)
    pos = 0
    chunk_size = 1 << 20
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out: List[bytes] = []
        p = pos
        while not d.eof:
            if p >= n:
                raise ValueError("truncated gzip member at offset %d" % pos)
            chunk = mv[p : p + chunk_size]
            out.append(d.decompress(chunk))
            p += len(chunk) - len(d.unused_data)
        yield pos, p - pos, b"".join(out)
        pos = p


def _http_status_mime(payload: bytes) -> Tuple[int, str]:
    """(status, mime) from a captured HTTP response head; (200, '') for
    non-HTTP payloads (resource/conversion records)."""
    if not payload.startswith(b"HTTP/"):
        return 200, ""
    line_end = payload.find(b"\n")
    parts = payload[: max(line_end, 0)].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = 0
    sep = payload.find(b"\r\n\r\n")
    head = payload[:sep] if sep >= 0 else payload
    from engine.sources.warc import _http_header_value

    ct = _http_header_value(head, b"content-type") or b""
    mime = ct.split(b";")[0].strip().decode("ascii", "replace")
    return status, mime


def _ts14(dt: Optional[_dt.datetime]) -> int:
    """CDX14 timestamp (yyyymmddhhmmss) as int64; 0 for missing dates."""
    if dt is None:
        return 0
    return int(dt.strftime("%Y%m%d%H%M%S"))


def _member_page_records(rec: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Walk EVERY WARC record inside one decompressed gzip member,
    yielding (headers, payload) for page-bearing and ``revisit`` records
    (warcinfo/request/metadata are skipped).  The payload boundary comes
    from the header parser's stream position — not a CRLF re-scan — so
    LF-delimited writers index with the same digests read_warc extracts."""
    from engine.sources.warc import _PAGE_TYPES, _read_headers

    stream = io.BytesIO(rec)
    while True:
        head = _read_headers(stream)
        if head is None:
            return
        _, headers = head
        length = int(headers.get(b"content-length", b"0"))
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated member tail: index what parsed whole
        rtype = headers.get(b"warc-type", b"")
        if headers.get(b"warc-target-uri") is None:
            continue
        if rtype in _PAGE_TYPES or rtype == b"revisit":
            yield headers, payload


def cdx_index_shards(
    paths,
    *,
    filesystem=None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Physical CDX over ``.warc.gz`` shard file(s): one row per
    page-bearing record — (surt, ts, url, status, mime, digest, length,
    offset, body_len, filename) sorted by (surt, ts).  ``ts`` is CDX14;
    ``offset``/``length`` are the record's gzip-member byte range inside
    ``filename`` (basename — shards are resolved against the archive
    root), ``digest`` is md5 of the EXTRACTED body (the logical-index
    definition, so the two indexes agree), ``body_len`` its decompressed
    byte count, status/mime come from the captured HTTP head.
    ``revisit`` records (WARC/1.1 §6.7.2 — the dedup export writes them)
    are indexed too: mime ``warc/revisit``, status 0, digest from the
    WARC-Payload-Digest header, body_len 0 — resolve via
    ``resolve_revisit`` (digest lookup -> the payload-bearing original).
    ``cdx_fetch`` inverts any row back to its record.
    """
    from hashlib import md5

    from engine.sources.warc import (
        _http_body,
        _parse_warc_date,
        _expand_warc_paths,
    )

    empty = pa.table(
        {
            "surt": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "status": pa.array([], pa.int64()),
            "mime": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
            "length": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int64()),
            "body_len": pa.array([], pa.int64()),
            "filename": pa.array([], pa.string()),
        }
    )
    fs, files = _expand_warc_paths(paths, filesystem)
    if not files:
        return ray.data.from_arrow(empty)
    # NOT read_binary_files: it auto-gunzips by extension (no opt-out in
    # ray 2.49 — explicit compression=None means "infer"), and member
    # offsets are positions in the COMPRESSED file.  One path row per file,
    # raw bytes fetched in the task (resilient layer when a filesystem is
    # in play, plain open() locally).
    paths_ds = ray.data.from_items(
        [{"path": f} for f in files],
        override_num_blocks=override_num_blocks or len(files),
    )

    def fetch(t: pa.Table) -> pa.Table:
        ps = t.column("path").to_pylist()
        if fs is not None:
            from engine.sources.resilient import fetch_bytes

            blobs = [fetch_bytes(p, filesystem=fs, attempts=5) for p in ps]
        else:
            blobs = []
            for p in ps:
                with open(p, "rb") as f:
                    blobs.append(f.read())
        return pa.table(
            {
                "bytes": pa.array(blobs, pa.binary()),
                "path": pa.array(ps, pa.string()),
            }
        )

    raw = paths_ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)

    def index_file(t: pa.Table) -> pa.Table:
        cols: dict = {k: [] for k in empty.column_names if k != "surt"}
        for blob, path in zip(
            t.column("bytes").to_pylist(), t.column("path").to_pylist()
        ):
            if blob[:2] != b"\x1f\x8b":
                raise ValueError("cdx_index_shards requires .warc.gz input")
            fname = os.path.basename(path)
            for off, clen, rec in _iter_gzip_members(blob):
                recs = list(_member_page_records(rec))
                if len(recs) > 1:
                    # a whole-file-gzip .warc.gz (e.g. `gzip file.warc`) is
                    # valid for SEQUENTIAL ingest (read_warc) but has no
                    # per-record byte ranges — a CDX over it would lie.
                    raise ValueError(
                        f"{fname}: gzip member at offset {off} holds "
                        f"{len(recs)} page records — CDX random access "
                        "requires the record-per-member layout; use "
                        "read_warc for sequential ingest"
                    )
                if not recs:
                    continue
                headers, payload = recs[0]
                rtype = headers.get(b"warc-type", b"")
                url_b = headers[b"warc-target-uri"]
                if rtype == b"revisit":
                    pd_hdr = headers.get(b"warc-payload-digest", b"")
                    digest = pd_hdr.split(b":")[-1].decode("ascii", "replace")
                    status, mime, body = 0, "warc/revisit", b""
                else:
                    body = (
                        _http_body(payload) if rtype == b"response" else payload
                    )
                    status, mime = (
                        _http_status_mime(payload)
                        if rtype == b"response"
                        else (200, "")
                    )
                    digest = md5(body).hexdigest()
                cols["url"].append(url_b.decode("utf-8", "replace"))
                cols["ts"].append(_ts14(_parse_warc_date(headers.get(b"warc-date"))))
                cols["status"].append(status)
                cols["mime"].append(mime)
                cols["digest"].append(digest)
                cols["length"].append(clen)
                cols["offset"].append(off)
                cols["body_len"].append(len(body))
                cols["filename"].append(fname)
        surts = canonicalize_batch(cols["url"])["surt"]
        out = {"surt": pa.array(surts, pa.string())}
        out.update(
            {k: pa.array(cols[k], empty.schema.field(k).type) for k in cols}
        )
        return pa.table(out).select(empty.column_names)

    return raw.map_batches(
        index_file, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["surt", "ts"])


def cdx_fetch(
    path: str, offset: int, length: int
) -> Tuple[str, Optional[_dt.datetime], Optional[bytes]]:
    """Random access: read exactly [offset, offset+length) of ``path``,
    gunzip the single member, parse the one record -> (url, warc_ts,
    html).  This is the CDX payoff — O(record) I/O out of a terabyte
    archive; on a cluster ``path`` is shared storage and the byte range is
    a ranged GET.  ``revisit`` rows return ``html=None`` (slim records
    carry no payload — resolve through ``resolve_revisit``)."""
    from engine.sources.warc import _http_body, _parse_warc_date

    with open(path, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    recs = list(_member_page_records(gzip.decompress(member)))
    if len(recs) != 1:
        raise ValueError(
            f"CDX range ({offset}, {length}) holds {len(recs)} records, expected 1"
        )
    headers, payload = recs[0]
    rtype = headers.get(b"warc-type", b"")
    url = headers[b"warc-target-uri"].decode("utf-8", "replace")
    ts = _parse_warc_date(headers.get(b"warc-date"))
    if rtype == b"revisit":
        body = None
    elif rtype == b"response":
        body = _http_body(payload)
    else:
        body = payload
    return url, ts, body


def digest_map(index: pa.Table) -> dict:
    """``digest -> (filename, offset, length)`` of the first
    payload-bearing record per digest — the archive's dedup DB, built ONCE
    per collected index so per-record revisit resolution is O(1) (a fresh
    column scan per call would make a full-archive round-trip O(N²))."""
    out: dict = {}
    for f, o, ln, dg, m in zip(
        index.column("filename").to_pylist(),
        index.column("offset").to_pylist(),
        index.column("length").to_pylist(),
        index.column("digest").to_pylist(),
        index.column("mime").to_pylist(),
    ):
        if m != "warc/revisit" and dg not in out:
            out[dg] = (f, int(o), int(ln))
    return out


def resolve_revisit(
    index: pa.Table, row: dict, archive_dir: str, *, dmap: Optional[dict] = None
) -> bytes:
    """Payload for one physical-index row: fetched directly for
    payload-bearing records, resolved THROUGH the index for revisit rows
    (any payload-bearing record with the same digest — revisit resolution
    is digest-keyed, WARC/1.1 §6.7.2; archives keep exactly this mapping
    as their dedup DB).  Driver-side helper over a collected index; pass
    ``dmap=digest_map(index)`` when resolving in a loop."""
    if row["mime"] != "warc/revisit":
        return cdx_fetch(
            os.path.join(archive_dir, row["filename"]),
            int(row["offset"]),
            int(row["length"]),
        )[2]
    if dmap is None:
        dmap = digest_map(index)
    hit = dmap.get(row["digest"])
    if hit is None:
        raise KeyError(f"no payload-bearing record for digest {row['digest']}")
    return cdx_fetch(os.path.join(archive_dir, hit[0]), hit[1], hit[2])[2]


def cdx_lookup(index: pa.Table, url: str) -> pa.Table:
    """All captures of ``url`` from a COLLECTED cdx table, by binary
    search on the sorted surt column (the on-disk CDX access pattern —
    archives memory-map the sorted file and bisect; ``np.searchsorted``
    is that bisect)."""
    key = canonicalize_batch([url])["surt"][0]
    surts = index.column("surt").to_numpy(zero_copy_only=False)
    lo = int(np.searchsorted(surts, key, side="left"))
    hi = int(np.searchsorted(surts, key, side="right"))
    return index.slice(lo, hi - lo)
