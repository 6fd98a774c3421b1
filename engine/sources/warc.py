"""WARC container ingest — third source format alongside Parquet/JSONL.

Pure-Python reader for the WARC/1.0–1.1 container format (ISO 28500) the
reference consumes via FastWARC (/root/reference/warc_indexer/indexer/
warcio.py:84-198, ``ArchiveIterator``); fastwarc is a C extension and not
installed here, and the format itself is simple: each record is a CRLF
header block, ``Content-Length`` payload bytes, then a CRLF CRLF
separator.  Gzip ``.warc.gz`` files store one gzip MEMBER per record;
stdlib ``gzip`` decodes concatenated members transparently, so one
sequential decode pass per file yields the record stream.

Semantics mirrored from the reference reader:

- only ``response`` / ``resource`` / ``conversion`` records yield pages
  (``warcio.py`` passes ``record_types`` filtering to FastWARC; the
  indexer consumes response-ish records only) — ``warcinfo``,
  ``request`` and ``metadata`` records are skipped;
- ``response`` payloads are raw captured HTTP: headers are split at the
  first blank line and the body (de-chunked if ``Transfer-Encoding:
  chunked``) becomes ``html``;
- ``max_content_length``: overly long records keep their METADATA row but
  drop the payload (the reference's ``overly_long_keep_meta`` path,
  warcio.py:149-153 — ``record.reader.consume()``), so downstream skip
  accounting still sees the record;
- ``WARC-Target-URI`` -> url, ``WARC-Date`` (ISO-8601) -> naive-UTC
  ``warc_ts`` (the clip/normalize policy lives downstream in
  ids.clip_warc_date, same as the Parquet path).

Scale shape: WARC is not block-splittable without an external index (a
gzip member stream has no random access), so parallelism is PER FILE —
the standard Common Crawl layout ships ~1 GB files by the thousand, which
keys a cluster fine.  ``read_warc`` lists files and parses each in its
own ``map_batches`` task via ``ray.data.read_binary_files``; one file =
one block in memory, so target file sizes must fit a worker heap (true
for CC's 1 GB gzipped members).  The output is the canonical PAGES schema
— every downstream pipeline (extraction, bucketize, crawl-and-index)
consumes it unchanged.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
import os
from typing import Dict, Iterator, List, Optional, Tuple

import pyarrow as pa
import ray.data

from engine.schema import PAGES

_PAGE_TYPES = frozenset((b"response", b"resource", b"conversion"))


def _read_headers(stream) -> Optional[Tuple[bytes, Dict[bytes, bytes]]]:
    """Read one CRLF header block: (version line, {lower(name): value}).
    Returns None at end of stream.  Skips stray blank lines between
    records (writers vary in separator count)."""
    line = stream.readline()
    while line in (b"\r\n", b"\n"):
        line = stream.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    version = line.strip()
    headers: Dict[bytes, bytes] = {}
    last = None
    while True:
        line = stream.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += b" " + line.strip()  # RFC continuation line
            continue
        name, _, value = line.partition(b":")
        last = name.strip().lower()
        headers[last] = value.strip()
    return version, headers


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body; on any framing
    error return the raw bytes (captured streams are sometimes truncated
    — the reference tolerates and indexes what it can)."""
    out = []
    buf = io.BytesIO(body)
    try:
        while True:
            size_line = buf.readline()
            if not size_line:
                break
            size = int(size_line.split(b";")[0].strip() or b"0", 16)
            if size == 0:
                break
            chunk = buf.read(size)
            if len(chunk) < size:
                return body
            out.append(chunk)
            buf.readline()  # trailing CRLF
    except ValueError:
        return body
    return b"".join(out)


def _http_header_value(head: bytes, name: bytes) -> Optional[bytes]:
    """Value of the named HTTP header (lowercased), or None.  Parses
    header LINES — a substring scan would false-positive on unrelated
    headers whose value happens to contain the probed word."""
    for line in head.split(b"\n"):
        n, sep, v = line.partition(b":")
        if sep and n.strip().lower() == name:
            return v.strip().lower()
    return None


def _http_body(payload: bytes) -> bytes:
    """Split a captured HTTP response at the first blank line; de-chunk if
    the Transfer-Encoding header says so.  Payloads without an HTTP status
    line (rare non-HTTP captures) pass through unchanged."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        if sep < 0:
            return payload
        head, body = payload[:sep], payload[sep + 2 :]
    else:
        head, body = payload[:sep], payload[sep + 4 :]
    te = _http_header_value(head, b"transfer-encoding")
    if te is not None and b"chunked" in te:
        body = _dechunk(body)
    return body


def _parse_warc_date(v: Optional[bytes]):
    if not v:
        return None
    s = v.decode("ascii", "replace").strip()
    try:
        dt = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return dt


def iter_warc_records(
    raw: bytes, *, max_content_length: Optional[int] = None
) -> Iterator[Tuple[str, Optional[_dt.datetime], Optional[bytes]]]:
    """Yield (url, warc_ts, html-or-None) for every page-bearing record in
    one WARC file's bytes (gzip-member files auto-detected by magic)."""
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    while True:
        head = _read_headers(stream)
        if head is None:
            return
        _, headers = head
        length = int(headers.get(b"content-length", b"0"))
        rtype = headers.get(b"warc-type", b"")
        url = headers.get(b"warc-target-uri")
        wanted = rtype in _PAGE_TYPES and url is not None
        if not wanted:
            stream.seek(length, io.SEEK_CUR) if stream.seekable() else stream.read(length)
            continue
        if max_content_length is not None and length > max_content_length:
            # reference overly_long_keep_meta: keep the row, drop the payload
            stream.read(length)
            yield url.decode("utf-8", "replace"), _parse_warc_date(
                headers.get(b"warc-date")
            ), None
            continue
        payload = stream.read(length)
        if len(payload) < length:
            return  # truncated final record: index what we could
        yield url.decode("utf-8", "replace"), _parse_warc_date(
            headers.get(b"warc-date")
        ), _http_body(payload) if rtype == b"response" else payload


def _skip_payload(stream, length: int) -> int:
    """Discard ``length`` payload bytes in bounded chunks; returns bytes
    actually consumed (< length at a truncated final record)."""
    remaining = length
    while remaining > 0:
        chunk = stream.read(min(1 << 20, remaining))
        if not chunk:
            break
        remaining -= len(chunk)
    return length - remaining


def count_page_records_bytes(
    raw: bytes, *, max_content_length: Optional[int] = None
) -> int:
    """Count the page-bearing records in one WARC file's bytes WITHOUT
    materializing payloads — the independent input-side count for the
    resume manifest's rows_in/rows_out accounting (WARC files have no
    Parquet-style row-count footer).  Mirrors ``iter_warc_records``'s
    record policy exactly: response/resource/conversion records with a
    target URI count; overly-long records count even when truncated
    (their metadata row is yielded regardless); a truncated final normal
    record does not."""
    if raw[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    n = 0
    while True:
        head = _read_headers(stream)
        if head is None:
            return n
        _, headers = head
        length = int(headers.get(b"content-length", b"0"))
        wanted = (
            headers.get(b"warc-type", b"") in _PAGE_TYPES
            and headers.get(b"warc-target-uri") is not None
        )
        overlong = max_content_length is not None and length > max_content_length
        full = _skip_payload(stream, length) == length
        if wanted and (full or overlong):
            n += 1
        elif wanted and not full:
            return n  # truncated final normal record: not yielded, not counted
        elif not full:
            return n  # truncated unwanted record ends the stream


def count_page_records(
    paths,
    *,
    max_content_length: Optional[int] = None,
    filesystem=None,
    retry_attempts: int = 5,
) -> int:
    """Distributed page-record count over WARC file(s): one decompress +
    header-walk pass per file (payloads skipped), per-file parallel.  Used
    by the resumable index pipeline so a WARC partition's manifest rows_in
    is measured INDEPENDENTLY of the extraction output (the same integrity
    check the Parquet path gets from row-count footers).  Remote paths /
    explicit filesystems fetch through the same resilient layer as
    ``read_warc`` (retries + offset resume), so manifest accounting and
    data reads share one transport policy."""
    fs, files = _expand_warc_paths(paths, filesystem)
    if not files:
        return 0
    raw = _raw_bytes(
        files, filesystem=fs, retry_attempts=retry_attempts,
        override_num_blocks=None,
    )

    def cnt(t: pa.Table) -> pa.Table:
        total = sum(
            count_page_records_bytes(b, max_content_length=max_content_length)
            for b in t.column("bytes").to_pylist()
        )
        return pa.table({"n": pa.array([total], pa.int64())})

    counts = raw.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)
    return int(
        sum(
            t.column("n").to_pylist()[0]
            for t in ray.get(counts.to_arrow_refs())
            if isinstance(t, pa.Table) and t.num_rows and "n" in t.column_names
        )
    )


def _list_fs_warcs(fs, root: str) -> List[str]:
    """Recursively list ``.warc``/``.warc.gz`` files under ``root`` on a
    pyarrow-style filesystem, as fs-native paths in sorted (deterministic
    shard) order."""
    from pyarrow import fs as pafs

    infos = fs.get_file_info(
        pafs.FileSelector(root.rstrip("/"), recursive=True)
    )
    return sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.File
        and i.path.endswith((".warc", ".warc.gz"))
    )


def _expand_warc_paths(paths, filesystem=None):
    """File / dir / remote-prefix / list → (filesystem-or-None, explicit
    WARC file list) — the single expansion rule shared by read_warc and
    count_page_records.

    - explicit ``filesystem``: every path is fs-native; non-``.warc``
      paths are listed RECURSIVELY through that same filesystem (listing
      and fetching can never use different stores/credentials);
    - ``scheme://`` paths: resolved ONCE to (filesystem, native path) via
      ``resolve_filesystem`` — prefixes are listed through it and the
      returned fs is reused for every fetch, so URI authorities
      (``hdfs://namenode/…``) survive (no URI reconstruction).  One call
      addresses ONE remote store; mixing schemes/stores or remote+local
      in a single call raises — call per store and ``union``;
    - bare local paths: directories expand recursively (same rule as
      remote prefixes), fs stays None (read_binary_files fast path).
    """
    from engine.sources.resilient import resolve_filesystem

    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    paths = [str(p) for p in paths]
    files: List[str] = []
    if filesystem is not None:
        for p in paths:
            if p.endswith((".warc", ".warc.gz")):
                files.append(p)
            else:
                files.extend(_list_fs_warcs(filesystem, p))
        return filesystem, files
    remote = [p for p in paths if "://" in p]
    if remote and len(remote) != len(paths):
        raise ValueError(
            "read_warc: mixing remote and local paths in one call is not "
            "supported — call once per store and union the datasets"
        )
    if remote:
        fs = None
        for p in paths:
            p_fs, rel = resolve_filesystem(p)
            if fs is None:
                fs = p_fs
            elif type(p_fs) is not type(fs):
                raise ValueError(
                    "read_warc: one call addresses one remote store; got "
                    f"mixed filesystems {type(fs).__name__} / "
                    f"{type(p_fs).__name__}"
                )
            if rel.endswith((".warc", ".warc.gz")):
                files.append(rel)
            else:
                files.extend(_list_fs_warcs(fs, rel))
        return fs, files
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, names in sorted(os.walk(p)):
                dirs.sort()
                files.extend(
                    os.path.join(root, f)
                    for f in sorted(names)
                    if f.endswith((".warc", ".warc.gz"))
                )
        else:
            files.append(p)
    return None, files


def _raw_bytes(
    files: List[str],
    *,
    filesystem,
    retry_attempts: int,
    override_num_blocks: Optional[int],
) -> ray.data.Dataset:
    """Dataset with one ``bytes`` row per file.  An explicit filesystem
    (incl. one resolved from remote URIs by _expand_warc_paths) goes
    through the resilient fetch layer; plain local files use
    ``read_binary_files`` (Ray's task retries suffice when re-reading a
    local file is cheap)."""
    if filesystem is not None:
        from engine.sources.resilient import fetch_bytes

        paths_ds = ray.data.from_items(
            [{"path": f} for f in files],
            override_num_blocks=override_num_blocks or len(files),
        )

        def fetch(t: pa.Table) -> pa.Table:
            blobs = [
                fetch_bytes(p, filesystem=filesystem, attempts=retry_attempts)
                for p in t.column("path").to_pylist()
            ]
            return pa.table({"bytes": pa.array(blobs, pa.binary())})

        return paths_ds.map_batches(
            fetch, batch_format="pyarrow", zero_copy_batch=True
        )
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_binary_files(files, **kwargs)


def read_warc(
    paths,
    *,
    columns: Optional[List[str]] = None,
    max_content_length: Optional[int] = None,
    override_num_blocks: Optional[int] = None,
    filesystem=None,
    retry_attempts: int = 5,
) -> ray.data.Dataset:
    """Read ``.warc`` / ``.warc.gz`` file(s) into the canonical PAGES
    schema (url, warc_ts, html, text, lang) — text/lang are null (the
    extraction stage computes them).  ``paths`` is a file, directory, or
    list thereof; parallelism is per file (module docstring).

    Remote paths (``s3://…``) — or any call passing ``filesystem`` — fetch
    through ``engine.sources.resilient.fetch_bytes``: bounded retries with
    exponential backoff and byte-offset resume on mid-stream failures,
    mirroring the reference's S3 downloader + resume-position semantics
    (warcio.py:164-230).  ``retry_attempts`` bounds CONSECUTIVE
    no-progress failures per file.  Local paths without an explicit
    filesystem use ``read_binary_files`` (Ray's own task retries suffice
    when re-reading a local file is cheap).  Directories and remote
    PREFIXES (any path not ending in .warc/.warc.gz) expand RECURSIVELY —
    through the explicit/resolved filesystem when there is one, else
    ``os.walk`` — with one consistent rule across local and remote
    spellings (see _expand_warc_paths)."""
    fs, files = _expand_warc_paths(paths, filesystem)
    if not files:
        return ray.data.from_arrow(PAGES.empty_table())
    raw = _raw_bytes(
        files, filesystem=fs, retry_attempts=retry_attempts,
        override_num_blocks=override_num_blocks,
    )

    def parse(t: pa.Table) -> pa.Table:
        urls: List[str] = []
        ts: List = []
        htmls: List[Optional[bytes]] = []
        for blob in t.column("bytes").to_pylist():
            for u, d, h in iter_warc_records(
                blob, max_content_length=max_content_length
            ):
                urls.append(u)
                ts.append(d)
                htmls.append(h)
        n = len(urls)
        out = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([None] * n, pa.string()),
                "lang": pa.array([None] * n, pa.string()),
            },
            schema=PAGES,
        )
        return out.select(columns) if columns else out

    return raw.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_warc(
    rows: Iterator[Tuple[str, Optional[_dt.datetime], bytes]],
    path: str,
    *,
    as_http_response: bool = True,
) -> int:
    """Write (url, warc_ts, html) rows as a ``.warc.gz`` file (one gzip
    member per record, the Common Crawl layout).  Test/fixture utility —
    the engine's OUTPUT format is Parquet; this exists so round-trip tests
    and users migrating fixture WARCs have a writer.  Returns record
    count."""
    n = 0
    with open(path, "wb") as out:
        for url, ts, html in rows:
            if as_http_response:
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b"Content-Length: %d\r\n\r\n" % len(html)
                    + html
                )
                rtype = b"response"
                ctype = b"application/http; msgtype=response"
            else:
                payload = html
                rtype = b"resource"
                ctype = b"text/html"
            date = (ts or _dt.datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
            rec = (
                b"WARC/1.0\r\n"
                + b"WARC-Type: " + rtype + b"\r\n"
                + b"WARC-Target-URI: " + url.encode() + b"\r\n"
                + b"WARC-Date: " + date.encode() + b"\r\n"
                + b"WARC-Record-ID: <urn:test:%d>\r\n" % n
                + b"Content-Type: " + ctype + b"\r\n"
                + b"Content-Length: %d\r\n\r\n" % len(payload)
                + payload
                + b"\r\n\r\n"
            )
            out.write(gzip.compress(rec))
            n += 1
    return n
