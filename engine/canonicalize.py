"""URL canonicalization + SURT normalization (north_star requirement).

New functionality relative to the reference (which only ``urlparse``-s the
target URI, /root/reference/warc_indexer/indexer/process.py:254): the crawl
frontier needs one canonical spelling per URL so the URL-seen set and
politeness grouping are stable.  Runs as a stateless
``map_batches(batch_format="pyarrow", zero_copy_batch=True)`` stage; the
per-row work is compiled-regex + string ops (no Arrow URL kernels exist).

Canonical form:
- scheme + host lowercased; default ports (:80 http, :443 https) dropped;
- fragment dropped; trailing "?" dropped; duplicate slashes in the path
  collapsed; "."/".." path segments resolved; empty path -> "/";
- query string kept byte-for-byte otherwise (order is semantic);
- percent-encodings of unreserved characters decoded (%41 -> A), others
  uppercased (%3a -> %3A).

SURT (Sort-friendly URI Reordering Transform): "org,example)/path?query" --
host labels reversed and comma-joined, scheme and leading "www." dropped.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple
from urllib.parse import urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

from engine.ids import url_hash64

_PCT = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_MULTI_SLASH = re.compile(r"/{2,}")
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def _norm_pct(s: str) -> str:
    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch == ".":
            # RFC 3986: %2E is a LITERAL dot — decoding it before
            # dot-segment resolution would conflate '/a/%2E%2E/b' with
            # '/a/../b' (distinct resources) and break idempotence
            return "%2E"
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT.sub(sub, s)


def _resolve_dots(path: str) -> str:
    out: List[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    p = "/".join(out)
    if not p.startswith("/"):
        p = "/" + p
    return p


def canonicalize_url(url: str) -> Optional[str]:
    """Canonical spelling of an absolute http(s) URL; None if unusable."""
    if not url:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORT[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    if not netloc:
        return None
    path = _norm_pct(_MULTI_SLASH.sub("/", parts.path)) or "/"
    path = _resolve_dots(path)
    query = _norm_pct(parts.query)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Lowercased hostname (no port) of an already-canonical URL."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def surt(url: str) -> str:
    """SURT form of a canonical URL: 'org,example)/path?query'.

    Non-default ports are retained ('org,example:8080)/...') — dropping
    them would merge distinct origins into one SURT key.
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return ""
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split(".")))
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None:
        rev += f":{port}"
    tail = parts.path or "/"
    if parts.query:
        tail += "?" + parts.query
    return f"{rev}){tail}"


def canonicalize_batch(urls: Iterable[str]) -> Dict[str, np.ndarray]:
    """Vector form: canonical url / host / surt / url_hash columns.

    Rows whose URL is unusable get empty-string url and host (callers filter
    ``url != ''``).
    """
    canon: List[str] = []
    hosts: List[str] = []
    surts: List[str] = []
    for u in urls:
        c = canonicalize_url(u)
        if c is None:
            canon.append("")
            hosts.append("")
            surts.append("")
        else:
            canon.append(c)
            hosts.append(host_of(c))
            surts.append(surt(c))
    return {
        "url": np.array(canon, dtype=object),
        "host": np.array(hosts, dtype=object),
        "surt": np.array(surts, dtype=object),
        "url_hash": url_hash64(canon),
    }
