"""Frontier URL hygiene: vectorized pre-enqueue URL filtering.

The reference scheduler only ``urlparse``-s target URIs
(/root/reference/warc_indexer/indexer/process.py:254); a real crawl
frontier at 10^10-URL scale needs a cheap, stateless hygiene gate BEFORE
URLs ever reach the seen-set / politeness machinery (every dropped URL
here saves a cuckoo-shard RPC and a groupby(host) row downstream).  The
rule set is the standard crawler one (scheme allow-list, host blocklist,
length / path-depth caps, session-id query params, query-parameter
blowup — the classic crawler-trap signals).

Shape: ONE stateless ``map_batches(batch_format="pyarrow",
zero_copy_batch=True)`` — every rule is an Arrow RE2 / string kernel,
zero per-row Python.  The blocklist is a broadcast value set
(``pc.is_in`` over a ``ray.put``-shipped Arrow array in the real
pipeline; passed by value here since rule configs are driver-sized),
NOT a join — UT1-style blocklists are a few million hosts, far below
any shuffle-worthy size.

First-match-wins rule order (mirrors extract.py's error-policy
enumeration so the status column is deterministic):
  scheme -> blocked_host -> too_long -> too_deep -> session_id ->
  param_blowup -> ok.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SESSION_RE = r"[?&](sid|sessionid|phpsessid|jsessionid|cfid|cftoken)="
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"
_SCHEME_RE = r"^https?://"


def url_filter(
    ds: "ray.data.Dataset",
    *,
    url_col: str = "url",
    blocked_hosts: Optional[Iterable[str]] = None,
    max_len: int = 256,
    max_depth: int = 8,
    max_params: int = 4,
) -> "ray.data.Dataset":
    """Append a ``status`` column: ``'ok'`` or the first failing rule.

    Rows are NOT dropped — emitting the verdict keeps the operator
    SQL-verifiable end-to-end and lets callers choose
    ``filter(status == 'ok')`` (map-side, no shuffle) or route rejects
    to a lineage sink.  ``too_deep`` counts path segments as
    ``count('/') - 2`` (scheme ``://`` contributes two), exact for
    fragment-free canonical URLs (canonicalize.py strips fragments).
    """
    blocked = pa.array(sorted(set(blocked_hosts or ())), pa.string())

    def verdict(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        if urls.num_chunks != 1:
            urls = urls.combine_chunks()
        host = pc.struct_field(pc.extract_regex(urls, pattern=_HOST_RE), "host")

        def _b(mask):
            # null url -> null kernel results; a null URL fails 'scheme'
            # (first rule), so null masks resolve to False everywhere else
            return pc.fill_null(mask, False)

        # extract_regex yields null on non-match; is_in(null)=false, fine.
        bad_scheme = pc.fill_null(
            pc.invert(pc.match_substring_regex(urls, pattern=_SCHEME_RE)), True
        )
        bad_host = _b(pc.is_in(host, value_set=blocked))
        too_long = _b(pc.greater(pc.utf8_length(urls), max_len))
        too_deep = _b(
            pc.greater(pc.count_substring(urls, pattern="/"), max_depth + 2)
        )
        session = _b(
            pc.match_substring_regex(urls, pattern=_SESSION_RE, ignore_case=True)
        )
        blowup = _b(pc.greater(pc.count_substring(urls, pattern="="), max_params))

        status = pa.array(["ok"] * len(urls), pa.string())
        # reverse order so earlier rules overwrite later ones (first wins)
        for mask, name in (
            (blowup, "param_blowup"),
            (session, "session_id"),
            (too_deep, "too_deep"),
            (too_long, "too_long"),
            (bad_host, "blocked_host"),
            (bad_scheme, "scheme"),
        ):
            status = pc.if_else(mask, pa.scalar(name, pa.string()), status)
        return t.append_column("status", status)

    return ds.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)
