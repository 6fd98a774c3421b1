"""robots.txt parsing → politeness rules (north_star: "per-host politeness
priority queue (robots.txt cache + crawl-delay budget)").

The crawl pipeline consumes a politeness TABLE (host, crawl_delay,
max_pages, disallow) — engine.pipelines.crawl_common.load_politeness.  A
real crawler derives that table from fetched robots.txt bodies; this
module is that derivation, as one stateless ``map_batches`` over a
(host, robots_txt) corpus (per-row string parsing, like canonicalize.py —
there is no Arrow kernel for a line-oriented grammar).

Grammar (RFC 9309, the subset a politeness queue needs):
- ``#`` comments stripped; keys case-insensitive; values trimmed.
- Groups start at one or more ``User-agent:`` lines; subsequent
  ``Disallow:`` / ``Crawl-delay:`` lines belong to the group.
- Group selection for our agent: the LONGEST agent token that is a
  case-insensitive prefix of the agent name wins; ``*`` matches with
  length 0 (chosen only when no specific token matches).  ALL groups
  carrying the winning token merge (RFC 9309 §2.2.1).
- Empty ``Disallow:`` means allow-all (contributes no prefix).
- ``Crawl-delay`` is seconds (float); emitted as floor-milliseconds
  int64 (fixed-point, SQL-exact); -1 when absent or unparsable.

A host with NO matching group yields (delay=-1, disallow='') — the
crawler's defaults apply (crawl_common.host_rules).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data


def parse_robots_txt(body: str, user_agent: str = "raycrawler") -> Tuple[int, Tuple[str, ...]]:
    """(crawl_delay_ms, disallow prefixes) for ``user_agent``; see module
    docstring for the grammar and precedence rules."""
    ua = user_agent.lower()
    # groups: list of (agent_tokens, disallows, delay_ms)
    groups: List[Tuple[List[str], List[str], Optional[int]]] = []
    cur_agents: List[str] = []
    cur_dis: List[str] = []
    cur_delay: Optional[int] = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay = [], [], None
        in_group_body = False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            if not cur_agents:
                continue  # directive before any group: ignored
            in_group_body = True
            if key == "disallow" and val:
                cur_dis.append(val)
            elif key == "crawl-delay":
                try:
                    ms = float(val) * 1000.0
                    # web-sourced values: inf/nan/overflow all mean
                    # "unparsable", never a crash (clamped to 30 days)
                    if ms == ms and 0.0 <= ms <= 2_592_000_000.0:
                        cur_delay = int(ms)
                except (ValueError, OverflowError):
                    pass
        # unknown keys: ignored, but they do not end the group
    flush()

    # longest matching token; '*' has length 0
    best_len = -1
    for agents, _, _ in groups:
        for a in agents:
            if a == "*":
                best_len = max(best_len, 0)
            elif a and ua.startswith(a):
                best_len = max(best_len, len(a))
    if best_len < 0:
        return -1, ()
    dis: List[str] = []
    delay: Optional[int] = None
    for agents, d, cd in groups:
        match = any(
            (a == "*" and best_len == 0)
            or (a != "*" and ua.startswith(a) and len(a) == best_len)
            for a in agents
        )
        if match:
            dis.extend(d)
            if cd is not None and delay is None:
                delay = cd
    return (delay if delay is not None else -1), tuple(dis)


def robots_politeness(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "raycrawler",
) -> "ray.data.Dataset":
    """(host, crawl_delay_ms, disallow) per input row — one stateless
    map_batches; at 10^10-URL scale the robots corpus is hosts-sized
    (~10^7 rows), a rounding error next to the frontier."""

    def parse(t: pa.Table) -> pa.Table:
        delays: List[int] = []
        dis: List[str] = []
        for body in t.column(body_col).to_pylist():
            d_ms, prefixes = parse_robots_txt(body or "", user_agent)
            delays.append(d_ms)
            dis.append(",".join(prefixes))
        return pa.table(
            {
                host_col: t.column(host_col),
                "crawl_delay_ms": pa.array(delays, pa.int64()),
                "disallow": pa.array(dis, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


def write_politeness_parquet(
    parsed: "ray.data.Dataset",
    path: str,
    *,
    default_crawl_delay: float = 5.0,
    default_max_pages: int = 1000,
) -> None:
    """Materialize a parsed robots table into the politeness-parquet schema
    ``load_politeness`` consumes (crawl_delay seconds float, max_pages,
    disallow CSV) — the bridge from fetched robots.txt to the crawl
    pipeline.  Small (hosts-sized) by construction, single file."""
    import pyarrow.parquet as pq

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(parsed, required_col="host")
    if not blocks:
        t = pa.table(
            {
                "host": pa.array([], pa.string()),
                "crawl_delay_ms": pa.array([], pa.int64()),
                "disallow": pa.array([], pa.string()),
            }
        )
    else:
        t = pa.concat_tables(blocks, promote_options="default")
    delays = t.column("crawl_delay_ms").to_numpy(zero_copy_only=False)
    secs = np.where(delays >= 0, delays / 1000.0, default_crawl_delay)
    out = pa.table(
        {
            "host": t.column("host"),
            "crawl_delay": pa.array(secs, pa.float64()),
            "max_pages": pa.array(
                np.full(t.num_rows, default_max_pages, dtype=np.int64), pa.int64()
            ),
            "disallow": t.column("disallow"),
        }
    )
    pq.write_table(out, path)


def parse_robots_sitemaps(body: str) -> Tuple[str, ...]:
    """``Sitemap:`` directives from a robots.txt body, in file order with
    first-wins dedup.

    Per sitemaps.org / RFC 9309 §2.3 these are GROUP-INDEPENDENT: a
    Sitemap line counts wherever it appears, including before any
    User-agent group.  Inline comments are stripped like every other
    line; values are kept verbatim (the spec requires absolute URLs but
    validation belongs to the fetch stage, not the parser)."""
    out: List[str] = []
    seen = set()
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if val and val not in seen:
            seen.add(val)
            out.append(val)
    return tuple(out)


def robots_sitemaps(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> "ray.data.Dataset":
    """Flat (host, sitemap_url, ord) rows from a robots.txt corpus — the
    discovery bridge from robots fetches into the sitemap parser
    (stages.sitemaps) and on into crawl seeds.  Hosts-sized input, one
    stateless map_batches."""

    def parse(t: pa.Table) -> pa.Table:
        hosts: List[str] = []
        urls: List[str] = []
        ords: List[int] = []
        for h, body in zip(
            t.column(host_col).to_pylist(), t.column(body_col).to_pylist()
        ):
            for i, u in enumerate(parse_robots_sitemaps(body or "")):
                hosts.append(h)
                urls.append(u)
                ords.append(i)
        return pa.table(
            {
                host_col: pa.array(hosts, pa.string()),
                "sitemap_url": pa.array(urls, pa.string()),
                "ord": pa.array(ords, pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# RFC 9309 full path matching (Allow + wildcards + $ anchor)
# ---------------------------------------------------------------------------
#
# The politeness pipeline above uses the prefix-Disallow subset (matching
# the crawl oracle's pinned semantics).  Real-web robots.txt also carries
# ``Allow:`` rules, ``*`` wildcards, and the ``$`` end anchor; RFC 9309
# §2.2.2 resolves conflicts by MOST-SPECIFIC MATCH — the rule with the
# longest pattern (in octets) wins, and on an exact length tie the Allow
# rule wins.  No rule matching means allowed.  These functions implement
# that full matcher WITHOUT changing parse_robots_txt (whose behavior is
# pinned against the crawl conformance oracle).

import re as _re


def parse_robots_rules(
    body: str, user_agent: str = "raycrawler"
) -> Tuple[Tuple[bool, str], ...]:
    """Ordered ``(is_allow, pattern)`` rules of the winning agent group(s)
    — same group grammar and longest-agent-token selection as
    parse_robots_txt, but keeping Allow AND Disallow patterns verbatim
    (wildcards intact) for the RFC 9309 matcher."""
    ua = user_agent.lower()
    groups: List[Tuple[List[str], List[Tuple[bool, str]]]] = []
    cur_agents: List[str] = []
    cur_rules: List[Tuple[bool, str]] = []
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []
        in_group_body = False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            if not cur_agents:
                continue
            in_group_body = True
            if key in ("disallow", "allow") and val:
                cur_rules.append((key == "allow", val))
    flush()

    best_len = -1
    for agents, _ in groups:
        for a in agents:
            if a == "*":
                best_len = max(best_len, 0)
            elif a and ua.startswith(a):
                best_len = max(best_len, len(a))
    if best_len < 0:
        return ()
    rules: List[Tuple[bool, str]] = []
    for agents, r in groups:
        if any(
            (a == "*" and best_len == 0)
            or (a != "*" and ua.startswith(a) and len(a) == best_len)
            for a in agents
        ):
            rules.extend(r)
    return tuple(rules)


def _rfc9309_regex(pattern: str) -> str:
    """Pattern -> anchored regex: ``*`` matches any run, trailing ``$``
    anchors the end, otherwise the pattern matches a PREFIX of the path."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(_re.escape(p) for p in body.split("*"))
    return rx + "$" if anchored else rx


def rfc9309_decision(
    rules: Tuple[Tuple[bool, str], ...], path: str
) -> Tuple[bool, int]:
    """Scalar reference matcher: (allowed, winning_rule_len).  Longest
    matching pattern wins; Allow wins exact-length ties; no match ->
    (True, 0)."""
    best_len, allowed = 0, True
    for is_allow, pattern in rules:
        if not pattern:
            continue
        if _re.match(_rfc9309_regex(pattern), path):
            plen = len(pattern)
            if plen > best_len:
                best_len, allowed = plen, is_allow
            elif plen == best_len and best_len > 0:
                allowed = allowed or is_allow
    return allowed, best_len


def rfc9309_match(
    ds: ray.data.Dataset,
    *,
    body_col: str = "robots_txt",
    path_col: str = "path",
    id_col: str = "doc_id",
    user_agent: str = "raycrawler",
) -> ray.data.Dataset:
    """Distributed RFC 9309 decision table: for each (robots body, path)
    row emit ``(id, allowed, rule_len)``.

    Shape: one map_batches pass, no shuffle.  Bodies on a crawl corpus
    are HIGH-REPEAT (one per host, many paths) — the kernel dictionary-
    groups the batch by body, parses + compiles each distinct body ONCE,
    then evaluates every rule as one vectorized
    ``pc.match_substring_regex`` over that group's path slice
    (CLAUDE.md's dictionary-encode device); the per-rule fold keeps
    best-length/allow vectors in numpy.  Per-row Python touches only
    distinct bodies, never paths."""

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "allowed": pa.array([], pa.int64()),
                "rule_len": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.dictionary_encode(t.column(body_col)).combine_chunks()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
        bodies = enc.dictionary.to_pylist()
        paths = t.column(path_col)
        n = t.num_rows
        allowed = np.ones(n, bool)
        rule_len = np.zeros(n, np.int64)
        for code, body in enumerate(bodies):
            sel = codes == code
            sub = paths.filter(pa.array(sel))
            best = np.zeros(int(sel.sum()), np.int64)
            allow = np.ones(int(sel.sum()), bool)
            for is_allow, pattern in parse_robots_rules(body, user_agent):
                if not pattern:
                    continue
                m = np.asarray(
                    pc.match_substring_regex(
                        sub, pattern=_rfc9309_regex(pattern)
                    ).to_numpy(zero_copy_only=False),
                    bool,
                )
                plen = len(pattern)
                gt = m & (plen > best)
                eq = m & (plen == best) & (best > 0)
                allow[gt] = is_allow
                if is_allow:
                    allow[eq] = True
                best[gt] = plen
            allowed[sel] = allow
            rule_len[sel] = best
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "allowed": pa.array(allowed.astype(np.int64), pa.int64()),
                "rule_len": pa.array(rule_len, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
