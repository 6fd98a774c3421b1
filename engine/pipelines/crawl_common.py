"""Shared crawl semantics: config, politeness rules, link discovery.

Both the distributed crawl (engine.pipelines.crawl) and the single-threaded
scheduler oracle (engine.pipelines.crawl_oracle) import from here, so the
per-row semantics (canonicalization, robots filtering, priority, budgets)
are defined exactly once.  Conformance (north_rule: identical crawl ordering
+ URL-seen set) then reduces to the two control flows agreeing.

Crawl model (new functionality; the reference indexer has no frontier —
SURVEY.md §2.4 ST5/ST6, §2.6 A5/A6):

- A *wave* is the batch unit replacing the reference's 30 s Flink windows
  (index.py:171): each wave, every host may fetch up to
  ``floor(wave_seconds / crawl_delay)`` URLs (>=1), subject to its total
  ``max_pages`` budget.
- Within a host, candidates are ordered by (priority desc, url asc);
  priority = 1 / (1 + depth), so the order is BFS-ish with lexicographic
  tie-break — a total order, required for N-vs-4N determinism
  (SURVEY.md §7.3).
- Global crawl order within a wave sorts selected URLs by
  (priority desc, url asc); ``seq`` numbers continue across waves.
- robots.txt stand-in: the politeness table's ``disallow`` column holds
  comma-separated path prefixes; blocked URLs are marked seen but never
  enqueued (checked at discovery AND at seed load).
- URL-seen set: a URL is inserted when first *enqueued* (not fetched);
  membership answers use the cuckoo wave-commit protocol
  (engine.state.cuckoo) so parallel and serial runs agree bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple
from urllib.parse import urljoin

import pyarrow.parquet as pq

from engine.canonicalize import canonicalize_url, host_of, surt
from engine.html_extract import HTMLTree, get_links


@dataclass(frozen=True)
class CrawlConfig:
    wave_seconds: float = 30.0
    default_crawl_delay: float = 5.0
    default_max_pages: int = 1000
    max_waves: int = 20
    num_shards: int = 16
    shard_capacity: int = 1 << 16
    max_depth: int = 64
    # Below this row count, per-wave selection / link-dedup run on the
    # driver (same functions, same total order — identical results, tested)
    # instead of paying a distributed-execution round trip.  Production
    # waves (10^6+) always take the distributed path; set 0 to force it.
    driver_small_wave_threshold: int = 100_000
    # Distributed selection salts a mega-host's candidates into this many
    # (host, salt) sub-groups for a stage-1 partial top-k, bounding any one
    # task's group to frontier(host)/n_salts (skew control, north_rule).
    n_selection_salts: int = 16
    # Links layouts at or below this on-disk size are materialized into the
    # object store ONCE and filtered per wave (the graph is static); larger
    # layouts keep pruned per-bucket reads every wave (the 10^10-URL path).
    links_cache_bytes: int = 4 << 30
    # Frontier priority at enqueue: "depth" (default — the reference-style
    # 1/(1+depth) BFS bias) or "inlinks" (adds a 0.01 bonus per discovering
    # emission in the wave that first enqueued the URL, capped at 9 —
    # heavily-cited URLs jump the within-depth queue, and the <= 0.09 bonus
    # can outrank one depth level only at depth >= 2).  Priority is
    # assigned ONCE, at first enqueue; later re-discoveries are dropped by
    # the seen set on both the engine and oracle sides.
    priority_mode: str = "depth"
    # Politeness/budget unit: "host" (default — the reference's per-host
    # semantics) or "domain" (registrable domain / eTLD+1 via
    # engine.stages.domains): one crawl-delay budget, max_pages counter and
    # disallow rule-set per OWNER, folding subdomain fan-out (cdn.x.com,
    # www.x.com) into a single queue.  Under "domain" the politeness
    # parquet's ``host`` keys must be registrable domains.
    politeness_scope: str = "host"


@dataclass
class HostRules:
    crawl_delay: float
    max_pages: int
    disallow: Tuple[str, ...] = ()


def load_politeness(path: Optional[str], cfg: CrawlConfig) -> Dict[str, HostRules]:
    rules: Dict[str, HostRules] = {}
    if path is None:
        return rules
    t = pq.read_table(path)
    for h, d, m, dis in zip(
        t.column("host").to_pylist(),
        t.column("crawl_delay").to_pylist(),
        t.column("max_pages").to_pylist(),
        t.column("disallow").to_pylist() if "disallow" in t.column_names else [None] * t.num_rows,
    ):
        prefixes = tuple(p.strip() for p in dis.split(",") if p.strip()) if dis else ()
        rules[h] = HostRules(
            crawl_delay=float(d) if d is not None else cfg.default_crawl_delay,
            max_pages=int(m) if m is not None else cfg.default_max_pages,
            disallow=prefixes,
        )
    return rules


def politeness_key(host: str, cfg: CrawlConfig) -> str:
    """The politeness-unit key for ``host`` under ``cfg.politeness_scope``
    — the host itself (default) or its registrable domain.  Scalar form
    for the oracle and driver-side loops; frontier-sized paths use
    ``attach_politeness_key`` (the vectorized Arrow kernel)."""
    if cfg.politeness_scope == "domain":
        from engine.stages.domains import registrable_domain

        return registrable_domain(host)
    return host


def attach_politeness_key(t, cfg: CrawlConfig):
    """Append a ``pkey`` column to a frontier-shaped Arrow table.  Under
    host scope this is the host column itself (zero copy); under domain
    scope it's the vectorized eTLD+1 kernel.  Selection groupbys key on
    ``pkey`` so budgets/rules resolve per politeness unit while the raw
    host stays in the output."""
    import pyarrow as _pa

    if cfg.politeness_scope == "domain":
        from engine.stages.domains import registrable_domain_batch

        col = registrable_domain_batch(t.column("host"))["domain"]
    else:
        col = t.column("host")
    return t.append_column(_pa.field("pkey", _pa.string()), col)


def host_rules(rules: Dict[str, HostRules], host: str, cfg: CrawlConfig) -> HostRules:
    r = rules.get(host)
    if r is None:
        return HostRules(cfg.default_crawl_delay, cfg.default_max_pages)
    return r


def per_wave_cap(r: HostRules, cfg: CrawlConfig) -> int:
    return max(1, int(cfg.wave_seconds // max(r.crawl_delay, 1e-9)))


def robots_blocked(url: str, host: str, rules: Dict[str, HostRules], cfg: CrawlConfig) -> bool:
    r = host_rules(rules, host, cfg)
    if not r.disallow:
        return False
    try:
        from urllib.parse import urlsplit

        path = urlsplit(url).path or "/"
    except ValueError:
        return True
    return any(path.startswith(p) for p in r.disallow)


def priority_for_depth(depth: int) -> float:
    return 1.0 / (1.0 + depth)


def priority_for(depth: int, n_in: int, cfg: CrawlConfig) -> float:
    """Enqueue-time frontier priority under ``cfg.priority_mode``.

    ``n_in`` is the URL's emission count in the enqueueing wave (seeds
    count as one emission).  Both the engine's vectorized enqueue and the
    single-threaded oracle call THIS function — the priority formula must
    never diverge between them (conformance rule)."""
    p = priority_for_depth(depth)
    if cfg.priority_mode == "inlinks":
        p += 0.01 * min(int(n_in), 9)
    return p


def discover_links(page_url: str, html_bytes: bytes) -> List[str]:
    """Raw hrefs -> absolute canonical http(s) URLs, order-preserving dedup.

    Uses the same HTML parse + canonicalization as the rest of the engine;
    resolution of relative links is against the canonical page URL.
    """
    try:
        from engine.html_extract import bytes_to_str, declared_charset, detect_encoding

        enc = declared_charset(html_bytes) or detect_encoding(html_bytes)
        tree = HTMLTree.parse(bytes_to_str(html_bytes, enc))
    except Exception:
        return []
    out: List[str] = []
    seen = set()
    for href in get_links(tree):
        try:
            absu = urljoin(page_url, href)
        except ValueError:
            continue
        c = canonicalize_url(absu)
        if c is not None and c not in seen:
            seen.add(c)
            out.append(c)
    return out


def sort_key(priority: float, url: str):
    """The total order for both per-host selection and global crawl order."""
    return (-priority, url)
