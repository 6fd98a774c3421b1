"""Single-threaded crawl scheduler oracle (conformance reference).

Implements the exact wave semantics of crawl_common with plain Python data
structures and the SAME ShardedSeenSet (cuckoo filters, wave-commit
protocol), so the distributed crawl must reproduce its crawl order and
URL-seen set bit-for-bit (north_rule; BASELINE.md conformance row).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from engine.canonicalize import canonicalize_url, host_of
from engine.ids import url_hash64
from engine.pipelines.crawl_common import (
    CrawlConfig,
    HostRules,
    discover_links,
    host_rules,
    load_politeness,
    per_wave_cap,
    politeness_key,
    priority_for,
    robots_blocked,
    sort_key,
)
from engine.state.cuckoo import ShardedSeenSet


class _Cand:
    __slots__ = ("url", "host", "depth", "priority")

    def __init__(self, url: str, host: str, depth: int, priority: float):
        self.url = url
        self.host = host
        self.depth = depth
        self.priority = priority


def crawl_oracle(
    pages_path: str,
    seeds_path: str,
    politeness_path: Optional[str] = None,
    cfg: CrawlConfig = CrawlConfig(),
) -> Tuple[pa.Table, pa.Table]:
    """Run the crawl serially; return (crawl_order, url_seen) tables.

    crawl_order: (wave, seq, url, host); url_seen: (url_hash, url).
    """
    # UNION semantics for duplicate-canonical rows: every row whose raw URL
    # canonicalizes to a fetched URL contributes its links (matching the
    # distributed _fetch_filter, which has no notion of "first" row — block
    # order is not a thing it can see).  Discovered sets stay deterministic:
    # the union of per-copy link lists is order-free after dedup.
    pages_t = pq.read_table(pages_path, columns=["url", "html"])
    web: Dict[str, List[bytes]] = {}
    for u, h in zip(pages_t.column("url").to_pylist(), pages_t.column("html").to_pylist()):
        c = canonicalize_url(u)
        if c is not None:
            web.setdefault(c, []).append(h)

    rules = load_politeness(politeness_path, cfg)
    seen = ShardedSeenSet(cfg.num_shards, cfg.shard_capacity)
    fetched_count: Dict[str, int] = {}

    # -- seed load (wave -1 enqueue) ---------------------------------------
    seeds_t = pq.read_table(seeds_path, columns=["url"])
    frontier: List[_Cand] = []
    enqueued: List[Tuple[int, str]] = []  # (url_hash, url) ever marked seen

    def try_enqueue(
        urls_depths: List[Tuple[str, int]], emit_counts: Optional[Dict[str, int]] = None
    ) -> None:
        """Shared enqueue protocol: canonical, robots, cuckoo-dedup, stage.

        ``emit_counts`` carries per-url emission multiplicities for the
        "inlinks" priority mode (absent entries and seeds count as 1 —
        mirroring the engine's dedup-aggregate Count)."""
        cands = []
        for u, d in urls_depths:
            h = host_of(u)
            if not h or d > cfg.max_depth:
                continue
            cands.append((u, h, d))
        if not cands:
            return
        hashes = url_hash64([c[0] for c in cands])
        seen_mask = seen.contains_many(hashes)
        to_stage = []
        for (u, h, d), hsh, s in zip(cands, hashes, seen_mask):
            if s:
                continue
            to_stage.append(int(hsh))
            enqueued.append((int(hsh), u))
            if robots_blocked(u, politeness_key(h, cfg), rules, cfg):
                continue  # marked seen, never fetched
            n_in = (emit_counts or {}).get(u, 1)
            frontier.append(_Cand(u, h, d, priority_for(d, n_in, cfg)))
        if to_stage:
            import numpy as np

            seen.stage(np.array(to_stage, dtype=np.uint64))

    seed_canon: List[Tuple[str, int]] = []
    seed_dedup = set()
    for u in seeds_t.column("url").to_pylist():
        c = canonicalize_url(u)
        if c is not None and c not in seed_dedup:
            seed_dedup.add(c)
            seed_canon.append((c, 0))
    try_enqueue(seed_canon)
    seen.commit()

    order_rows: List[Tuple[int, int, str, str]] = []
    seq = 0

    for wave in range(cfg.max_waves):
        if not frontier:
            break
        # -- per-politeness-unit selection (host, or registrable domain
        # under politeness_scope="domain") ----------------------------------
        by_host: Dict[str, List[_Cand]] = {}
        for c in frontier:
            by_host.setdefault(politeness_key(c.host, cfg), []).append(c)

        selected: List[_Cand] = []
        carryover: List[_Cand] = []
        for h in by_host:
            r = host_rules(rules, h, cfg)
            done = fetched_count.get(h, 0)
            k = min(per_wave_cap(r, cfg), max(0, r.max_pages - done))
            cands = sorted(by_host[h], key=lambda c: sort_key(c.priority, c.url))
            selected.extend(cands[:k])
            carryover.extend(cands[k:])

        if not selected:
            break
        # -- global order within wave --------------------------------------
        selected.sort(key=lambda c: sort_key(c.priority, c.url))
        for c in selected:
            order_rows.append((wave, seq, c.url, c.host))
            seq += 1
            pk = politeness_key(c.host, cfg)
            fetched_count[pk] = fetched_count.get(pk, 0) + 1

        # -- fetch + discover ----------------------------------------------
        discovered: List[Tuple[str, int]] = []
        disc_seen = set()
        # emission multiplicities BEFORE dedup — one per (page copy, link)
        # pair, exactly the rows the engine's dedup-aggregate counts
        emit_counts: Dict[str, int] = {}
        for c in selected:
            htmls = web.get(c.url)
            if htmls is None:
                continue  # 404: budget consumed, no links
            for html in htmls:
                for link in discover_links(c.url, html):
                    emit_counts[link] = emit_counts.get(link, 0) + 1
                    if link not in disc_seen:
                        disc_seen.add(link)
                        discovered.append((link, c.depth + 1))

        # keep first (min depth, url) per url: discovered list is in fetch
        # order; canonical rule = sort by (depth, url) then first-wins.
        discovered.sort(key=lambda t: (t[1], t[0]))
        uniq: Dict[str, int] = {}
        for u, d in discovered:
            if u not in uniq:
                uniq[u] = d

        frontier = carryover
        try_enqueue(sorted(uniq.items()), emit_counts)
        seen.commit()

    order = pa.table(
        {
            "wave": pa.array([r[0] for r in order_rows], pa.int64()),
            "seq": pa.array([r[1] for r in order_rows], pa.int64()),
            "url": pa.array([r[2] for r in order_rows], pa.string()),
            "host": pa.array([r[3] for r in order_rows], pa.string()),
        }
    )
    enqueued.sort(key=lambda t: (t[0], t[1]))
    url_seen = pa.table(
        {
            "url_hash": pa.array([t[0] for t in enqueued], pa.uint64()),
            "url": pa.array([t[1] for t in enqueued], pa.string()),
        }
    )
    return order, url_seen
