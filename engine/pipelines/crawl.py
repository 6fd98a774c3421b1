"""Distributed Ray-Data crawl: frontier, politeness scheduler, URL-seen set.

The north_star pipeline (BASELINE.json): a from-scratch crawl frontier +
fetch scheduler over a Parquet pages table, expressed Ray-Data-first.

Per wave (semantics defined once in crawl_common; conformance oracle in
crawl_oracle):

1. **Politeness selection** — hybrid: frontiers above
   ``driver_small_wave_threshold`` run a two-stage distributed selection
   (stage 1: ``groupby((host, url_hash % n_salts))`` partial top-k bounds
   mega-host skew; stage 2: exact per-host top-k over the per-salt
   winners); smaller frontiers run the SAME per-host function on the
   driver.  Selection output is budget-bounded (sum of per-host wave caps),
   so it is collected to the driver for global ordering; the carryover
   frontier stays a distributed Dataset on the large path (anti-join
   against the selected set), checkpointed as a parquet directory.
2. **Fetch** — broadcast the selected URL set (``ray.put``), semi-join
   inside ``map_batches`` against one of three layouts: flat pages
   (column-pruned scan), hash-bucketed pages, or a pre-derived bucketed
   link graph (engine.sources.bucketed — only buckets containing selected
   URLs are read; no HTML re-parse per wave).  ``extract_docs`` mode
   (crawl-and-index) defers extraction to one chunked task-fn pass after
   the crawl loop (see _extract_fetched); ``extract_pages_path`` lets the
   crawl itself run over the links layout.
3. **Discovery** — ``map_batches`` parses links, emits (url, depth+1);
   exact within-wave dedup = ``groupby('url').aggregate(Min('depth'))``
   (hash shuffle on url — the one unavoidable wide op; pre-deduped per
   batch first).
4. **Seen-check / enqueue** — an actor-pool ``map_batches`` stage routes
   url-hashes to the sharded cuckoo actors (batched RPC per shard), filters
   already-seen URLs, stages the rest, and applies robots rules; the driver
   commits all shards at wave end (wave-commit protocol, engine.state.cuckoo)
   so membership answers are parallelism-independent.
5. **Checkpoint** — frontier segment, crawl-order rows, enqueued log and
   every cuckoo shard are written per wave; ``state.json`` is renamed into
   place last, so a killed run resumes from the last *complete* wave without
   re-fetching (north_rule resume requirement; see resume()).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional, Tuple

_TIMING = os.environ.get("RAYCRAWL_TIMING", "") == "1"


def _tlog(label: str, t0: float) -> float:
    if _TIMING:
        print(f"[crawl-timing] {label}: {time.monotonic() - t0:.2f}s", flush=True)
    return time.monotonic()

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Min

from engine.canonicalize import canonicalize_url, host_of
from engine.ids import url_hash64
from engine.pipelines.crawl_common import (
    CrawlConfig,
    attach_politeness_key,
    discover_links,
    host_rules,
    load_politeness,
    per_wave_cap,
    politeness_key,
    priority_for,
    priority_for_depth,
    robots_blocked,
    sort_key,
)
from engine.state.cuckoo import CuckooShard

_FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int64()),
        ("priority", pa.float64()),
    ]
)


def _frontier_table(urls, hosts, depths, inlinks=None, cfg=None) -> pa.Table:
    if inlinks is None or cfg is None:
        pr = [priority_for_depth(d) for d in depths]
    else:
        pr = [priority_for(d, n, cfg) for d, n in zip(depths, inlinks)]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "depth": pa.array(depths, pa.int64()),
            "priority": pa.array(pr, pa.float64()),
        },
        schema=_FRONTIER_SCHEMA,
    )


def _host_budget(df: pd.DataFrame, rules, counts, cfg: CrawlConfig) -> int:
    """This wave's fetch budget for the politeness unit of ``df`` (ONE
    implementation: the driver path, distributed stage 2, and salted
    stage 1 all use it — the budget formula and sort key must never
    diverge between paths).  The unit key is the ``pkey`` column when the
    selection attached one (host under the default scope, registrable
    domain under ``politeness_scope="domain"``), else the raw host."""
    key = df["pkey"].iloc[0] if "pkey" in df.columns else df["host"].iloc[0]
    r = host_rules(rules, key, cfg)
    return min(per_wave_cap(r, cfg), max(0, r.max_pages - counts.get(key, 0)))


def _sort_candidates(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["priority", "url"], ascending=[False, True], kind="mergesort")


def _select_one_host(df: pd.DataFrame, rules, counts, cfg: CrawlConfig) -> pd.DataFrame:
    """Politeness selection for one host's candidates (shared by the
    distributed map_groups path and the driver small-wave fast path)."""
    k = _host_budget(df, rules, counts, cfg)
    df = _sort_candidates(df).reset_index(drop=True)
    df["selected"] = np.arange(len(df)) < k
    return df


def _select_group(
    df: pd.DataFrame, rules_ref, counts_ref, cfg: CrawlConfig
) -> pd.DataFrame:
    """Per-host politeness selection (runs inside map_groups tasks)."""
    return _select_one_host(df, ray.get(rules_ref), ray.get(counts_ref), cfg)


def _select_group_selected(
    df: pd.DataFrame, rules_ref, counts_ref, cfg: CrawlConfig
) -> pd.DataFrame:
    """_select_group returning ONLY the selected rows — the salted path
    never uses the unselected winners (carryover is recomputed from the
    full frontier), so the driver round-trip stays O(wave budget)."""
    out = _select_group(df, rules_ref, counts_ref, cfg)
    return out[out["selected"]]


def _preselect_salted(
    df: pd.DataFrame, rules_ref, counts_ref, cfg: CrawlConfig
) -> pd.DataFrame:
    """Stage-1 selection for a (host, salt) sub-group of a mega-host.

    Keeps only that sub-group's top-(cap) candidates by the SAME total order
    — the global per-host top-k is a subset of the union of per-salt top-k's
    (each salt keeps >= k), so stage 2 over the union is exact.  This bounds
    any single task's input to frontier(host)/n_salts: the explicit
    skew-handling for mega-domains (north_rule; SURVEY.md §4)."""
    k = _host_budget(df, ray.get(rules_ref), ray.get(counts_ref), cfg)
    return _sort_candidates(df).head(k).drop(columns=["salt"])


def _fetch_filter(batch: pa.Table, selected_ref) -> pa.Table:
    """Broadcast semi-join: keep pages whose canonical url was selected.

    Stateless task fn (not an actor pool): the only setup is a ray.get of
    the broadcast dict, which is plasma-local after the first task on a
    node — actor-pool startup latency would dominate at per-wave cadence.
    """
    selected: Dict[str, int] = ray.get(selected_ref)  # url -> depth
    urls = batch.column("url").to_pylist()
    keep = np.zeros(len(urls), dtype=bool)
    canon = []
    depths = []
    for i, u in enumerate(urls):
        c = canonicalize_url(u)
        if c is not None and c in selected:
            keep[i] = True
            canon.append(c)
            depths.append(selected[c])
    out = batch.filter(pa.array(keep))
    out = out.drop_columns(["url"])
    out = out.append_column("url", pa.array(canon, pa.string()))
    out = out.append_column("depth", pa.array(depths, pa.int64()))
    return out


def _links_filter(batch: pa.Table, selected_ref) -> pa.Table:
    """Links-table fetch: rows for selected urls -> flat (url, depth) links.

    Pre-canonicalized link lists (bucketize_links), so this is a pure
    dict-membership filter + explode.  Duplicate source-url rows each emit
    their links, exactly like the html path — UNION semantics, which the
    oracle implements identically (crawl_oracle keeps every copy's links;
    downstream url-dedup makes the union order-free and deterministic).
    """
    selected: Dict[str, int] = ray.get(selected_ref)
    out_urls: List[str] = []
    out_depths: List[int] = []
    for u, links in zip(batch.column("url").to_pylist(), batch.column("links").to_pylist()):
        d = selected.get(u)
        if d is None:
            continue
        for link in links:
            out_urls.append(link)
            out_depths.append(d + 1)
    return pa.table(
        {"url": pa.array(out_urls, pa.string()), "depth": pa.array(out_depths, pa.int64())}
    )


def _discover_batch(batch: pa.Table) -> pa.Table:
    """Fetched pages -> flat (url, depth) link rows, per-page deduped."""
    out_urls: List[str] = []
    out_depths: List[int] = []
    for u, html, d in zip(
        batch.column("url").to_pylist(),
        batch.column("html").to_pylist(),
        batch.column("depth").to_pylist(),
    ):
        if html is None:
            continue
        for link in discover_links(u, html):
            out_urls.append(link)
            out_depths.append(d + 1)
    return pa.table(
        {"url": pa.array(out_urls, pa.string()), "depth": pa.array(out_depths, pa.int64())}
    )


def _robust_gather(futs: List, resubmit, *, timeout: float = 30.0, attempts: int = 4) -> List:
    """ray.get over actor futures with a lost-submission workaround.

    Measured failure mode (this Ray version, single node, after heavy
    Ray Data activity): one of N freshly-created actors occasionally never
    receives its queued method call — 15/16 shards execute, one sits idle
    forever, and a bare ray.get blocks the driver indefinitely (stack
    captured via SIGUSR1; the actor's core-worker log shows only its
    __init__ ever ran).  All shard RPCs used with this helper are
    IDEMPOTENT (stage dedups at commit; a re-committed shard commits an
    empty staging buffer; snapshot is read-only), so the fix is: wait with
    a timeout, resubmit the unresolved slots via ``resubmit(slot)``, and
    only fail after ``attempts`` rounds.

    The timeout DOUBLES each attempt (30, 60, 120, ... by default): a
    legitimately slow-but-alive RPC (e.g. a large snapshot serialization)
    is then hit with at most one redundant resubmission before the window
    grows past its real duration, instead of being re-submitted every 30 s
    while the busy actor compounds work.  Only the resubmit COUNT is
    bounded; total wall budget grows geometrically with ``attempts``.
    """
    results: List = [None] * len(futs)
    slot_of = {f: i for i, f in enumerate(futs)}
    for attempt in range(attempts):
        pending = list(slot_of)
        if not pending:
            return results
        window = timeout * (2.0 ** attempt)
        ready, not_ready = ray.wait(
            pending, num_returns=len(pending), timeout=window
        )
        for f in ready:
            results[slot_of.pop(f)] = ray.get(f)
        if not slot_of:
            return results
        if attempt < attempts - 1:
            import logging as _logging

            _logging.getLogger("engine.crawl").warning(
                "%d shard RPC(s) unresolved after %.0fs — resubmitting "
                "(lost actor-task submission workaround)",
                len(slot_of), window,
            )
            slot_of = {resubmit(i): i for i in slot_of.values()}
    raise TimeoutError(
        f"shard RPCs unresolved after {attempts} backoff rounds "
        f"({timeout:.0f}s base, doubling): slots {sorted(slot_of.values())}"
    )


def _enqueue_stage(batch: pa.Table, shard_handles, rules_ref, cfg: CrawlConfig) -> pa.Table:
    """Distributed wrapper over :func:`_enqueue_core` (broadcast rules)."""
    return _enqueue_core(batch, shard_handles, ray.get(rules_ref), cfg)


def _enqueue_core(batch: pa.Table, shard_handles, rules, cfg: CrawlConfig) -> pa.Table:
    """Seen-check + stage + robots filter against the cuckoo shard actors.

    Input batches arrive exactly once per URL (post-dedup), so each new URL
    is staged exactly once.  ``contains`` answers come from the shards'
    committed state (stable within a wave).  Output rows carry ``blocked``
    (robots) — blocked URLs are recorded seen but not enqueued.  One batched
    RPC per (batch, shard), no per-URL calls; runs identically inside a
    map_batches task (large waves) or on the driver (small waves).
    """
    # Validity filter FIRST (empty host / too deep are never hashed or
    # staged) — ordering must match the oracle's try_enqueue exactly.
    # n_in (per-url emission count from the dedup aggregate) rides along
    # for the "inlinks" priority mode; absent -> 1 (seed semantics).
    nin_col = (
        batch.column("n_in").to_pylist()
        if "n_in" in batch.column_names
        else [1] * batch.num_rows
    )
    urls, hosts, depths, nins = [], [], [], []
    for u, d, n in zip(
        batch.column("url").to_pylist(), batch.column("depth").to_pylist(), nin_col
    ):
        h = host_of(u)
        if h and d <= cfg.max_depth:
            urls.append(u)
            hosts.append(h)
            depths.append(int(d))
            nins.append(int(n) if n is not None else 1)
    if not urls:
        return _EMPTY_ENQ_FULL
    hashes = url_hash64(urls)
    sid = (hashes % np.uint64(len(shard_handles))).astype(np.int64)
    seen = np.zeros(len(urls), dtype=bool)
    # one combined contains+stage RPC per shard, gathered in ONE ray.get —
    # the old contains round (serially ray.get per shard) + stage round
    # were the dominant per-batch coordination cost (VERDICT r2 #2)
    futs, idxs, shard_ids = [], [], []
    for s in range(len(shard_handles)):
        idx = np.nonzero(sid == s)[0]
        if len(idx):
            idxs.append(idx)
            shard_ids.append(s)
            futs.append(shard_handles[s].contains_and_stage.remote(hashes[idx]))
    res_list = _robust_gather(
        futs,
        lambda i: shard_handles[shard_ids[i]].contains_and_stage.remote(
            hashes[idxs[i]]
        ),
    )
    for idx, res in zip(idxs, res_list):
        seen[idx] = res

    keep = ~seen
    keep_urls = [u for u, k in zip(urls, keep) if k]
    keep_hosts = [h for h, k in zip(hosts, keep) if k]
    keep_depths = [d for d, k in zip(depths, keep) if k]
    keep_nins = [n for n, k in zip(nins, keep) if k]
    keep_hashes = hashes[keep]
    blocked = [
        robots_blocked(u, politeness_key(h, cfg), rules, cfg)
        for u, h in zip(keep_urls, keep_hosts)
    ]
    t = _frontier_table(keep_urls, keep_hosts, keep_depths, keep_nins, cfg)
    return t.append_column("blocked", pa.array(blocked, pa.bool_())).append_column(
        "url_hash", pa.array(keep_hashes, pa.uint64())
    )


def _atomic_write_json(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


# Extraction-chunk auto-sizing constants (measured; see PERF.md):
# a fetch+extract pipeline launch costs ~2 s fixed regardless of chunk
# size, and extraction throughput is ~0.4 ms/page/core.  A chunk below
# amortize_sec * rate * cpus URLs costs more in launches than overlap
# can ever recover.
_EXTRACT_AMORTIZE_SEC = 2.0
_EXTRACT_PAGES_PER_SEC_PER_CPU = 2500


class CrawlRun:
    """Driver-side crawl orchestration with per-wave checkpointing."""

    def __init__(
        self,
        pages_path: str,
        seeds_path: str,
        politeness_path: Optional[str],
        workdir: str,
        cfg: CrawlConfig = CrawlConfig(),
        extract_docs: bool = False,
        extract_pages_path: Optional[str] = None,
        extract_chunk_urls: Optional[int] = None,
        overlap_extract: bool = True,
    ):
        self.pages_path = pages_path
        self.seeds_path = seeds_path
        self.workdir = workdir
        self.cfg = cfg
        # extract_docs: run the full extraction pipeline on every fetched
        # page and write workdir/docs/part-K/ (wave column per row).
        # Extraction is DEFERRED to one chunked pass after the crawl loop —
        # per-wave extraction paid pipeline-launch + parquet-write fixed
        # costs every wave (~2 s/wave measured at bench scale, 0.41
        # 8->32-CPU efficiency in round 1).
        #
        # overlap_extract: additionally start extraction of CLOSED chunks
        # (greedy chunking is prefix-stable, so every chunk except the last
        # has final membership the moment it closes) on a single background
        # thread WHILE later waves crawl — the cluster does useful work
        # during the driver-side per-wave coordination floor.  Chunk
        # results are byte-identical regardless of when they run, and the
        # post-loop pass re-derives the same plan and skips completed
        # chunks via their fingerprint, so resume semantics are unchanged.
        #
        # extract_pages_path decouples the two layouts: the crawl loop can
        # run over the cheap pruned LINKS layout (discovery never touches
        # html) while the deferred extraction reads html from the pages
        # layout — the per-wave html read was the dominant crawl-and-index
        # cost (measured 2-4 s/wave at bench scale).  Defaults to
        # pages_path, which must then carry html.
        self.extract_docs = extract_docs
        self.extract_src = extract_pages_path or pages_path
        if extract_docs:
            from engine.sources.bucketed import is_bucketed, layout_kind

            if is_bucketed(self.extract_src) and layout_kind(self.extract_src) == "links":
                raise ValueError(
                    "extract_docs=True needs HTML page bytes, but the "
                    "extraction source is a links-only layout (bucketize_"
                    "links output); pass extract_pages_path pointing at the "
                    "pages table or a bucketize_pages layout."
                )
        os.makedirs(workdir, exist_ok=True)
        self.rules = load_politeness(politeness_path, cfg)
        self.rules_ref = ray.put(self.rules)
        self.shards = [
            ray.remote(CuckooShard).remote(i, cfg.shard_capacity)
            for i in range(cfg.num_shards)
        ]
        self.fetched_count: Dict[str, int] = {}
        self.seq = 0
        self.start_wave = 0
        # extract_chunk_urls=None (the default) auto-sizes chunks at the
        # pipeline-LAUNCH AMORTIZATION point: each fetch+extract pipeline
        # pays ~2 s of fixed launch cost (read plan + actor-pool spin-up +
        # parquet write commit, measured — PERF.md #28), so a chunk must
        # carry at least ~2 s of extraction work (~0.4 ms/page/core =>
        # 2500 pages/s/core) or the launches dominate: round-4's bench
        # forced 2000-URL chunks and regressed crawl_extract 5.5 -> 10.0 s
        # from ~7 underfilled launches.  Small crawls therefore coalesce to
        # ONE deferred chunk (overlap never engages — nothing closes early);
        # production waves (10^6+ URLs at the 10^10-URL frontier) exceed the
        # floor and overlap wave-by-wave.  An explicit value is honored
        # verbatim (tests force tiny chunks to exercise the plan machinery).
        if extract_chunk_urls is None:
            cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
            extract_chunk_urls = int(
                _EXTRACT_AMORTIZE_SEC * _EXTRACT_PAGES_PER_SEC_PER_CPU * cluster_cpus
            )
        self.extract_chunk_urls = extract_chunk_urls
        self.overlap_extract = overlap_extract and extract_docs
        self._bg_pool = None  # lazy ThreadPoolExecutor(1) for overlap chunks
        self._bg_futures: Dict[int, Any] = {}  # chunk idx -> Future
        self._planned_orders: List[pa.Table] = []  # order logs seen so far

        # Links-layout wave cache: the link graph is STATIC across waves,
        # so re-reading parquet every wave pays the read cost x waves.
        # When the layout fits the object store comfortably (on-disk size
        # below the gate), materialize it ONCE and let every wave filter
        # the cached blocks; above the gate (the 10^10-URL path) waves keep
        # the pruned per-bucket reads.
        self._links_cache = None
        from engine.sources.bucketed import is_bucketed, layout_kind

        if is_bucketed(pages_path) and layout_kind(pages_path) == "links":
            import glob as _glob

            files = _glob.glob(os.path.join(pages_path, "bucket=*", "*.parquet"))
            on_disk = sum(os.path.getsize(f) for f in files)
            if on_disk <= cfg.links_cache_bytes:
                cpus = max(4, int(ray.cluster_resources().get("CPU", 8)))
                self._links_cache = ray.data.read_parquet(
                    files,
                    columns=["url", "links"],
                    override_num_blocks=min(cpus, max(1, len(files))),
                ).materialize()

    # -- checkpoint helpers -------------------------------------------------
    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.workdir, "seed" if wave < 0 else f"wave_{wave:04d}")

    @staticmethod
    def _write_part(obj, tmp_dir: str, name: str) -> int:
        """Write a checkpoint artifact; pa.Table -> single file, Dataset ->
        distributed parquet directory (the 10^10-scale path: frontier and
        enqueue logs never pass through the driver when large).  Returns the
        row count (from parquet footers — no data read)."""
        if isinstance(obj, pa.Table):
            pq.write_table(obj, os.path.join(tmp_dir, f"{name}.parquet"))
            return obj.num_rows
        out = os.path.join(tmp_dir, name)
        obj.write_parquet(out)
        import glob as _glob

        return sum(
            pq.read_metadata(f).num_rows
            for f in _glob.glob(os.path.join(out, "*.parquet"))
        )

    def _checkpoint_data(self, wave: int, frontier, order: pa.Table, enq) -> Tuple[str, int, int]:
        """Phase 1: persist the wave's data artifacts into the tmp dir.

        MUST run BEFORE the cuckoo commit: the enqueue dataset's blocks carry
        a staging side effect, and if a lost block were reconstructed by Ray
        lineage AFTER commit, the re-run would see every URL as already seen
        and silently return empty.  Writing the artifacts to durable storage
        first means reconstruction can only happen pre-commit, where the
        enqueue stage is idempotent (re-staging dedups at commit).
        """
        d = self._wave_dir(wave)
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "shards"), exist_ok=True)
        n_frontier = self._write_part(frontier, tmp, "frontier")
        pq.write_table(order, os.path.join(tmp, "order.parquet"))
        n_enq = self._write_part(enq, tmp, "enqueued")
        return tmp, n_frontier, n_enq

    def _checkpoint_finalize(
        self,
        wave: int,
        tmp: str,
        order_rows: int,
        n_frontier: int,
        n_enq: int,
        metrics: Optional[Dict[str, int]] = None,
        snaps: Optional[List[Tuple[int, bytes]]] = None,
    ):
        """Phase 2 (after shard commit): metrics + shard snapshots, atomic
        rename, then state.json last (the completion marker).

        ``snaps`` — per-shard (seen_count, blob) pairs, normally produced by
        the wave loop's single combined ``commit_snapshot`` round; fetched
        here in one ``snapshot`` round when absent (single-phase paths).
        """
        d = self._wave_dir(wave)
        if snaps is None:
            snaps = _robust_gather(
                [s.snapshot.remote() for s in self.shards],
                lambda i: self.shards[i].snapshot.remote(),
            )
        # per-wave lineage/metrics row (north_rule: every partition
        # checkpoints its lineage + metrics to Parquet)
        m = dict(metrics or {})
        m.setdefault("n_selected", order_rows)
        m.setdefault("n_new_enqueued", n_enq)
        m["wave"] = wave
        m["n_frontier_out"] = n_frontier
        m["seen_total"] = int(sum(sc for sc, _ in snaps))
        pq.write_table(
            pa.table({k: pa.array([v], pa.int64()) for k, v in sorted(m.items())}),
            os.path.join(tmp, "metrics.parquet"),
        )
        blobs = [b for _, b in snaps]
        for i, b in enumerate(blobs):
            with open(os.path.join(tmp, "shards", f"shard_{i:03d}.bin"), "wb") as f:
                f.write(b)
        shutil.rmtree(d, ignore_errors=True)
        os.replace(tmp, d)
        _atomic_write_json(
            os.path.join(self.workdir, "state.json"),
            {"wave": wave, "seq": self.seq, "fetched_count": self.fetched_count},
        )
        self._prune_old(wave)

    def _checkpoint(self, wave, frontier, order, enq, metrics=None, snaps=None):
        """Single-phase form for paths with no staged side effect pending."""
        tmp, n_frontier, n_enq = self._checkpoint_data(wave, frontier, order, enq)
        self._checkpoint_finalize(
            wave, tmp, order.num_rows, n_frontier, n_enq, metrics, snaps=snaps
        )

    def _prune_old(self, wave: int) -> None:
        """Drop frontier snapshots + shard blobs of waves older than the one
        resume actually uses (disk stays O(frontier), not O(frontier x
        waves)); the order/enqueued/metrics logs are kept — they ARE the
        crawl's output."""
        for old in range(-1, wave - 1):
            d = self._wave_dir(old)
            shutil.rmtree(os.path.join(d, "shards"), ignore_errors=True)
            shutil.rmtree(os.path.join(d, "frontier"), ignore_errors=True)
            f = os.path.join(d, "frontier.parquet")
            if os.path.exists(f):
                os.remove(f)

    def resume(self) -> bool:
        """Restore from the last complete wave; True if state was found."""
        state_path = os.path.join(self.workdir, "state.json")
        if not os.path.exists(state_path):
            return False
        with open(state_path) as fh:
            state = json.load(fh)
        wave = state["wave"]
        self.seq = state["seq"]
        self.fetched_count = dict(state["fetched_count"])
        self.start_wave = wave + 1
        d = self._wave_dir(wave)
        blobs = []
        for i in range(len(self.shards)):
            with open(os.path.join(d, "shards", f"shard_{i:03d}.bin"), "rb") as f:
                blobs.append(f.read())
        # one parallel (robust) round instead of serial per-shard gets
        _robust_gather(
            [s.restore.remote(b) for s, b in zip(self.shards, blobs)],
            lambda i: self.shards[i].restore.remote(blobs[i]),
        )
        return True

    # -- seed load ----------------------------------------------------------
    def _load_seeds(self) -> None:
        seeds = pq.read_table(self.seeds_path, columns=["url"])
        canon: List[str] = []
        seen = set()
        for u in seeds.column("url").to_pylist():
            c = canonicalize_url(u)
            if c is not None and c not in seen:
                seen.add(c)
                canon.append(c)
        cand = pa.table(
            {"url": pa.array(canon, pa.string()), "depth": pa.array([0] * len(canon), pa.int64())}
        )
        enq = self._as_table(self._enqueue(ray.data.from_arrow(cand)))
        frontier = enq.filter(pc.equal(enq.column("blocked"), False)).select(
            ["url", "host", "depth", "priority"]
        )
        cs = _robust_gather(
            [s.commit_snapshot.remote() for s in self.shards],
            lambda i: self.shards[i].commit_snapshot.remote(),
        )
        self._checkpoint(
            -1,
            frontier,
            _EMPTY_ORDER,
            enq.select(["url_hash", "url"]),
            snaps=[(sc, blob) for _ins, sc, blob in cs],
        )

    def _enqueue(self, cand_ds: ray.data.Dataset) -> pa.Table:
        """Dedup (min depth per url) -> seen-check/stage -> arrow result.

        Hybrid like selection: the candidate list is first materialized
        (wave-bounded — links of a budget-bounded fetch).  Small waves dedup
        with pandas on the driver and make the shard RPCs directly; large
        waves go through the groupby shuffle + a map_batches enqueue stage.
        Both paths call the same :func:`_enqueue_core`.
        """
        # materialize in the OBJECT STORE first: row count comes from block
        # metadata, and only the small path ever pulls blocks to the driver
        # (the large path must not — that is the whole point of it).
        mat = cand_ds.materialize()
        n_rows = mat.count()
        if n_rows == 0:
            return _EMPTY_ENQ_FULL
        if n_rows < self.cfg.driver_small_wave_threshold:
            tables = ray.get(mat.to_arrow_refs())
            cand = pa.concat_tables(tables, promote_options="default")
            df = cand.to_pandas()
            ded = df.groupby("url", sort=True, as_index=False).agg(
                depth=("depth", "min"), n_in=("depth", "size")
            )
            batch = pa.table(
                {
                    "url": pa.array(ded["url"], pa.string()),
                    "depth": pa.array(ded["depth"], pa.int64()),
                    "n_in": pa.array(ded["n_in"], pa.int64()),
                }
            )
            return _enqueue_core(batch, self.shards, self.rules, self.cfg)
        deduped = mat.groupby("url").aggregate(
            Min("depth", alias_name="depth"), Count("depth", alias_name="n_in")
        )
        out = deduped.map_batches(
            _enqueue_stage,
            fn_kwargs=dict(
                shard_handles=self.shards, rules_ref=self.rules_ref, cfg=self.cfg
            ),
            batch_format="pyarrow",
            batch_size=65536,
        )
        # materialize: the enqueue stage STAGES hashes into the shard actors
        # as a side effect, so this execution must run exactly once; the
        # result stays in the object store (never concatenated on the
        # driver — the 10^10-scale path).
        return out.materialize()

    @staticmethod
    def _as_table(enq) -> pa.Table:
        if isinstance(enq, pa.Table):
            return enq
        tables = ray.get(enq.to_arrow_refs())
        if not tables:
            return _EMPTY_ENQ_FULL
        t = pa.concat_tables(tables, promote_options="default")
        return t if t.num_rows else _EMPTY_ENQ_FULL

    # -- main loop ----------------------------------------------------------
    def run(self) -> Tuple[pa.Table, pa.Table]:
        if self.resume():
            if self.overlap_extract:
                # seed the overlap planner with the completed waves' order
                # logs so chunk indices line up with the final plan
                import glob as _glob

                for name in sorted(os.listdir(self.workdir)):
                    if name.startswith("wave_") and not name.endswith(".tmp"):
                        op = os.path.join(self.workdir, name, "order.parquet")
                        if os.path.exists(op):
                            self._planned_orders.append(pq.read_table(op))
        else:
            self._load_seeds()
            self.start_wave = 0

        counts_ref = ray.put(dict(self.fetched_count))
        for wave in range(self.start_wave, self.cfg.max_waves):
            import glob as _glob

            prev_dir = self._wave_dir(wave - 1)
            f_file = os.path.join(prev_dir, "frontier.parquet")
            if os.path.exists(f_file):
                f_src: Any = f_file
                n_frontier = pq.read_metadata(f_file).num_rows
            else:
                f_dir = os.path.join(prev_dir, "frontier")
                parts = sorted(_glob.glob(os.path.join(f_dir, "*.parquet")))
                f_src = parts
                n_frontier = sum(pq.read_metadata(f).num_rows for f in parts)
            if n_frontier == 0:
                break

            wave_t0 = time.monotonic()
            t0 = time.monotonic()
            # 1. politeness selection (per-host shuffle) — hybrid: big
            # frontiers shuffle via groupby(host).map_groups; small ones run
            # the SAME per-host function on the driver (no execution round
            # trip).  Results are identical: selection is per-host-local.
            if n_frontier >= self.cfg.driver_small_wave_threshold:
                frontier = ray.data.read_parquet(f_src)
                n_salts = self.cfg.n_selection_salts
                _cfg = self.cfg

                def add_salt(t: pa.Table) -> pa.Table:
                    t = attach_politeness_key(t, _cfg)
                    salts = (
                        url_hash64(t.column("url").to_pylist()) % np.uint64(n_salts)
                    ).astype(np.int64)
                    return t.append_column("salt", pa.array(salts, pa.int64()))

                # stage 1: (host, salt) partial top-k bounds mega-host skew;
                # stage 2: exact per-host top-k over the per-salt winners.
                pre = (
                    frontier.map_batches(
                        add_salt, batch_format="pyarrow", zero_copy_batch=True
                    )
                    .groupby(["pkey", "salt"])
                    .map_groups(
                        _preselect_salted,
                        fn_args=(self.rules_ref, counts_ref, self.cfg),
                        batch_format="pandas",
                    )
                )
                # collect ONLY the budget-bounded selected rows: the driver
                # round-trip is O(wave budget), never O(stage-2 candidates)
                # (the carryover never needs the unselected winners — it is
                # recomputed from the FULL frontier below, because stage-1
                # truncation removed non-winning candidates anyway).
                # as_arrow: stage 1 emitted pandas blocks; the stage-2
                # hash exchange over pandas blocks is ~20x slower than
                # over Arrow blocks (PERF.md #31).
                from engine.stages.common import as_arrow as _as_arrow

                marked = _as_arrow(pre).groupby("pkey").map_groups(
                    _select_group_selected,
                    fn_args=(self.rules_ref, counts_ref, self.cfg),
                    batch_format="pandas",
                )
                from engine.stages.common import collect_arrow_blocks

                sel_blocks = collect_arrow_blocks(marked, required_col="url")
                selected_t = (
                    pa.concat_tables(sel_blocks, promote_options="default")
                    if sel_blocks
                    else _EMPTY_FRONTIER
                )
                salted_selection = True
            else:
                salted_selection = False
                frontier_t = (
                    pq.read_table(f_file)
                    if isinstance(f_src, str)
                    else pa.concat_tables([pq.read_table(f) for f in f_src])
                )
                fdf = attach_politeness_key(frontier_t, self.cfg).to_pandas()
                parts = [
                    _select_one_host(g, self.rules, self.fetched_count, self.cfg)
                    for _, g in fdf.groupby("pkey", sort=True)
                ]
                marked_t = pa.Table.from_pandas(
                    pd.concat(parts, ignore_index=True), preserve_index=False
                )
                selected_t = marked_t.filter(marked_t.column("selected"))
            t0 = _tlog(
                f"wave {wave} select ({selected_t.num_rows} of {n_frontier} frontier)",
                t0,
            )
            if salted_selection:
                # broadcast anti-join: carryover = frontier \\ selected.
                # Stays a Dataset — the carryover frontier never touches
                # the driver on the large-wave path.
                # zero-copy: ship the Arrow column itself as the value set
                # (no Python-object round trip on the driver)
                sel_arr = selected_t.column("url").combine_chunks()
                sel_set_ref = ray.put(sel_arr)

                def drop_selected(t: pa.Table, ref=sel_set_ref) -> pa.Table:
                    sel = ray.get(ref)
                    keep = pc.invert(
                        pc.is_in(t.column("url"), value_set=sel)
                    )
                    return t.filter(keep).select(
                        ["url", "host", "depth", "priority"]
                    )

                carry = ray.data.read_parquet(f_src).map_batches(
                    drop_selected, batch_format="pyarrow", zero_copy_batch=True
                )
                n_carry = None  # counted from parquet footers at checkpoint
            else:
                carry = marked_t.filter(pc.invert(marked_t.column("selected"))).select(
                    ["url", "host", "depth", "priority"]
                )
                n_carry = carry.num_rows
            if selected_t.num_rows == 0:
                self._checkpoint(wave, carry, _EMPTY_ORDER, _EMPTY_ENQ)
                break

            # 2. global wave order (selected is budget-bounded -> driver)
            pkeys = (
                selected_t.column("pkey").to_pylist()
                if "pkey" in selected_t.column_names
                else [
                    politeness_key(h, self.cfg)
                    for h in selected_t.column("host").to_pylist()
                ]
            )
            sel = sorted(
                zip(
                    selected_t.column("url").to_pylist(),
                    selected_t.column("host").to_pylist(),
                    selected_t.column("depth").to_pylist(),
                    selected_t.column("priority").to_pylist(),
                    pkeys,
                ),
                key=lambda r: sort_key(r[3], r[0]),
            )
            order_rows = []
            for u, h, d, p, pk in sel:
                order_rows.append((wave, self.seq, u, h))
                self.seq += 1
                self.fetched_count[pk] = self.fetched_count.get(pk, 0) + 1
            order_t = pa.table(
                {
                    "wave": pa.array([r[0] for r in order_rows], pa.int64()),
                    "seq": pa.array([r[1] for r in order_rows], pa.int64()),
                    "url": pa.array([r[2] for r in order_rows], pa.string()),
                    "host": pa.array([r[3] for r in order_rows], pa.string()),
                }
            )
            counts_ref = ray.put(dict(self.fetched_count))

            # 3. fetch (broadcast semi-join) + 4. discover + 5. enqueue
            # With a hash-bucketed pages layout (engine.sources.bucketed),
            # only the buckets containing selected URLs are read — I/O
            # proportional to the wave budget, not the corpus (the 10^10
            # scale path).  A flat layout falls back to a full column-pruned
            # scan with the same semantics.
            selected_ref = ray.put({u: d for u, h, d, p, pk in sel})
            from engine.sources.bucketed import is_bucketed, layout_kind, read_buckets_for

            sel_urls = [u for u, _h, _d, _p, _pk in sel]
            # block count sized to the wave's selection, not the bucket count
            n_blocks = max(4, min(64, len(sel_urls) // 2000 + 4))
            if is_bucketed(self.pages_path) and layout_kind(self.pages_path) == "links":
                # Scale path: pre-derived link graph (engine.sources.bucketed
                # .bucketize_links) — no HTML bytes read, no per-wave parse.
                # Small layouts are served from the once-materialized object
                # store cache (see __init__); large ones read pruned buckets.
                if self._links_cache is not None:
                    links_ds = self._links_cache
                else:
                    links_ds = read_buckets_for(
                        self.pages_path,
                        sel_urls,
                        columns=["url", "links"],
                        override_num_blocks=n_blocks,
                    )
                links = links_ds.map_batches(
                    _links_filter,
                    fn_kwargs=dict(selected_ref=selected_ref),
                    batch_format="pyarrow",
                    batch_size=4096,
                )
            else:
                cols = ["url", "html"]
                if is_bucketed(self.pages_path):
                    pages_ds = read_buckets_for(self.pages_path, sel_urls, columns=cols)
                else:
                    pages_ds = ray.data.read_parquet(self.pages_path, columns=cols)
                fetched = pages_ds.map_batches(
                    _fetch_filter,
                    fn_kwargs=dict(selected_ref=selected_ref),
                    batch_format="pyarrow",
                    batch_size=1024,
                )
                links = fetched.map_batches(_discover_batch, batch_format="pyarrow")
            enq = self._enqueue(links)
            enq_is_table = isinstance(enq, pa.Table)
            n_new = enq.num_rows if enq_is_table else enq.count()
            t0 = _tlog(f"wave {wave} fetch+discover+enqueue ({len(sel)} sel, {n_new} new)", t0)

            # additions / enqueue-log / new frontier: tables on the small
            # path, Datasets on the large path (never driver-materialized).
            if enq_is_table:
                additions = (
                    enq.filter(pc.equal(enq.column("blocked"), False)).select(
                        ["url", "host", "depth", "priority"]
                    )
                    if n_new
                    else _EMPTY_FRONTIER
                )
                enq_log = enq.select(["url_hash", "url"]) if n_new else _EMPTY_ENQ
            else:
                def _unblocked(t: pa.Table) -> pa.Table:
                    return t.filter(pc.equal(t.column("blocked"), False)).select(
                        ["url", "host", "depth", "priority"]
                    )

                additions = enq.map_batches(
                    _unblocked, batch_format="pyarrow", zero_copy_batch=True
                )
                enq_log = enq.map_batches(
                    lambda t: t.select(["url_hash", "url"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )

            carry_is_table = isinstance(carry, pa.Table)
            if carry_is_table and enq_is_table:
                new_frontier = pa.concat_tables([carry, additions])
            else:
                carry_ds = carry if not carry_is_table else ray.data.from_arrow(carry)
                adds_ds = (
                    additions
                    if not isinstance(additions, pa.Table)
                    else ray.data.from_arrow(additions)
                )
                new_frontier = carry_ds.union(adds_ds)

            # phase 1 (durable artifacts) BEFORE the shard commit — see
            # _checkpoint_data docstring for the lineage-reconstruction
            # hazard this ordering closes.
            tmp, n_f_out, n_enq = self._checkpoint_data(
                wave, new_frontier, order_t, enq_log
            )
            # ONE RPC round: commit + seen_count + checkpoint blob per shard
            # (was three sequential rounds; the per-wave floor is
            # coordination-round-bound, VERDICT r2 #2)
            cs = _robust_gather(
                [s.commit_snapshot.remote() for s in self.shards],
                lambda i: self.shards[i].commit_snapshot.remote(),
            )
            snaps = [(sc, blob) for _ins, sc, blob in cs]
            t0 = _tlog(f"wave {wave} artifacts+commit", t0)
            metrics = {
                "n_frontier_in": n_frontier,
                "wall_ms": int((time.monotonic() - wave_t0) * 1000),
            }
            if n_carry is not None:
                metrics["n_carryover"] = n_carry
            self._checkpoint_finalize(
                wave, tmp, order_t.num_rows, n_f_out, n_enq, metrics=metrics,
                snaps=snaps,
            )
            _tlog(f"wave {wave} checkpoint", t0)
            # overlap: closed extraction chunks run on a background thread
            # while the next wave's selection/coordination proceeds
            self._overlap_submit(order_t)

        order, enq = self.collect_outputs()
        if self.extract_docs:
            t0 = time.monotonic()
            self._extract_fetched(order)
            _tlog(f"deferred extract ({order.num_rows} pages)", t0)
        return order, enq

    def _extract_fetched(self, order: pa.Table, chunk_urls: Optional[int] = None) -> None:
        """Crawl-and-index: one chunked extraction pass over every fetched
        URL, AFTER the crawl loop.

        Why deferred: per-wave extraction pays pipeline launch + parquet
        write fixed costs every wave and re-reads the selected pages the
        fetch already read — measured ~2 s/wave at bench scale and 0.41
        8->32-CPU efficiency (round-1 verdict).  One pass runs at full
        parallelism with the fixed cost paid once.

        Why chunked: the fetch-filter broadcast must stay budget-bounded
        (never the whole fetch set at 10^10 scale).  Waves are greedily
        coalesced into chunks of <= max(chunk_urls, largest single wave)
        URLs; each chunk is one fetch+extract pipeline whose broadcast is
        O(chunk).  Small crawls coalesce to a single chunk; production
        waves amortize their own pipeline cost.

        Resumable per chunk: chunk output dirs are derived purely from the
        checkpointed order log, written atomically (.tmp + rename), and
        skipped only when their recorded URL-set fingerprint matches — a
        killed run redoes only the in-flight chunk.  The fingerprint guard
        matters for a crawl RESUMED with more waves: greedy chunking is
        prefix-stable except that the final chunk absorbs new waves, so
        that chunk's fingerprint changes and it (alone) is rebuilt; a bare
        directory-exists check would silently skip the new waves.
        """
        import glob as _glob

        if chunk_urls is None:
            chunk_urls = self.extract_chunk_urls
        # join any overlap chunks first: a finished one will be skipped by
        # its fingerprint below; a failed one left no committed part dir and
        # is simply redone sequentially here
        self._join_overlap()

        docs_dir = os.path.join(self.workdir, "docs")
        os.makedirs(docs_dir, exist_ok=True)
        if order.num_rows == 0:
            return

        chunks = self._plan_chunks(order, chunk_urls)

        # drop parts beyond the current chunk count (possible only if
        # chunk_urls changed between runs — stale content must not linger)
        for stale in _glob.glob(os.path.join(docs_dir, "part-*")):
            name = os.path.basename(stale).replace(".tmp", "")
            try:
                idx = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if idx >= len(chunks) or stale.endswith(".tmp"):
                shutil.rmtree(stale, ignore_errors=True)

        for ci, wave_map in enumerate(chunks):
            self._extract_one_chunk(ci, wave_map)

    @staticmethod
    def _plan_chunks(order: pa.Table, chunk_urls: int) -> List[Dict[str, int]]:
        """Greedy wave coalescing into url->wave chunks of <=
        max(chunk_urls, largest single wave) URLs.  Wave ids are contiguous
        per chunk, so membership is deterministic given the order log; the
        plan is PREFIX-STABLE: appending later waves can only change the
        final chunk or append new ones (the overlap path relies on this)."""
        waves = order.column("wave").to_pylist()
        urls = order.column("url").to_pylist()
        by_wave: Dict[int, List[str]] = {}
        for w, u in zip(waves, urls):
            by_wave.setdefault(w, []).append(u)
        chunks: List[Dict[str, int]] = []
        cur: Dict[str, int] = {}
        for w in sorted(by_wave):
            if cur and len(cur) + len(by_wave[w]) > chunk_urls:
                chunks.append(cur)
                cur = {}
            for u in by_wave[w]:
                cur[u] = w
        if cur:
            chunks.append(cur)
        return chunks

    def _extract_one_chunk(self, ci: int, wave_map: Dict[str, int]) -> None:
        """Extract one chunk into docs/part-{ci} (atomic, fingerprint-
        idempotent).  Safe to call from the overlap thread: touches only
        chunk-local state and Ray driver APIs."""
        import json as _json
        from hashlib import blake2b as _blake2b

        from engine.sources.bucketed import is_bucketed, read_buckets_for
        from engine.stages.extract import extract_pages_task

        docs_dir = os.path.join(self.workdir, "docs")
        os.makedirs(docs_dir, exist_ok=True)
        part_dir = os.path.join(docs_dir, f"part-{ci:04d}")
        fp = _blake2b(
            "\n".join(sorted(wave_map)).encode(), digest_size=8
        ).hexdigest()
        meta_path = os.path.join(part_dir, "_chunk.json")
        if os.path.isdir(part_dir):
            try:
                with open(meta_path) as _fh:
                    _meta = _json.load(_fh)
                if _meta["fp"] == fp:
                    return  # resume: chunk already extracted, same URL set
            except (OSError, ValueError, KeyError):
                pass
            shutil.rmtree(part_dir, ignore_errors=True)  # stale/partial
        tmp_dir = part_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ref = ray.put(wave_map)  # url -> wave (doubles as the fetch set)
        cols = ["url", "html", "warc_ts"]
        sel_urls = list(wave_map)
        if is_bucketed(self.extract_src):
            pages_ds = read_buckets_for(self.extract_src, sel_urls, columns=cols)
        else:
            pages_ds = ray.data.read_parquet(self.extract_src, columns=cols)
        fetched = pages_ds.map_batches(
            _fetch_filter,
            fn_kwargs=dict(selected_ref=ref),
            batch_format="pyarrow",
            batch_size=1024,
        )
        docs = fetched.map_batches(
            extract_pages_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=128,
        )

        def add_wave(t: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            w = [m[u] for u in t.column("warc_target_uri").to_pylist()]
            return t.append_column("wave", pa.array(w, pa.int64()))

        docs.map_batches(
            add_wave, batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(tmp_dir)
        with open(os.path.join(tmp_dir, "_chunk.json"), "w") as f:
            _json.dump({"fp": fp, "n_urls": len(wave_map)}, f)
        os.replace(tmp_dir, part_dir)

    # -- overlap: extract closed chunks while later waves crawl -------------
    def _overlap_submit(self, order_t: pa.Table) -> None:
        """Called once per completed wave (after its checkpoint): submit
        every newly CLOSED chunk (all but the plan's final, still-open one)
        to the single background extraction thread.  One worker thread
        bounds resource use and keeps chunk writes serialized."""
        if not self.overlap_extract:
            return
        self._planned_orders.append(order_t)
        plan = self._plan_chunks(
            pa.concat_tables(self._planned_orders), self.extract_chunk_urls
        )
        for ci in range(len(plan) - 1):
            if ci in self._bg_futures:
                continue
            if self._bg_pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._bg_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="crawl-extract"
                )
            self._bg_futures[ci] = self._bg_pool.submit(
                self._extract_one_chunk, ci, plan[ci]
            )

    def _join_overlap(self) -> None:
        """Wait for background chunk extractions; failures are logged and
        left to the sequential pass (their part dir was never committed)."""
        if self._bg_pool is None:
            return
        import logging as _logging

        for ci, fut in sorted(self._bg_futures.items()):
            try:
                fut.result()
            except Exception as exc:  # noqa: BLE001 — redone sequentially
                _logging.getLogger("engine.crawl").warning(
                    "overlapped extraction of chunk %d failed (%s); "
                    "the deferred pass will redo it", ci, exc,
                )
        self._bg_pool.shutdown(wait=True)
        self._bg_pool = None
        self._bg_futures = {}

    def collect_outputs(self) -> Tuple[pa.Table, pa.Table]:
        """Concatenate per-wave order/enqueued logs into the final artifacts.

        NB: materializes the url_seen log — fine for the test/bench scales
        that call it; a 10^10-URL run consumes the per-wave parquet logs
        directly instead of calling this.
        """
        import glob as _glob

        orders, enqs = [], []
        for name in sorted(os.listdir(self.workdir)):
            d = os.path.join(self.workdir, name)
            # exclude half-written .tmp checkpoint dirs left by a crash
            if (name == "seed" or name.startswith("wave_")) and not name.endswith(".tmp"):
                op = os.path.join(d, "order.parquet")
                ep = os.path.join(d, "enqueued.parquet")
                if os.path.exists(op):
                    orders.append(pq.read_table(op))
                if os.path.exists(ep):
                    enqs.append(pq.read_table(ep))
                else:
                    for f in sorted(_glob.glob(os.path.join(d, "enqueued", "*.parquet"))):
                        enqs.append(pq.read_table(f))
        order = pa.concat_tables(orders).sort_by([("seq", "ascending")])
        enq = pa.concat_tables(enqs).sort_by(
            [("url_hash", "ascending"), ("url", "ascending")]
        )
        pq.write_table(order, os.path.join(self.workdir, "crawl_order.parquet"))
        pq.write_table(enq, os.path.join(self.workdir, "url_seen.parquet"))
        return order, enq


_EMPTY_ORDER = pa.table(
    {"wave": pa.array([], pa.int64()), "seq": pa.array([], pa.int64()),
     "url": pa.array([], pa.string()), "host": pa.array([], pa.string())}
)
_EMPTY_ENQ = pa.table(
    {"url_hash": pa.array([], pa.uint64()), "url": pa.array([], pa.string())}
)
_EMPTY_FRONTIER = pa.table(
    {"url": pa.array([], pa.string()), "host": pa.array([], pa.string()),
     "depth": pa.array([], pa.int64()), "priority": pa.array([], pa.float64())}
)
_EMPTY_ENQ_FULL = _EMPTY_FRONTIER.append_column(
    "blocked", pa.array([], pa.bool_())
).append_column("url_hash", pa.array([], pa.uint64()))


def run_crawl(
    pages_path: str,
    seeds_path: str,
    politeness_path: Optional[str],
    workdir: str,
    cfg: CrawlConfig = CrawlConfig(),
    extract_docs: bool = False,
    extract_pages_path: Optional[str] = None,
    extract_chunk_urls: Optional[int] = None,
    overlap_extract: bool = True,
) -> Tuple[pa.Table, pa.Table]:
    """Run (or resume) a crawl; returns (crawl_order, url_seen) tables.

    ``extract_pages_path``: html source for crawl-and-index mode when the
    crawl itself runs over a links layout (see CrawlRun).
    ``overlap_extract``: extract closed chunks concurrently with later
    waves (identical outputs; see CrawlRun.__init__).

    Kills the cuckoo shard actors on exit (their state is checkpointed per
    wave, so nothing is lost; lingering actors would pin memory across many
    crawl invocations in one Ray session).
    """
    run = CrawlRun(
        pages_path,
        seeds_path,
        politeness_path,
        workdir,
        cfg,
        extract_docs=extract_docs,
        extract_pages_path=extract_pages_path,
        extract_chunk_urls=extract_chunk_urls,
        overlap_extract=overlap_extract,
    )
    try:
        return run.run()
    finally:
        run._join_overlap()  # never leak the overlap thread on error paths
        for s in run.shards:
            ray.kill(s)
