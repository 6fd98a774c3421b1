"""Benchmark harness: headline crawl+extract pipeline over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "urls_per_sec": ...}

--scaling: runs INTERLEAVED 8-then-32-CPU child processes on the same
input — three back-to-back (8, 32) pairs within one host window — and
reports the MEDIAN pair efficiency (the sandbox stand-in for N vs 4N
nodes; see BASELINE.md).  Interleaving makes host-side throttling hit
both widths of a pair near-symmetrically, so the raw ratio is meaningful
on its own; the adjacent in-child kernel probes are kept for diagnosis.

--extract-only (internal): child mode that runs just the warmup +
extraction measurement + probe — the fast pair body for --scaling.
--wait-healthy: before measuring, poll the zero-Ray extraction-kernel
probe (8-wide) every 90 s for up to ~1 h and start only once it reaches
95% of the healthy-window reference — scaling efficiency is meaningless
in a window where the bare hardware doesn't scale (BASELINE.md r4).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


TARGET_PAGES = int(os.environ.get("BENCH_TARGET_PAGES", "400000"))

# Healthy-window reference rates for the zero-Ray extraction-kernel probe
# (pages/s per core, by probe width; measured and recorded in BASELINE.md
# r2: 3,820 at 8-wide, 3,043 at 32-wide — all-core frequency scaling).  The
# emitted urls_per_sec_normalized rescales the measured throughput by
# PROBE_REF / probe so cross-round comparisons survive host throttling.
PROBE_REF_BY_WIDTH = {8: 3820.0, 32: 3043.0}


def _probe_ref(width: int) -> float:
    return PROBE_REF_BY_WIDTH[min(PROBE_REF_BY_WIDTH, key=lambda w: abs(w - width))]


def _pages_cache(sf_dir: str) -> str:
    """Synthesize the pages table once per sf_dir (cached in /tmp).

    The documents table is small at every sf, so it is deterministically
    replicated up to ~TARGET_PAGES pages — the benchmark measures the
    pipeline at a meaningful scale, not Ray fixed overheads.
    """
    import pyarrow.parquet as pq

    import fcntl

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    replicate = max(1, TARGET_PAGES // max(n_docs, 1))
    key = f"{sf_dir.strip('/').replace('/', '_')}_r{replicate}"
    out = f"/tmp/bench_pages/{key}"
    marker = os.path.join(out, "_OK")
    # exclusive lock: concurrent bench processes must not race the cache
    # build (check-then-write on a shared /tmp path)
    os.makedirs("/tmp/bench_pages", exist_ok=True)
    lock = open(f"/tmp/bench_pages/.{key}.lock", "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    if os.path.exists(marker):
        fcntl.flock(lock, fcntl.LOCK_UN)
        return out
    import pyarrow as pa
    import ray.data

    from engine.pipelines.testdata_pages import pages_dataset
    from engine.sources.bucketed import bucketize_pages

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    flat = os.path.join(out, "pages")
    pages_dataset(sf_dir, replicate=replicate).write_parquet(flat)
    # scale-path layouts for the crawl fetch join (bucketed link graph)
    from engine.sources.bucketed import bucketize_links

    bucketize_pages(flat, os.path.join(out, "pages_bucketed"), n_buckets=64)
    bucketize_links(flat, os.path.join(out, "links_bucketed"), n_buckets=64)
    # seeds: every ~250th page (spread across hosts and replicas)
    urls = ray.data.read_parquet(flat, columns=["url"]).to_pandas()["url"]
    seeds = sorted(urls[:: max(1, len(urls) // 2000)].tolist())
    pq.write_table(
        pa.table({"url": pa.array(seeds, pa.string())}),
        os.path.join(out, "seeds.parquet"),
    )
    open(marker, "w").write("ok")
    fcntl.flock(lock, fcntl.LOCK_UN)
    return out


def run_bench(extract_only: bool = False) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_tensor_extension_casting = False
    ctx.enable_progress_bars = False

    import ray.data

    from engine.pipelines import queries as q
    from engine.pipelines.crawl import run_crawl
    from engine.pipelines.crawl_common import CrawlConfig
    from engine.pipelines.index_pipeline import extract_dataset

    cache = _pages_cache(SF_DIR)
    pages_path = os.path.join(cache, "pages")

    # warm OS page cache + pre-start Ray worker processes so both scaling
    # runs measure steady-state throughput.  NB: a bare count() is answered
    # from parquet metadata WITHOUT reading data blocks — force real block
    # reads through a map_batches over every layout the bench touches.
    import pyarrow as _pa

    def _touch(t: _pa.Table) -> _pa.Table:
        return _pa.table({"n": _pa.array([t.num_rows], _pa.int64())})

    warm_layouts = (
        (pages_path,)
        if extract_only
        else (pages_path, os.path.join(cache, "links_bucketed"),
              os.path.join(cache, "pages_bucketed"))
    )
    for p in warm_layouts:
        ray.data.read_parquet(p).map_batches(
            _touch, batch_format="pyarrow", zero_copy_batch=True
        ).count()
    extract_dataset(
        ray.data.read_parquet(pages_path).limit(256), concurrency=(1, 2), batch_size=128
    ).count()

    timings: dict = {}
    # clamp: a fixed pool >= session CPUs deadlocks the streaming executor
    pool = min(max(2, int(NUM_CPUS * 0.75)), max(1, NUM_CPUS - 1))

    # --- headline 1: extraction throughput ---------------------------------
    # median-of-3: trial 1 pays actor-pool ramp-up; the median de-noises
    # host interference without the min's optimism (round-2 VERDICT #4 —
    # the driver-visible number must be window-robust)
    out_dir = f"/tmp/bench_out/extract_{NUM_CPUS}"
    trials = []
    for _trial in range(3):
        t0 = time.monotonic()
        ds = ray.data.read_parquet(pages_path)
        ex = extract_dataset(ds, concurrency=pool, batch_size=128)
        shutil.rmtree(out_dir, ignore_errors=True)
        ex.write_parquet(out_dir)
        trials.append(time.monotonic() - t0)
    extract_sec = sorted(trials)[1]
    timings["extract"] = round(extract_sec, 3)
    timings["extract_trials"] = [round(t, 3) for t in trials]
    n_urls = ray.data.read_parquet(out_dir, columns=["uuid"]).count()
    # window probe ADJACENT to the measurement: the REAL extraction kernel
    # via plain multiprocessing (zero Ray) at the same width.  Lets any
    # reader separate an engine regression (urls/s down, probe unchanged)
    # from host throttling (both down together); the normalized number
    # rescales to the documented healthy-window reference rate.
    probe_rate = _probe_extract(min(NUM_CPUS, 32))

    if extract_only:
        ray.shutdown()
        return {
            "metric": "extract_sec",
            "value": round(extract_sec, 3),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "n_urls": n_urls,
            "urls_per_sec": round(n_urls / extract_sec, 1),
            "probe_pages_per_core": round(probe_rate, 1),
        }

    # --- headline 2: frontier scheduling (links layout, 3 waves) -----------
    crawl_cfg = CrawlConfig(
        max_waves=3, default_crawl_delay=0.005, default_max_pages=10**9
    )
    wd = f"/tmp/bench_out/crawl_{NUM_CPUS}"
    shutil.rmtree(wd, ignore_errors=True)
    t0 = time.monotonic()
    order, seen = run_crawl(
        os.path.join(cache, "links_bucketed"),
        os.path.join(cache, "seeds.parquet"),
        None,
        wd,
        crawl_cfg,
    )
    crawl_sec = time.monotonic() - t0
    timings["crawl"] = round(crawl_sec, 3)
    crawl_urls = order.num_rows

    # --- headline 3: integrated crawl-and-index (fetch -> extract) ---------
    # crawl over the pruned links layout (discovery never reads html);
    # the deferred extraction pass reads html from the pages layout once
    wdx = f"/tmp/bench_out/crawlx_{NUM_CPUS}"
    shutil.rmtree(wdx, ignore_errors=True)
    t0 = time.monotonic()
    order_x, _ = run_crawl(
        os.path.join(cache, "links_bucketed"),
        os.path.join(cache, "seeds.parquet"),
        None,
        wdx,
        crawl_cfg,
        extract_docs=True,
        extract_pages_path=os.path.join(cache, "pages_bucketed"),
        # chunk size left at auto: 14k crawl URLs sit far below the
        # pipeline-launch amortization point, so this coalesces to ONE
        # deferred chunk (forcing 2000-URL chunks here cost ~7 underfilled
        # pipeline launches and regressed crawl_extract 5.5 -> 10.0 s in
        # round 4; overlap engages only at production wave sizes)
    )
    timings["crawl_extract"] = round(time.monotonic() - t0, 3)

    # --- representative operator suite -------------------------------------
    def timed(name, fn):
        t = time.monotonic()
        res = fn(SF_DIR)
        if hasattr(res, "materialize"):
            res = res.materialize()
            _ = res.count()
        timings[name] = round(time.monotonic() - t, 3)

    timed("exact_dedup", q.q_exact_dedup)
    timed("token_stats", q.q_token_stats)
    timed("minhash_dedup", q.q_minhash_dedup)
    timed("ann_topk", q.q_ann_topk)
    timed("pricing_summary", q.q_pricing_summary)
    timed("events_window", q.q_events_window)
    timed("surt_hosts", q.q_surt_hosts)
    timed("corpus_filter", q.q_corpus_filter)
    timed("dup_spans", q.q_dup_spans)
    timed("novelty", q.q_novelty)
    timed("quality_classifier", q.q_quality_classifier)
    # round-5 search-parity family: vectorized phrase scan + the
    # two-groupby significant-terms aggregation at corpus scale
    timed("phrase_search", q.q_phrase_search)
    timed("significant_terms", q.q_significant_terms)

    headline = extract_sec + crawl_sec
    result = {
        "metric": "headline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_urls": n_urls,
        "crawl_urls": crawl_urls,
        "urls_per_sec": round(n_urls / extract_sec, 1),
        "probe_pages_per_core": round(probe_rate, 1),
        "probe_ref_pages_per_core": _probe_ref(min(NUM_CPUS, 32)),
        # urls/s rescaled to the healthy-window kernel rate (factor capped
        # at 2x): comparable across rounds regardless of host throttling
        "urls_per_sec_normalized": round(
            n_urls
            / extract_sec
            * min(
                2.0,
                max(
                    0.5,
                    _probe_ref(min(NUM_CPUS, 32)) / max(probe_rate, 1e-9),
                ),
            ),
            1,
        ),
    }
    ray.shutdown()
    return result


def _cpu_burn(n_iter: int) -> float:
    import hashlib
    import time as _t

    t0 = _t.monotonic()
    h = b"x" * 64
    for _ in range(n_iter):
        h = hashlib.blake2b(h, digest_size=32).digest()
    return n_iter / (_t.monotonic() - t0)


_BURN_PAGES = None


def _extract_burn_setup():
    """Pool initializer: synthesize the probe corpus once per process.

    Installs an ORPHAN WATCHDOG first: if the parent dies (e.g. the bench
    is timeout-killed mid-probe), the spawn workers would otherwise
    outlive it and keep burning CPU — measured 2026-08-18: leaked probe
    workers from a killed diagnostic depressed every probe and pipeline
    measurement on the node for hours (PERF.md #27).
    """
    import os
    import threading
    import time as _t

    ppid = os.getppid()

    def _watch():
        while True:
            if os.getppid() != ppid:
                os._exit(0)
            _t.sleep(2.0)

    threading.Thread(target=_watch, daemon=True).start()

    global _BURN_PAGES
    import pyarrow.parquet as pq

    from engine.pipelines.testdata_pages import build_link_maps, synth_pages_batch

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text", "source"])
    lm, i2s = build_link_maps(sf)
    pages = synth_pages_batch(t, lm, i2s)
    _BURN_PAGES = (
        pages.column("url").to_pylist(),
        pages.column("html").to_pylist(),
    )
    from engine.stages.extract import extract_page

    for u, h in zip(*_BURN_PAGES):  # warm code paths / JIT-free but caches
        extract_page(u, h)


def _extract_burn(seconds: float) -> float:
    """Run the REAL extraction kernel for ~seconds; return pages/sec."""
    import time as _t

    from engine.stages.extract import extract_page

    urls, htmls = _BURN_PAGES
    n = 0
    t0 = _t.monotonic()
    while _t.monotonic() - t0 < seconds:
        for u, h in zip(urls, htmls):
            extract_page(u, h)
        n += len(urls)
    return n / (_t.monotonic() - t0)


def _probe_extract(nproc: int) -> float:
    """Per-process pages/sec with nproc concurrent REAL extraction kernels
    (plain multiprocessing, zero Ray).

    SPAWN context, not fork: run_bench calls this after ray.init, and
    fork-children of a Ray-initialized process inherit raylet/grpc threads
    that abort intermittently (observed as BrokenPipeError pool crashes).
    """
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    with ctx.Pool(nproc, initializer=_extract_burn_setup) as p:
        rs = p.map(_extract_burn, [2.0] * nproc)
    return sum(rs) / len(rs)


def hardware_ceiling() -> dict:
    """Per-process throughput ratio at 32 vs 8 processes (no Ray).

    On this virtualized single node, running 4x more processes lowers
    per-core throughput (all-core frequency scaling / memory bandwidth /
    host contention) — a ceiling that applies to ANY 8-vs-32 scaling
    measurement and that a real N-vs-4N-node cluster does not have.  The
    engine-attributable efficiency is measured_eff / this ceiling.

    Two probes, both plain multiprocessing with zero Ray involvement:
    - ``extract``: the REAL per-page extraction kernel (extract_page over
      the synthetic corpus) — the representative ceiling, since it has the
      same instruction/memory mix as the measured pipeline;
    - ``blake2b``: a pure-ALU hash loop, kept for comparison (it
      understates throttling for memory-heavier workloads).

    NB: run_scaling does NOT call this whole-thing — it runs
    ``_probe_extract`` ADJACENT to each same-width measurement so probe
    and measurement share the host's throttling window (measured: the
    window, not the engine, dominates raw efficiency — BASELINE.md).
    """
    import multiprocessing as mp

    out = {}
    ex_rates = {8: _probe_extract(8), 32: _probe_extract(32)}
    out["extract"] = ex_rates[32] / ex_rates[8]
    out["extract_pages_per_core_8"] = round(ex_rates[8], 1)
    out["extract_pages_per_core_32"] = round(ex_rates[32], 1)
    bl_rates = {}
    for nproc in (8, 32):
        with mp.Pool(nproc) as p:
            rs = p.map(_cpu_burn, [300_000] * nproc)
        bl_rates[nproc] = sum(rs) / len(rs)
    out["blake2b"] = bl_rates[32] / bl_rates[8]
    return out


def run_scaling() -> dict:
    """Interleaved 8-vs-32 scaling measurement (round-3 VERDICT #1).

    Three back-to-back (8-CPU, 32-CPU) child pairs run within one host
    window: two fast --extract-only pairs, then one full-bench pair (which
    also supplies the crawl / integrated numbers).  Host throttling drifts
    on minute scales here, so the two widths of a pair see near-identical
    conditions and the RAW pair ratio is meaningful by itself; the median
    over pairs rejects a window boundary landing inside one pair.  Each
    child still runs the zero-Ray extraction-kernel probe adjacent to its
    own measurement, so a probe-vs-pipeline disagreement inside any single
    pair remains diagnosable (per-pair probes are emitted verbatim).
    """

    def one(ncpu: int, extract_only: bool) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        args = [sys.executable, os.path.join(REPO, "bench.py")]
        if extract_only:
            args.append("--extract-only")
        proc = subprocess.run(args, env=env, capture_output=True, text=True)
        if proc.returncode != 0:
            # surface the child's failure instead of a bare CalledProcessError
            sys.stderr.write(
                f"--- bench child (ncpu={ncpu}) failed rc={proc.returncode}; "
                f"stderr tail ---\n" + "\n".join(proc.stderr.splitlines()[-40:]) + "\n"
            )
            raise RuntimeError(f"bench child at ncpu={ncpu} failed")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    pairs = []
    full_lo = full_hi = None
    for pair_idx in range(3):
        extract_only = pair_idx < 2
        lo = one(8, extract_only)
        hi = one(32, extract_only)
        if not extract_only:
            full_lo, full_hi = lo, hi
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (32 / 8)
        ceiling = hi["probe_pages_per_core"] / lo["probe_pages_per_core"]
        pairs.append(
            {
                "raw_efficiency": round(eff, 3),
                "hardware_ceiling": round(ceiling, 3),
                "normalized_efficiency": round(min(1.0, eff / ceiling), 3),
                "urls_per_sec_8": lo["urls_per_sec"],
                "urls_per_sec_32": hi["urls_per_sec"],
                "probe_pages_per_core_8": lo["probe_pages_per_core"],
                "probe_pages_per_core_32": hi["probe_pages_per_core"],
                "extract_sec_8": lo["queries"]["extract"],
                "extract_sec_32": hi["queries"]["extract"],
            }
        )

    def med(key: str) -> float:
        return sorted(p[key] for p in pairs)[len(pairs) // 2]

    # primary scaling criterion: extraction THROUGHPUT (urls/sec) ratio —
    # the compute-bound phase.  Per-wave crawl coordination (~1s/wave) is a
    # constant independent of cluster size and is reported separately; see
    # BASELINE.md for the analysis.
    eff_headline = (full_lo["value"] / full_hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": med("raw_efficiency"),  # median of interleaved pairs, RAW
        "unit": "ratio",
        "pairs": pairs,
        "headline_efficiency": round(eff_headline, 3),
        # per-process probe ratio at 32 vs 8 procs (no Ray): the hardware's
        # own ceiling for this measurement on a shared node, from the REAL
        # extraction kernel run adjacent to each child's measurement.
        "hardware_ceiling": med("hardware_ceiling"),
        "engine_efficiency_normalized": med("normalized_efficiency"),
        # per-core rates separate engine scaling from host-level effects
        # (virtualized CPU burst at low parallelism): equal per-core rates
        # == linear engine scaling regardless of the wall-clock ratio.
        "urls_per_core_8": round(med("urls_per_sec_8") / 8, 1),
        "urls_per_core_32": round(med("urls_per_sec_32") / 32, 1),
        "sec_8": full_lo["value"],
        "sec_32": full_hi["value"],
        "urls_per_sec_8": full_lo["urls_per_sec"],
        "urls_per_sec_32": full_hi["urls_per_sec"],
        "crawl_sec_8": full_lo["queries"]["crawl"],
        "crawl_sec_32": full_hi["queries"]["crawl"],
        "crawl_extract_sec_8": full_lo["queries"].get("crawl_extract"),
        "crawl_extract_sec_32": full_hi["queries"].get("crawl_extract"),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    # hang safety: if anything wedges (e.g. a stray half-dead GCS from an
    # earlier session), dump all thread stacks to stderr and exit non-zero
    # instead of hanging the caller forever
    import faulthandler
    import signal

    # kill -USR1 <pid> dumps all thread stacks to stderr (hang forensics)
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    if "--wait-healthy" in sys.argv:
        # scaling efficiency is only meaningful in a window where the
        # hardware itself scales (BASELINE.md round-4 diagnosis: the host
        # swings 2x within minutes).  Probe the bare extraction kernel at
        # 8-wide every 90 s (up to ~1 h) and start only once it reaches
        # 95% of the healthy-window reference — otherwise proceed anyway
        # and let the per-pair probes annotate the throttling.
        # Two conditions, both from back-to-back zero-Ray kernel probes:
        # (a) absolute health — the 32-wide probe at >= 95% of the healthy
        #     reference (the node isn't throttled); and
        # (b) ratio health — probe32/probe8 per-core >= 0.85 (the node
        #     isn't BOOSTING 8-wide runs, which caps the raw 8-vs-32 ratio
        #     below 0.8 no matter what the engine does; observed 8-wide
        #     boost windows hit per-core ratios of 0.61-0.68).
        target32 = 0.95 * _probe_ref(32)
        for _ in range(40):
            r8 = _probe_extract(8)
            r32 = _probe_extract(32)
            ratio = r32 / r8
            print(
                f"# wait-healthy: probe8={r8:.0f} probe32={r32:.0f} "
                f"ratio={ratio:.3f} (need >=0.85 and probe32>={target32:.0f})",
                file=sys.stderr,
            )
            if r32 >= target32 and ratio >= 0.85:
                break
            time.sleep(90)
    # hang safety AFTER any gate loop (the gate can legitimately poll for
    # up to an hour — arming the watchdog before it killed a gated scaling
    # run mid-measurement); budget sized to the mode's real runtime
    faulthandler.dump_traceback_later(
        1800 if "--scaling" in sys.argv else 1500, exit=True
    )
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench(extract_only="--extract-only" in sys.argv)))
