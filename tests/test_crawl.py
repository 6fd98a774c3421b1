"""Crawl conformance (SURVEY.md §5 layers 5-6, north_rule):

- distributed crawl order + URL-seen set == single-threaded scheduler oracle
- resume from checkpoint continues identically, without re-fetching
- cuckoo filter determinism under the wave-commit protocol
"""

import os

import pyarrow as pa
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from engine.pipelines.crawl_common import CrawlConfig
from engine.pipelines.crawl_oracle import crawl_oracle
from engine.state.cuckoo import CuckooFilter, ShardedSeenSet

CFG = CrawlConfig(max_waves=3)


@pytest.fixture(scope="module")
def oracle_result(fixture_dir):
    return crawl_oracle(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        CFG,
    )


def test_oracle_sane(oracle_result, fixture_dir):
    order, seen = oracle_result
    assert order.num_rows > 50
    assert seen.num_rows >= order.num_rows
    seqs = order.column("seq").to_pylist()
    assert seqs == list(range(len(seqs)))  # dense, strictly increasing
    # politeness: per (wave, host) counts within budget
    import collections

    pol = pq.read_table(os.path.join(fixture_dir, "politeness.parquet"))
    delays = dict(zip(pol.column("host").to_pylist(), pol.column("crawl_delay").to_pylist()))
    per = collections.Counter(
        zip(order.column("wave").to_pylist(), order.column("host").to_pylist())
    )
    for (w, h), n in per.items():
        cap = max(1, int(CFG.wave_seconds // delays.get(h, CFG.default_crawl_delay)))
        assert n <= cap, f"host {h} over budget in wave {w}: {n} > {cap}"
    # robots: no /private URLs fetched from disallowed hosts
    dis = {
        h for h, d in zip(pol.column("host").to_pylist(), pol.column("disallow").to_pylist()) if d
    }
    for u, h in zip(order.column("url").to_pylist(), order.column("host").to_pylist()):
        if h in dis:
            assert "/private" not in u


@pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver-path", "distributed-path"])
def test_distributed_matches_oracle(ray_session, fixture_dir, oracle_result, tmp_path, threshold):
    """Both the driver small-wave fast path and the fully distributed
    groupby path must reproduce the oracle exactly."""
    from dataclasses import replace

    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / f"crawl_wd_{threshold}")
    d_order, d_seen = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        replace(CFG, driver_small_wave_threshold=threshold),
    )
    o_order, o_seen = oracle_result
    assert d_order.equals(o_order), "crawl order differs from oracle"
    assert d_seen.equals(o_seen), "URL-seen set differs from oracle"
    # per-wave lineage/metrics rows exist and are sane
    m = pq.read_table(os.path.join(wd, "wave_0000", "metrics.parquet")).to_pydict()
    assert m["n_selected"][0] > 0
    assert m["wall_ms"][0] >= 0
    assert m["seen_total"][0] >= m["n_selected"][0]


def test_crawl_with_extraction(ray_session, fixture_dir, oracle_result, tmp_path):
    """extract_docs mode: same crawl result + extracted docs (deferred
    chunked pass, wave column per row) whose text matches the fixture
    oracle column."""
    import pyarrow.parquet as pq
    import glob as _glob

    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / "crawlx_wd")
    d_order, d_seen = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        CFG,
        extract_docs=True,
    )
    o_order, o_seen = oracle_result
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)

    doc_files = _glob.glob(os.path.join(wd, "docs", "part-*", "*.parquet"))
    assert doc_files
    fixture = pq.read_table(os.path.join(fixture_dir, "pages.parquet"), columns=["url", "text"])
    exp = {}
    for u, t in zip(fixture.column("url").to_pylist(), fixture.column("text").to_pylist()):
        exp.setdefault(u, t)
    docs = pa.concat_tables([pq.read_table(f) for f in doc_files])
    n_checked = 0
    for u, body, skip in zip(
        docs.column("warc_target_uri").to_pylist(),
        docs.column("body").to_pylist(),
        docs.column("skip_reason").to_pylist(),
    ):
        if skip is None:
            assert body == exp[u]
            n_checked += 1
    assert n_checked > 20
    # extracted docs cover exactly the fetched URLs present in the pages table
    assert docs.num_rows <= d_order.num_rows
    # the wave column matches the crawl order's wave per url
    wave_by_url = dict(
        zip(d_order.column("url").to_pylist(), d_order.column("wave").to_pylist())
    )
    for u, w in zip(
        docs.column("warc_target_uri").to_pylist(), docs.column("wave").to_pylist()
    ):
        assert w == wave_by_url[u]


def test_links_layout_matches_oracle(ray_session, fixture_dir, oracle_result, tmp_path):
    """Crawling the pre-derived bucketed link graph (scale path) must give
    the same order + seen set as parsing HTML per wave."""
    from engine.pipelines.crawl import run_crawl
    from engine.sources.bucketed import bucketize_links

    links_dir = str(tmp_path / "links_bucketed")
    bucketize_links(os.path.join(fixture_dir, "pages.parquet"), links_dir, n_buckets=16)
    d_order, d_seen = run_crawl(
        links_dir,
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        str(tmp_path / "links_wd"),
        CFG,
    )
    o_order, o_seen = oracle_result
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)


def test_resume_no_refetch(ray_session, fixture_dir, tmp_path):
    """Kill after wave 1, restart: final outputs identical, waves 0-1 not
    re-executed (their checkpoint files are byte-identical)."""
    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / "resume_wd")
    cfg_short = CrawlConfig(max_waves=2)
    run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        cfg_short,
    )
    frozen = {}
    for w in ("seed", "wave_0000", "wave_0001"):
        p = os.path.join(wd, w, "order.parquet")
        if os.path.exists(p):
            frozen[w] = open(p, "rb").read()

    d_order, d_seen = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        CFG,  # max_waves=3: resumes at wave 2
    )
    for w, blob in frozen.items():
        assert open(os.path.join(wd, w, "order.parquet"), "rb").read() == blob, (
            f"{w} was re-executed on resume"
        )
    o_order, o_seen = crawl_oracle(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        CFG,
    )
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)


def test_resume_distributed_frontier(ray_session, fixture_dir, oracle_result, tmp_path):
    """Resume works when checkpointed frontiers are distributed parquet
    DIRECTORIES (forced large-wave path), and still matches the oracle."""
    from dataclasses import replace

    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / "dist_resume_wd")
    cfg_dist = replace(CFG, driver_small_wave_threshold=0)
    run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        replace(cfg_dist, max_waves=2),
    )
    assert os.path.isdir(os.path.join(wd, "wave_0001", "frontier")), (
        "expected directory-form frontier checkpoint on the distributed path"
    )
    d_order, d_seen = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        cfg_dist,  # resumes at wave 2
    )
    o_order, o_seen = oracle_result
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)


def test_duplicate_canonical_urls_union_semantics(ray_session, tmp_path):
    """Rows whose raw URLs canonicalize to the same URL but carry DIFFERENT
    links: engine and oracle must both take the union of their links."""
    from engine.pipelines.crawl import run_crawl

    filler = "word " * 60
    def page(links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return f"<html><body>{body}<p>{filler}</p></body></html>".encode()

    rows = [
        ("http://dup.test/x", page(["http://dup.test/a"])),
        ("http://DUP.test//x", page(["http://dup.test/b"])),  # same canonical
        ("http://dup.test/a", page([])),
        ("http://dup.test/b", page([])),
    ]
    pages = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([None] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([None] * len(rows), pa.string()),
            "lang": pa.array([None] * len(rows), pa.string()),
        }
    )
    pages_path = str(tmp_path / "dup_pages.parquet")
    pq.write_table(pages, pages_path)
    seeds_path = str(tmp_path / "dup_seeds.parquet")
    pq.write_table(pa.table({"url": pa.array(["http://dup.test/x"], pa.string())}), seeds_path)

    cfg = CrawlConfig(max_waves=3, default_max_pages=100)
    o_order, o_seen = crawl_oracle(pages_path, seeds_path, None, cfg)
    d_order, d_seen = run_crawl(pages_path, seeds_path, None, str(tmp_path / "dup_wd"), cfg)
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)
    # both copies' links were discovered
    fetched = set(o_order.column("url").to_pylist())
    assert {"http://dup.test/a", "http://dup.test/b"} <= fetched


def test_max_pages_budget_exhaustion(ray_session, fixture_dir, tmp_path):
    """A host's total max_pages budget caps its fetches across ALL waves."""
    import pyarrow as _pa

    from engine.pipelines.crawl import run_crawl
    from engine.pipelines.crawl_oracle import crawl_oracle

    # politeness: tiny total budget for every host
    pol = pq.read_table(os.path.join(fixture_dir, "politeness.parquet"))
    tiny = _pa.table(
        {
            "host": pol.column("host"),
            "crawl_delay": _pa.array([1.0] * pol.num_rows, _pa.float64()),
            "max_pages": _pa.array([3] * pol.num_rows, _pa.int64()),
            "disallow": pol.column("disallow"),
        }
    )
    pol_path = str(tmp_path / "tiny_politeness.parquet")
    pq.write_table(tiny, pol_path)
    cfg = CrawlConfig(max_waves=6)
    o_order, _ = crawl_oracle(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        pol_path,
        cfg,
    )
    d_order, _ = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        pol_path,
        str(tmp_path / "budget_wd"),
        cfg,
    )
    assert d_order.equals(o_order)
    import collections

    per_host = collections.Counter(d_order.column("host").to_pylist())
    assert per_host and all(n <= 3 for n in per_host.values()), per_host


# ---- cuckoo unit tests ----------------------------------------------------

def test_cuckoo_basic():
    f = CuckooFilter(capacity=4096)
    hashes = np.random.RandomState(7).randint(0, 2**63, size=2000, dtype=np.int64).astype(np.uint64)
    f.stage(hashes)
    assert f.commit() == len(set(hashes.tolist()))
    assert f.contains_many(hashes).all()
    other = np.random.RandomState(8).randint(0, 2**63, size=2000, dtype=np.int64).astype(np.uint64)
    fresh = np.setdiff1d(other, hashes)
    fp_rate = f.contains_many(fresh).mean()
    assert fp_rate < 0.01, f"false-positive rate too high: {fp_rate}"


def test_cuckoo_state_order_independent():
    """Same committed set via different wave partitions -> same answers."""
    rs = np.random.RandomState(11)
    hashes = rs.randint(0, 2**63, size=3000, dtype=np.int64).astype(np.uint64)
    probe = rs.randint(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)

    a = ShardedSeenSet(4, 4096)
    a.stage(hashes)
    a.commit()

    b = ShardedSeenSet(4, 4096)
    b.stage(hashes[::2])
    b.stage(hashes[1::2])
    b.commit()

    assert (a.contains_many(probe) == b.contains_many(probe)).all()
    assert a.contains_many(hashes).all() and b.contains_many(hashes).all()


def test_cuckoo_checkpoint_roundtrip():
    f = CuckooFilter(capacity=2048)
    h = np.arange(1, 1500, dtype=np.uint64) * np.uint64(2654435761)
    f.stage(h)
    f.commit()
    g = CuckooFilter.from_bytes(f.to_bytes())
    probe = np.arange(1, 5000, dtype=np.uint64) * np.uint64(40503)
    assert (f.contains_many(probe) == g.contains_many(probe)).all()
    assert g.count == f.count


def test_cuckoo_shard_aligned_hashes_low_overflow():
    """Regression: shard routing (h % S) must not alias bucket indexing —
    shard-aligned hashes previously hit only 1/S of buckets as i1 (33x
    overflow blowup)."""
    rs = np.random.RandomState(5)
    base = rs.randint(0, 2**59, size=60000, dtype=np.int64).astype(np.uint64)
    aligned = (base * np.uint64(16)) + np.uint64(3)  # all ≡ 3 (mod 16)
    f = CuckooFilter(1 << 16)
    f.stage(aligned)
    f.commit()
    assert f.contains_many(aligned).all()
    assert len(f.overflow) < 600, f"overflow blowup: {len(f.overflow)}"


def test_deferred_extraction_chunk_resume(ray_session, fixture_dir, tmp_path):
    """Deferred extraction is resumable per chunk: existing part dirs are
    skipped (idempotent), a deleted part is rebuilt identically, and tiny
    chunk budgets (multiple chunks) give the same docs as one chunk."""
    import glob as _glob
    import pyarrow.parquet as pq

    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / "wd")
    order, _ = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        CFG,
        extract_docs=True,
    )
    files = sorted(_glob.glob(os.path.join(wd, "docs", "part-*", "*.parquet")))
    assert files
    before = pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
        "warc_target_uri"
    )

    # re-run extraction directly: all chunks present -> nothing rewritten
    from engine.pipelines.crawl import CrawlRun

    run = CrawlRun(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        CFG,
        extract_docs=True,
    )
    try:
        mtimes = {f: os.path.getmtime(f) for f in files}
        run._extract_fetched(order)
        assert {f: os.path.getmtime(f) for f in files} == mtimes

        # tiny chunk budget -> many chunks -> same rows
        import shutil as _shutil

        _shutil.rmtree(os.path.join(wd, "docs"))
        run._extract_fetched(order, chunk_urls=7)
        parts = sorted(_glob.glob(os.path.join(wd, "docs", "part-*")))
        assert len(parts) > 1
        files2 = sorted(_glob.glob(os.path.join(wd, "docs", "part-*", "*.parquet")))
        after = pa.concat_tables([pq.read_table(f) for f in files2]).sort_by(
            "warc_target_uri"
        )
        assert after.equals(before)
    finally:
        import ray as _ray

        for s in run.shards:
            _ray.kill(s)


def test_overlapped_extraction_identical_to_sequential(ray_session, fixture_dir, tmp_path):
    """Overlapped (background-thread) chunk extraction produces the exact
    same docs as the purely deferred pass: tiny chunk budget forces
    multiple chunks so earlier waves' chunks actually run DURING the crawl
    loop, and the outputs must still match row-for-row."""
    import glob as _glob

    from engine.pipelines.crawl import run_crawl

    args = (
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
    )

    def docs_of(wd):
        files = sorted(_glob.glob(os.path.join(wd, "docs", "part-*", "*.parquet")))
        assert files
        return pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
            "warc_target_uri"
        )

    wd_seq = str(tmp_path / "seq")
    run_crawl(*args, wd_seq, CFG, extract_docs=True,
              extract_chunk_urls=7, overlap_extract=False)
    wd_ovl = str(tmp_path / "ovl")
    run_crawl(*args, wd_ovl, CFG, extract_docs=True,
              extract_chunk_urls=7, overlap_extract=True)
    # same multi-chunk layout, identical rows
    assert (
        sorted(os.path.basename(p)
               for p in _glob.glob(os.path.join(wd_ovl, "docs", "part-*")))
        == sorted(os.path.basename(p)
                  for p in _glob.glob(os.path.join(wd_seq, "docs", "part-*")))
    )
    assert len(_glob.glob(os.path.join(wd_ovl, "docs", "part-*"))) > 1
    assert docs_of(wd_ovl).equals(docs_of(wd_seq))


def test_extract_chunk_autosize_coalesces_small_crawl(ray_session, fixture_dir, tmp_path):
    """Default (auto) chunk sizing floors the chunk at the pipeline-launch
    amortization point (~2 s of extraction work), so a small crawl
    coalesces to ONE deferred chunk — no underfilled pipeline launches
    (the round-4 crawl_extract regression)."""
    import glob as _glob

    from engine.pipelines.crawl import (
        _EXTRACT_AMORTIZE_SEC,
        _EXTRACT_PAGES_PER_SEC_PER_CPU,
        run_crawl,
    )

    wd = str(tmp_path / "auto")
    order, _ = run_crawl(
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
        CFG,
        extract_docs=True,  # extract_chunk_urls left at auto
    )
    # the fixture crawl is far below the floor (>= 2 s of work even at
    # the test session's 4 CPUs)
    assert order.num_rows < _EXTRACT_AMORTIZE_SEC * _EXTRACT_PAGES_PER_SEC_PER_CPU * 4
    parts = _glob.glob(os.path.join(wd, "docs", "part-*"))
    assert len(parts) == 1, f"expected one coalesced chunk, got {sorted(parts)}"


def test_deferred_extraction_resume_with_more_waves(ray_session, fixture_dir, tmp_path):
    """A crawl resumed with a larger max_waves regrows the final chunk;
    the fingerprint guard must rebuild it (a bare exists-check would
    silently skip the new waves' documents)."""
    import glob as _glob
    import pyarrow.parquet as pq

    from engine.pipelines.crawl import run_crawl

    wd = str(tmp_path / "wd")
    args = (
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
        wd,
    )
    run_crawl(*args, CrawlConfig(max_waves=2), extract_docs=True)
    order3, _ = run_crawl(*args, CFG, extract_docs=True)  # resume to 3 waves

    files = sorted(_glob.glob(os.path.join(wd, "docs", "part-*", "*.parquet")))
    docs = pa.concat_tables([pq.read_table(f) for f in files])
    # docs must cover every fetched URL present in the pages table,
    # including wave-2 fetches that only exist in the resumed run
    fetched = set(docs.column("warc_target_uri").to_pylist())
    pages_urls = set(
        pq.read_table(os.path.join(fixture_dir, "pages.parquet"), columns=["url"])
        .column("url").to_pylist()
    )
    expected = {
        u for u in order3.column("url").to_pylist() if u in pages_urls
    }
    assert fetched == expected
    assert 2 in set(docs.column("wave").to_pylist())


def test_robust_gather_resubmits_and_orders(ray_session):
    """_robust_gather returns results in slot order and recovers lost
    submissions by resubmitting (idempotent RPC contract)."""
    import ray as _ray

    from engine.pipelines.crawl import _robust_gather

    @_ray.remote
    class Echo:
        def __init__(self):
            self.calls = 0

        def val(self, x):
            self.calls += 1
            return x * 10

        def n_calls(self):
            return self.calls

    actors = [Echo.remote() for _ in range(4)]
    futs = [a.val.remote(i) for i, a in enumerate(actors)]
    out = _robust_gather(futs, lambda i: actors[i].val.remote(i))
    assert out == [0, 10, 20, 30]

    # a never-resolving slot: resubmission path fires, then times out loudly
    @_ray.remote
    class Stuck:
        def val(self, x):
            import time as _t

            _t.sleep(3600)

    stuck = Stuck.remote()
    calls_before = _ray.get(actors[0].n_calls.remote())
    futs = [actors[0].val.remote(7), stuck.val.remote(1)]
    import pytest as _pytest

    with _pytest.raises(TimeoutError):
        _robust_gather(
            futs,
            lambda i: (actors[0].val.remote(7) if i == 0 else stuck.val.remote(1)),
            timeout=0.5,
            attempts=2,
        )
    # the healthy slot resolved on the first round and was NEVER
    # resubmitted (exactly one extra call); only the stuck slot retried
    assert _ray.get(actors[0].n_calls.remote()) == calls_before + 1


@pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver-path", "distributed-path"])
def test_domain_scope_matches_oracle(ray_session, fixture_dir, tmp_path, threshold):
    """politeness_scope="domain": budgets/rules/robots resolve per
    registrable domain (eTLD+1) instead of per raw host — both engine
    paths must reproduce the oracle bit-for-bit, and the schedule must
    actually DIFFER from host scope (shared-owner folding is real)."""
    from dataclasses import replace

    from engine.pipelines.crawl import run_crawl
    from engine.stages.domains import registrable_domain

    cfg = CrawlConfig(
        max_waves=3, politeness_scope="domain", driver_small_wave_threshold=threshold
    )
    args = (
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        None,  # default rules: one 6-page/wave budget PER DOMAIN
    )
    o_order, o_seen = crawl_oracle(*args, cfg)
    d_order, d_seen = run_crawl(
        *args, str(tmp_path / f"dom_wd_{threshold}"), cfg
    )
    assert d_order.equals(o_order), "domain-scope crawl order differs from oracle"
    assert d_seen.equals(o_seen), "domain-scope seen set differs from oracle"
    # budget enforced at the DOMAIN level: <= cap fetches per (wave, domain)
    import collections

    cap = max(1, int(cfg.wave_seconds // cfg.default_crawl_delay))
    per = collections.Counter(
        (w, registrable_domain(h))
        for w, h in zip(
            o_order.column("wave").to_pylist(), o_order.column("host").to_pylist()
        )
    )
    assert per and all(n <= cap for n in per.values()), per
    # the fixture has multiple hosts per registrable domain, so folding
    # must change the schedule vs host scope
    host_cfg = replace(cfg, politeness_scope="host")
    h_order, _ = crawl_oracle(*args, host_cfg)
    assert not h_order.equals(o_order), "domain scope had no effect on this fixture"


@pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver-path", "distributed-path"])
def test_inlinks_priority_matches_oracle(ray_session, fixture_dir, tmp_path, threshold):
    """priority_mode="inlinks": frontier priority gains a capped bonus per
    discovering emission — both engine paths must reproduce the oracle
    bit-for-bit, and the schedule must differ from depth mode (the link
    graph has shared targets, so multiplicities exist)."""
    cfg = CrawlConfig(
        max_waves=3, priority_mode="inlinks", driver_small_wave_threshold=threshold
    )
    from engine.pipelines.crawl import run_crawl

    args = (
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
    )
    o_order, o_seen = crawl_oracle(*args, cfg)
    d_order, d_seen = run_crawl(*args, str(tmp_path / f"inl_wd_{threshold}"), cfg)
    assert d_order.equals(o_order), "inlinks-priority crawl order differs from oracle"
    assert d_seen.equals(o_seen), "inlinks-priority seen set differs from oracle"
    # the mode must actually change the schedule on this fixture
    base_order, _ = crawl_oracle(*args, CrawlConfig(max_waves=3))
    assert not base_order.equals(o_order), "inlinks mode had no effect"


def test_combined_domain_inlinks_matches_oracle(ray_session, fixture_dir, tmp_path):
    """Both scheduler options together (domain-scoped budgets + inlink
    priority) still reproduce the oracle exactly — the options compose."""
    from engine.pipelines.crawl import run_crawl

    cfg = CrawlConfig(
        max_waves=3, politeness_scope="domain", priority_mode="inlinks"
    )
    args = (
        os.path.join(fixture_dir, "pages.parquet"),
        os.path.join(fixture_dir, "seeds.parquet"),
        os.path.join(fixture_dir, "politeness.parquet"),
    )
    o_order, o_seen = crawl_oracle(*args, cfg)
    d_order, d_seen = run_crawl(*args, str(tmp_path / "combo_wd"), cfg)
    assert d_order.equals(o_order)
    assert d_seen.equals(o_seen)
