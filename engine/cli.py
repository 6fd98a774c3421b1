"""Command-line surface mirroring the reference's ``chatnoir-index`` CLI
(/root/reference/warc_indexer/index.py:45-282) on argparse (click is not a
guaranteed dependency here; the subcommand surface is preserved):

  index            pages Parquet -> extracted meta/data tables (resumable)
  prepare-lookups  rank text files -> lookup Parquet (replaces Redis)
  index-setup      validate config, emit output schemas + scaffolding
  crawl            frontier crawl over a pages/links table
  clean            remove a checkpoint/output directory
  filter           composed C4/CCNet cleaning-chain verdicts
  export           sharded training export + round-trip manifest
  stats            corpus profiling report (size/langs/quantiles/dedup/terms)
  build-corpus     full corpus build: filter -> dedup -> mixture -> pack -> shards
  parse-robots     robots.txt corpus -> politeness parquet
  cdx              .warc.gz shards -> sorted CDX parquet (random-access index)
  search           BM25 top-k over a docs table, with snippets and facets
  query            run a JSON search-DSL clause (bool/phrase/fuzzy/regexp/match/dis_max/multi_match/span_near)

Run under a Ray job:  ray job submit -- python -m engine.cli index ...
Owns its own Ray session (guarded init; the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


_OWNS_SESSION = False


def _ray_session(num_cpus: int | None):
    global _OWNS_SESSION
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        _OWNS_SESSION = True
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False
    return ray


def _shutdown(ray=None) -> None:
    """Shut down only a session this CLI started — never a caller's (e.g.
    the pytest session fixture's)."""
    global _OWNS_SESSION
    if _OWNS_SESSION:
        if ray is None:
            import ray
        ray.shutdown()
        _OWNS_SESSION = False


def cmd_index(args) -> int:
    ray = _ray_session(args.num_cpus)
    from engine.pipelines.index_pipeline import run_index_pipeline_resumable

    t0 = time.monotonic()
    if args.dry_run:
        # reference --dry-run (es_sink.py:137-138,149-151): run the full
        # pipeline, write nothing, report what WOULD be indexed.
        import pyarrow.compute as pc
        import ray.data

        from engine.pipelines.index_pipeline import extract_dataset

        ex = extract_dataset(ray.data.read_parquet(args.pages), lookup_path=args.lookups)
        counts = (
            ex.map_batches(
                lambda t: t.select(["skip_reason"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()["skip_reason"]
            .value_counts(dropna=False)
        )
        total = int(counts.sum())
        skipped = int(counts[counts.index.notna()].sum())
        print(f"DRY RUN — would index {total - skipped} of {total} docs")
        print(counts.to_string())
        print(f"Time taken: {time.monotonic() - t0:.2f}s")
        _shutdown(ray)
        return 0
    out = run_index_pipeline_resumable(
        args.pages,
        args.out,
        doc_id_prefix=args.id_prefix,
        lookup_path=args.lookups,
        always_index_meta=args.always_index_meta,
        files_per_partition=args.files_per_partition,
        concurrency=(1, max(2, (args.num_cpus or os.cpu_count() or 4) * 3 // 4)),
    )
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {out}")
    _shutdown(ray)
    return 0


def cmd_prepare_lookups(args) -> int:
    ray = _ray_session(args.num_cpus)
    from engine.stages.lookups import prepare_lookups

    t0 = time.monotonic()
    out = prepare_lookups(
        args.out, args.id_prefix,
        spam_ranks_path=args.spam_ranks, page_ranks_path=args.page_ranks,
    )
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {out}")
    _shutdown(ray)
    return 0


def cmd_index_setup(args) -> int:
    """Driver-only like the reference index-setup (index.py:54-80): create
    output scaffolding and write the table schemas as JSON."""
    from engine import schema

    os.makedirs(args.out, exist_ok=True)
    schemas = {
        "meta": {f.name: str(f.type) for f in schema.META},
        "data": {f.name: str(f.type) for f in schema.DATA},
        "frontier": {f.name: str(f.type) for f in schema.FRONTIER},
        "manifest": {f.name: str(f.type) for f in schema.MANIFEST},
        # the reference's index-contract surface (conf/data_index.py:2-9,
        # 68-377): analyzer language set + _source-exclusion analog
        "index_contract": schema.index_contract(),
    }
    path = os.path.join(args.out, "_schema.json")
    with open(path, "w") as f:
        json.dump(schemas, f, indent=2)
    print(f"wrote {path}")
    return 0


def cmd_filter(args) -> int:
    """Run the composed C4/CCNet-style cleaning chain over a documents
    parquet: write per-doc verdicts, print the status rollup."""
    ray = _ray_session(args.num_cpus)
    import ray.data

    from engine.stages.filter_pipeline import corpus_filter, filter_report

    t0 = time.monotonic()
    ds = ray.data.read_parquet(args.docs, columns=[args.id_col, args.text_col])
    verdicts = corpus_filter(ds, id_col=args.id_col, text_col=args.text_col)
    shutil.rmtree(args.out, ignore_errors=True)
    verdicts.write_parquet(args.out)
    report = filter_report(ray.data.read_parquet(args.out, columns=["status"]))
    for status in sorted(report):
        print(f"{status:12s} {report[status]}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {args.out}")
    _shutdown(ray)
    return 0


def cmd_export(args) -> int:
    """Sharded training export: hash-assigned parquet shards + manifest."""
    ray = _ray_session(args.num_cpus)
    import ray.data

    from engine.stages.export import export_shards

    t0 = time.monotonic()
    ds = ray.data.read_parquet(args.docs)
    manifest = export_shards(
        ds, id_col=args.id_col, out_dir=args.out, n_shards=args.n_shards
    ).to_pandas().sort_values("shard")
    total = int(manifest["n_rows"].sum())
    print(manifest.to_string(index=False))
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {total} rows in "
          f"{len(manifest)} shards under {args.out}")
    _shutdown(ray)
    return 0


def cmd_stats(args) -> int:
    """Corpus profiling report: size/language/quality/dedup overview in
    one command (the 'what is in this crawl' question), composed from the
    same operators the driver queries verify."""
    ray = _ray_session(args.num_cpus)
    import ray.data

    from ray.data.aggregate import Count

    from engine.stages.dedup import exact_dedup
    from engine.stages.quantiles import grouped_quantiles_disc
    from engine.stages.topk import domain_terms

    t0 = time.monotonic()
    id_col, text_col = args.id_col, args.text_col
    ds = ray.data.read_parquet(args.docs).materialize()
    n = ds.count()
    cols = set(ds.schema().names)
    print(f"documents      {n}")
    if n == 0:
        _shutdown(ray)
        return 0
    if "lang" in cols:
        import pyarrow as pa
        import pyarrow.compute as pc

        # null langs (pages tables carry None for skip rows) break the
        # groupby's key sort — fill before shuffling
        lang_ds = ds.map_batches(
            lambda t: pa.table(
                {"lang": pc.fill_null(pc.cast(t.column("lang"), pa.string()), "?")}
            ),
            batch_format="pyarrow",
        )
        langs = (
            lang_ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
            .sort_values("n", ascending=False)
        )
        print("languages      " + ", ".join(
            f"{r['lang']}:{int(r['n'])}" for _, r in langs.iterrows()
        ))
    if "n_chars" in cols:
        import pyarrow as pa

        qt = grouped_quantiles_disc(
            ds.map_batches(
                lambda t: t.select(["n_chars"]).append_column(
                    "g", pa.array([0] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            ),
            group_col="g", value_col="n_chars", qs=(0.25, 0.5, 0.75),
        )
        vals = [int(qt.column(i)[0].as_py()) for i in (1, 2, 3)]
        print("n_chars q25/50/75  " + "/".join(str(v) for v in vals))
    dups = exact_dedup(ds, id_col=id_col, text_col=text_col)
    n_distinct = dups.count()
    print(f"exact-distinct {n_distinct}  (dup rows: {n - n_distinct})")
    if "url" in cols or "host" in cols:
        import pyarrow as pa
        import pyarrow.compute as pc

        from engine.canonicalize import host_of
        from engine.stages.domains import domain_agg

        if "host" in cols:
            hosts_ds = ds.map_batches(
                lambda t: t.select(["host"]), batch_format="pyarrow"
            )
        else:
            hosts_ds = ds.map_batches(
                lambda t: pa.table(
                    {
                        "host": pa.array(
                            [host_of(u) for u in t.column("url").to_pylist()],
                            pa.string(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
        da = domain_agg(hosts_ds)
        da = da.sort_by([("n_pages", "descending"), ("domain", "ascending")])
        head = da.slice(0, 10)
        print(f"registrable domains  {da.num_rows}")
        for i in range(head.num_rows):
            print(
                f"  {head.column('domain')[i].as_py()}  "
                f"pages:{head.column('n_pages')[i].as_py()}  "
                f"hosts:{head.column('n_hosts')[i].as_py()}"
            )
    if "source" in cols:
        top = domain_terms(
            ds, group_col="source", text_col=text_col, k=args.top_terms
        ).to_pandas()
        for src, g in top.groupby("source"):
            toks = ", ".join(g.sort_values("term_rank")["token"])
            print(f"top-terms {src}: {toks}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s")
    _shutdown(ray)
    return 0


def cmd_build_corpus(args) -> int:
    """The full corpus build: filter -> near-dup drop -> optional mixture
    -> pack -> sharded export (engine.pipelines.corpus_pipeline)."""
    ray = _ray_session(args.num_cpus)
    import ray.data

    from engine.pipelines.corpus_pipeline import build_corpus

    weights = None
    if args.weights:
        with open(args.weights) as fh:
            weights = json.load(fh)
    t0 = time.monotonic()
    cols = [args.id_col, args.text_col] + (
        [args.domain_col] if weights is not None else []
    )
    manifest, stats = build_corpus(
        ray.data.read_parquet(args.docs, columns=cols),
        out_dir=args.out,
        id_col=args.id_col,
        text_col=args.text_col,
        domain_col=args.domain_col,
        weights_bp=weights,
        out_frac_pct=args.out_frac_pct,
        seq_len=args.seq_len,
        n_shards=args.n_shards,
        shuffle_seed=args.shuffle_seed,
    )
    for k, v in stats.items():
        print(f"{k:16s} {v}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {args.out}")
    _shutdown(ray)
    return 0


def cmd_parse_robots(args) -> int:
    """Fetched robots.txt corpus -> the politeness parquet the crawl
    consumes (stages.robots; the north_star robots cache made loadable)."""
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from engine.stages.robots import robots_politeness, write_politeness_parquet

    t0 = time.monotonic()
    parsed = robots_politeness(
        rd.read_parquet(args.robots), user_agent=args.user_agent
    )
    write_politeness_parquet(
        parsed, args.out,
        default_crawl_delay=args.default_crawl_delay,
        default_max_pages=args.default_max_pages,
    )
    if args.sitemaps_out:
        import shutil as _shutil

        from engine.stages.robots import robots_sitemaps

        _shutil.rmtree(args.sitemaps_out, ignore_errors=True)
        sm = robots_sitemaps(rd.read_parquet(args.robots))
        sm.write_parquet(args.sitemaps_out)
        print(f"sitemap directives -> {args.sitemaps_out}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s -> {args.out}")
    _shutdown(ray)
    return 0


def cmd_crawl(args) -> int:
    ray = _ray_session(args.num_cpus)
    from dataclasses import replace

    from engine.pipelines.crawl import run_crawl
    from engine.pipelines.crawl_common import CrawlConfig

    # Precedence (the reference's conf/local_config.py merge analog,
    # conf/config.py:38-51): defaults < JSON config file < explicit CLI
    # flags.  CLI flags default to None so "explicitly passed" is knowable.
    cfg = CrawlConfig()
    if args.config:
        with open(args.config) as fh:
            overrides = json.load(fh)
        valid = set(CrawlConfig.__dataclass_fields__)
        unknown = set(overrides) - valid
        if unknown:
            raise SystemExit(f"unknown CrawlConfig keys in --config: {sorted(unknown)}")
        cfg = replace(cfg, **overrides)
    cli_over = {
        k: v
        for k, v in (
            ("max_waves", args.max_waves),
            ("wave_seconds", args.wave_seconds),
            ("num_shards", args.num_shards),
            ("politeness_scope", args.politeness_scope),
            ("priority_mode", args.priority_mode),
        )
        if v is not None
    }
    cfg = replace(cfg, **cli_over)
    t0 = time.monotonic()
    order, seen = run_crawl(
        args.pages, args.seeds, args.politeness, args.workdir, cfg,
        extract_docs=args.extract,
        extract_pages_path=args.extract_pages,
    )
    print(
        f"Time taken: {time.monotonic() - t0:.2f}s — fetched {order.num_rows} URLs, "
        f"seen {seen.num_rows}; outputs in {args.workdir}"
    )
    _shutdown(ray)
    return 0


def cmd_cdx(args) -> int:
    """.warc.gz shard dir -> sorted CDX parquet (stages.cdx): the
    random-access index (surt, ts, url, status, mime, digest, offset,
    length, filename) web archives pair with their payload store."""
    ray = _ray_session(args.num_cpus)
    from engine.stages.cdx import cdx_index_shards

    t0 = time.monotonic()
    idx = cdx_index_shards(args.warcs)
    shutil.rmtree(args.out, ignore_errors=True)
    idx.write_parquet(args.out)
    n = ray.data.read_parquet(args.out).count()
    print(f"Time taken: {time.monotonic() - t0:.2f}s — {n} records -> {args.out}")
    _shutdown(ray)
    return 0


def cmd_search(args) -> int:
    """Search a documents table the way the reference's ES index serves
    queries: BM25 top-k ranking, SERP snippets for the hits, optional
    facet counts — the read side of index-then-search, without the ES
    cluster (search.bm25_topk / snippet_search / search_facets)."""
    ray = _ray_session(args.num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc

    from engine.stages.search import bm25_topk, search_facets, snippet_search

    t0 = time.monotonic()
    terms = [w for w in args.query.split() if w]
    if not terms:
        print("empty query", file=sys.stderr)
        _shutdown(ray)
        return 2
    ds = ray.data.read_parquet(
        args.docs, columns=[args.id_col, args.text_col]
    )
    ranked = bm25_topk(
        ds, terms, id_col=args.id_col, text_col=args.text_col, k=args.k
    )
    ids = set(ranked.column(args.id_col).to_pylist())
    rank_of = {
        i: r
        for r, i in zip(
            ranked.column("rank").to_pylist(),
            ranked.column(args.id_col).to_pylist(),
        )
    }
    # snippets only for the top-k hits: filter FIRST, then snippet the
    # result-sized remainder (any-term anchor, so single-term docs show)
    id_set = pa.array(sorted(ids), pa.int64())
    hits = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(args.id_col), value_set=id_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    snips = snippet_search(
        hits,
        terms[:1],
        id_col=args.id_col,
        text_col=args.text_col,
        before=args.snippet_before,
        width=args.snippet_width,
    ).to_pandas()
    snip_of = dict(zip(snips[args.id_col], snips["snippet"]))
    for did in sorted(rank_of, key=rank_of.get):
        print(f"{rank_of[did]:3d}. doc {did}  {snip_of.get(did, '')!r}")
    if args.facets:
        fac = search_facets(
            ray.data.read_parquet(args.docs),
            terms[0],
            facets=tuple(args.facets.split(",")),
            text_col=args.text_col,
        )
        for row in fac.sort_by([("facet", "ascending"), ("doc_count", "descending")]).to_pylist():
            print(f"  [{row['facet']}] {row['value']}: {row['doc_count']}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s — {len(rank_of)} hits")
    _shutdown(ray)
    return 0


def cmd_query(args) -> int:
    """Run one JSON query-DSL clause (engine.stages.dsl) against a docs
    parquet — the ES `_search` request-body analog; prints the match
    count, the first rows, and optional facet counts."""
    ray = _ray_session(args.num_cpus)
    from engine.stages.dsl import run_query_dsl
    from engine.stages.search import search_facets

    t0 = time.monotonic()
    if args.dsl_file:
        with open(args.dsl_file) as f:
            dsl = json.load(f)
    else:
        dsl = json.loads(args.dsl)
    ds = ray.data.read_parquet(args.docs)
    res = run_query_dsl(ds, dsl).materialize()
    n = res.count()
    for row in res.take(args.head):
        print(row)
    if args.facets:
        kind, body = next(iter(dsl.items()))
        term = (
            body.get("must", body.get("terms", [""]))[0]
            if isinstance(body, dict)
            else str(body).split()[0]
        )
        fac = search_facets(
            ray.data.read_parquet(args.docs),
            term,
            facets=tuple(args.facets.split(",")),
        )
        for row in fac.sort_by(
            [("facet", "ascending"), ("doc_count", "descending")]
        ).to_pylist():
            print(f"  [{row['facet']}] {row['value']}: {row['doc_count']}")
    print(f"Time taken: {time.monotonic() - t0:.2f}s — {n} matches")
    _shutdown(ray)
    return 0


def cmd_clean(args) -> int:
    """The reference's clear-redis analog (index.py:245-282): drop state."""
    if os.path.isdir(args.path):
        shutil.rmtree(args.path)
        print(f"removed {args.path}")
    else:
        print(f"nothing to remove at {args.path}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raycrawl", description=__doc__)
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    i = sub.add_parser("index", help="extract pages into meta/data tables")
    i.add_argument("pages")
    i.add_argument("out")
    i.add_argument("--id-prefix", default="cc")
    i.add_argument("--lookups", default=None)
    i.add_argument("--always-index-meta", action="store_true")
    i.add_argument("--dry-run", action="store_true")
    i.add_argument("--files-per-partition", type=int, default=4)
    i.set_defaults(fn=cmd_index)

    l = sub.add_parser("prepare-lookups", help="rank files -> lookup parquet")
    l.add_argument("out")
    l.add_argument("--id-prefix", default="cc")
    l.add_argument("--spam-ranks", default=None)
    l.add_argument("--page-ranks", default=None)
    l.set_defaults(fn=cmd_prepare_lookups)

    s = sub.add_parser("index-setup", help="emit schemas + scaffolding")
    s.add_argument("out")
    s.set_defaults(fn=cmd_index_setup)

    c = sub.add_parser("crawl", help="run the frontier crawl")
    c.add_argument("pages")
    c.add_argument("seeds")
    c.add_argument("workdir")
    c.add_argument("--politeness", default=None)
    c.add_argument("--politeness-scope", choices=("host", "domain"), default=None,
                   help="budget unit: raw host (default) or registrable domain (eTLD+1)")
    c.add_argument("--priority-mode", choices=("depth", "inlinks"), default=None,
                   help="frontier priority: BFS depth (default) or depth + capped inlink bonus")
    c.add_argument("--max-waves", type=int, default=None)
    c.add_argument("--wave-seconds", type=float, default=None)
    c.add_argument("--num-shards", type=int, default=None)
    c.add_argument("--extract", action="store_true",
                   help="run extraction on every fetched page (crawl-and-index)")
    c.add_argument("--extract-pages", default=None,
                   help="html pages layout for --extract when crawling a links layout")
    c.add_argument("--config", default=None, help="JSON CrawlConfig overrides")
    c.set_defaults(fn=cmd_crawl)

    d = sub.add_parser("clean", help="remove a checkpoint/output dir")
    d.add_argument("path")
    d.set_defaults(fn=cmd_clean)

    f = sub.add_parser("filter", help="composed cleaning-chain verdicts")
    f.add_argument("docs", help="documents parquet path/glob")
    f.add_argument("out", help="verdict output dir")
    f.add_argument("--id-col", default="doc_id")
    f.add_argument("--text-col", default="text")
    f.add_argument("--num-cpus", type=int, default=None)
    f.set_defaults(fn=cmd_filter)

    b = sub.add_parser(
        "build-corpus",
        help="full corpus build: filter -> dedup -> mixture -> pack -> shards",
    )
    b.add_argument("docs", help="documents parquet path/glob")
    b.add_argument("out", help="shard output dir")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--domain-col", default="source")
    b.add_argument("--weights", default=None,
                   help="JSON file: domain -> basis-point weight")
    b.add_argument("--out-frac-pct", type=int, default=100)
    b.add_argument("--seq-len", type=int, default=2048)
    b.add_argument("--shuffle-seed", type=int, default=None,
                   help="seeded deterministic pre-pack shuffle (default: id order)")
    b.add_argument("--n-shards", type=int, default=64)
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build_corpus)

    st = sub.add_parser("stats", help="corpus profiling report")
    st.add_argument("docs", help="documents parquet path/glob")
    st.add_argument("--id-col", default="doc_id")
    st.add_argument("--text-col", default="text")
    st.add_argument("--top-terms", type=int, default=5)
    st.add_argument("--num-cpus", type=int, default=None)
    st.set_defaults(fn=cmd_stats)

    e = sub.add_parser("export", help="sharded training export + manifest")
    e.add_argument("docs", help="documents parquet path/glob")
    e.add_argument("out", help="shard output dir")
    e.add_argument("--id-col", default="doc_id")
    e.add_argument("--n-shards", type=int, default=64)
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_export)

    pr = sub.add_parser(
        "parse-robots", help="robots.txt corpus -> politeness parquet"
    )
    pr.add_argument("robots", help="parquet with (host, robots_txt)")
    pr.add_argument("out")
    pr.add_argument("--user-agent", default="raycrawler")
    pr.add_argument("--default-crawl-delay", type=float, default=5.0)
    pr.add_argument("--default-max-pages", type=int, default=1000)
    pr.add_argument("--sitemaps-out", default=None,
                    help="also write (host, sitemap_url, ord) rows from Sitemap: directives")
    pr.set_defaults(fn=cmd_parse_robots)

    se = sub.add_parser("search", help="BM25 search with snippets/facets")
    se.add_argument("docs")
    se.add_argument("--query", required=True)
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--facets", default="")
    se.add_argument("--snippet-before", type=int, default=40)
    se.add_argument("--snippet-width", type=int, default=120)
    se.set_defaults(fn=cmd_search)

    qy = sub.add_parser("query", help="run a JSON search-DSL clause")
    qy.add_argument("docs")
    qy.add_argument("--dsl", default=None, help="inline JSON clause")
    qy.add_argument("--dsl-file", default=None, help="path to JSON clause")
    qy.add_argument("--head", type=int, default=5)
    qy.add_argument("--facets", default="")
    qy.set_defaults(fn=cmd_query)

    cx = sub.add_parser("cdx", help=".warc.gz shards -> sorted CDX parquet")
    cx.add_argument("warcs", help=".warc.gz file or directory of shards")
    cx.add_argument("out", help="output parquet directory")
    cx.set_defaults(fn=cmd_cdx)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        # a command that raises must still release a CLI-owned Ray session
        _shutdown()


if __name__ == "__main__":
    sys.exit(main())
