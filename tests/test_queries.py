"""__ray_entry__ contract tests: every SQL-checked query must match DuckDB
bit-for-bit at sf0.01 (mirrors the driver's correctness gate); rows-only
queries must run and return stable, non-degenerate output."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_SQL = "/root/testdata/sf0.01"
SF_FAST = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _entry():
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def contract(ray_session):
    e = _entry()
    return e.queries(), e.oracle_sql()


SQL_NAMES = [
    "exact_dedup", "token_stats", "doc_filter", "lang_agg", "lookup_join",
    "events_window", "topk_orders", "pricing_summary", "surt_hosts",
    "domain_agg",
    "distinct_users", "sessions", "hash_join", "asof_join", "range_join",
    "quantiles", "quality", "extract_pages", "ann_topk", "lang_id",
    "shuffle_corpus", "tfidf",
    "crawl_order", "crawl_order_domain", "crawl_order_inlinks",
    "fingerprint", "dedup_corpus",
    "sample_stratified",
    "pack_sequences", "events_hopping", "sink_status",
    "rep_stats", "line_dedup", "span_dedup", "decontam", "corpus_overlap",
    "bm25_topk", "term_stats", "heavy_hitters", "dsir", "redirects",
    "source_kl", "source_overlap", "suffix_array", "dup_spans", "lcp",
    "bigram_nll", "pmi_pairs", "pmi_window", "log_odds", "sb_nll", "token_entropy",
    "dedup_best",
    "link_stats", "triangles", "funnel", "value_hist",
    "postings", "unigram_nll",
    "ppl_buckets", "pii_scrub",
    "snapshot_diff", "latest_events", "json_props",
    "mixture_sample", "corpus_split", "weighted_sample", "domain_terms",
    "corpus_filter", "incremental_index",
    "export_shards", "export_jsonl", "chunk_docs",
    "url_filter", "url_templates", "normalize_text", "novelty", "containment",
    "winnow_overlap", "cdx_pages", "warc_dedup", "robots_rules",
    "sitemap_urls", "robots_sitemaps", "lang_confusion", "dedup_report", "outlinks",
    "export_warc", "export_wet", "crawl_metrics", "recrawl",
    "crawl_host_budget", "more_like_this", "export_wat",
    "phrase_search", "snippet_search", "search_facets",
    "spell_suggest", "regex_search", "emb_covariance", "readability",
    "prefix_suggest", "balanced_shards", "significant_terms",
    "collapse_topk", "percentile_ranks", "events_moving",
    "encoding_anomalies", "positional_postings", "phrase_index",
    "rescore", "fuzzy_search", "bool_search", "index_size_est",
    "percolate", "graph_components", "shipping_priority", "late_orders",
    "oov_rate", "search_after", "multi_match", "decay_scores",
    "zone_prune", "bloom_route", "span_near", "rank_eval",
    "reshard_moves", "robots_wildcards", "canonical_groups", "cache_control", "charset_sniff",
    "segment_merge", "doc_deletes", "c4_line_filter", "badwords",
    "mirror_detect", "soft404", "stopword_gen", "terms_set", "composite_agg",
    "host_boilerplate", "ltr_features",
    "meta_robots", "hreflang_map", "hreflang_reciprocal",
    "extended_stats", "dis_max", "change_rate",
    "adjacency_matrix", "lexical_diversity", "stale_pages",
    "robots_directives", "link_rel_stats",
    "rare_terms", "bucket_pipeline", "diversified_sample", "ann_filtered",
    "prf_expansion", "wand_topk", "pagination_chains",
    "dispersion", "bfs_hops", "phrase_prefix", "boosting",
    "sentences", "fold_accents", "outer_join", "terms_shards",
    "auto_histogram", "rollover", "ip_prefix", "cohort_retention",
    "ivm", "fuzzy_join", "event_bigrams", "fair_share", "jsonld", "img_srcset", "feed_urls", "setsim_join", "homoglyphs", "rrf_hybrid", "meta_counts", "geo_distance",
]


@pytest.mark.parametrize("name", SQL_NAMES)
def test_sql_parity(contract, name):
    queries, oracles = contract
    got = _normalize(_to_pandas(queries[name](SF_SQL)))
    con = _duck(SF_SQL)
    exp = _normalize(con.sql(oracles[name]).df())
    con.close()
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            assert np.array_equal(
                gv.astype(np.float64), ev.astype(np.float64)
            ), f"{name}.{c}: float values differ"
        else:
            assert (gv == ev).all(), f"{name}.{c}: values differ"


ROWS_ONLY = [
    ("webis_ids", 1),
    ("simhash", 1),
    ("simhash_pairs", 0),
    ("minhash_dedup", 0),
    ("ngram_dedup", 0),
    ("embedding_dedup", 0),
    ("semdedup", 1),
    ("ann_ivf", 1),
    ("ann_quantized", 1),
    ("ann_pq", 1),
    ("extract_enriched", 1),
    ("media_features", 1),
    ("video_frames", 24),
    ("image_resize", 32),
    ("bpe_tokens", 1),
    ("bpe_merges", 10),
    ("dedup_clusters", 0),
    ("approx_users", 1),
    ("approx_quantiles", 1),
    ("bloom_dedup", 1),
    ("pagerank", 1),
    ("hits_scores", 1),
    ("compress_ratio", 1),
    ("anchor_terms", 1),
    ("cluster_topics", 1),
    ("cms_counts", 1),
    ("tfidf_pairs", 1),
    ("textrank", 1),
    ("corpus_build", 1),
    ("quality_classifier", 1),
    ("neardup_incremental", 1),
    ("cdx_shards", 1),
    ("emb_pca", 1),
    ("image_phash", 1),
    ("audio_phash", 1),
    ("cdc_stats", 1),
    ("mmr_rerank", 10),
    ("kcore", 1),
    ("trustrank", 1),
]


@pytest.mark.parametrize(
    "gate", [2_000_000, 0], ids=["driver-path", "distributed-path"]
)
def test_connected_components_matches_union_find(ray_session, gate):
    """BOTH paths (gated driver union-find, distributed label propagation)
    == a reference union-find on a random pair set."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.stages.dedup import connected_components

    rs = np.random.RandomState(3)
    edges = [(int(a), int(b)) for a, b in rs.randint(0, 60, size=(80, 2)) if a != b]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([min(a, b) for a, b in edges], pa.int64()),
                "doc_b": pa.array([max(a, b) for a, b in edges], pa.int64()),
            }
        )
    )
    got = connected_components(pairs, driver_max_edges=gate).to_pandas()

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical label = min node of the component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expect = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            expect[n] = m
    for _, row in got.iterrows():
        assert expect[row["doc_id"]] == row["cluster_id"]


@pytest.mark.parametrize("name,min_rows", ROWS_ONLY)
def test_rows_only_runs(contract, name, min_rows):
    queries, _ = contract
    df = _to_pandas(queries[name](SF_FAST))
    assert len(df) >= min_rows, f"{name}: empty result"
    assert len(df.columns) > 0
    # determinism: second run must be identical
    if name in ("webis_ids", "simhash", "fingerprint", "ann_topk", "bpe_merges"):
        df2 = _to_pandas(queries[name](SF_FAST))
        pd.testing.assert_frame_equal(_normalize(df), _normalize(df2))


def test_entry_smoke(ray_session):
    e = _entry()
    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "uuid" in df.columns


def test_ann_topk_is_exact(contract):
    """Brute-force ANN result equals a numpy oracle on the same data."""
    import pyarrow.parquet as pq

    queries, _ = contract
    got = _to_pandas(queries["ann_topk"](SF_FAST))
    t = pq.read_table(f"{SF_FAST}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in ids[:5]:
        sims = mn @ mn[ids.index(qi)]
        order = sorted(zip(-sims, ids))  # sim desc, vec_id asc
        expect = [vid for _, vid in order[:10]]
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == expect, f"query {qi} top-10 differs"


def test_json_props_fixture_invariant():
    """Pin the events fixture invariant q_json_props' SQL parity relies on:
    every props row carries an INTEGER 'k' (int() truncation vs SQL CAST
    rounding would diverge on floats; sum-NULL skipping is mirrored in the
    query itself)."""
    import json

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_FAST}/events.parquet", columns=["props"])
    for p in t.column("props").to_pylist():
        assert p is not None
        v = json.loads(p).get("k")
        assert isinstance(v, int) and not isinstance(v, bool), repr(v)


def test_contract_lists_complete(contract):
    """Every queries() entry is either SQL-verified (with an oracle) or in
    the rows-only smoke list — no query can silently escape testing; no
    oracle can exist without a query."""
    queries, oracles = contract
    tested = set(SQL_NAMES) | {n for n, _ in ROWS_ONLY}
    assert set(queries) == tested, (
        f"untested queries: {set(queries) - tested}; "
        f"stale test entries: {tested - set(queries)}"
    )
    assert set(oracles) == set(SQL_NAMES), (
        f"oracles without SQL parity test: {set(oracles) - set(SQL_NAMES)}; "
        f"SQL_NAMES without oracle: {set(SQL_NAMES) - set(oracles)}"
    )
