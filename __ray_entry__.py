"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 plus the training-data operator suite (dedup, ANN, text
analysis, multimodal plumbing, crawl frontier).  ``oracle_sql()`` provides
DuckDB-equivalent SQL for every SQL-expressible query with IDENTICAL column
names — including extraction (the oracle re-derives the synthetic page HTML
and the full extracted body text), the 2-wave crawl schedule, quality
scoring, ANN ranks, FNV fingerprints, and the stopword language detector.
Genuinely non-SQL-expressible ops (uuid5/sha1 ids, blake2b-based
MinHash/SimHash/HLL, approximate-by-design IVF and embedding-LSH) are
rows-only by design, each with its own non-SQL oracle in tests (numpy
exact top-k, union-find, scheduler oracle, accuracy bounds).

Ray is initialised by the driver before import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _ctx():
    # list<string> columns must not be tensor-cast when the driver converts
    # results to pandas.
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False


def entry() -> Any:
    """Flagship pipeline: synthesize pages from sf0.001 documents, run the
    extraction pipeline, return the kept-document rows (full surface:
    uuid5 ids, language id, metadata)."""
    _ctx()
    from engine.pipelines.queries import q_extract_enriched

    return q_extract_enriched("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    _ctx()
    from engine.pipelines import queries as q

    return {
        # SQL-verified
        "exact_dedup": q.q_exact_dedup,
        "token_stats": q.q_token_stats,
        "doc_filter": q.q_doc_filter,
        "lang_agg": q.q_lang_agg,
        "lookup_join": q.q_lookup_join,
        "events_window": q.q_events_window,
        "events_hopping": q.q_events_hopping,
        "topk_orders": q.q_topk_orders,
        "pricing_summary": q.q_pricing_summary,
        "surt_hosts": q.q_surt_hosts,
        "domain_agg": q.q_domain_agg,
        "distinct_users": q.q_distinct_users,
        "sessions": q.q_sessions,
        "hash_join": q.q_hash_join,
        "asof_join": q.q_asof_join,
        "range_join": q.q_range_join,
        "quantiles": q.q_quantiles,
        "quality": q.q_quality,
        "extract_pages": q.q_extract_pages,
        "ann_topk": q.q_ann_topk,
        "lang_id": q.q_lang_id,
        "crawl_order": q.q_crawl_order,
        "crawl_order_domain": q.q_crawl_order_domain,
        "crawl_order_inlinks": q.q_crawl_order_inlinks,
        "fingerprint": q.q_fingerprint,
        "dedup_corpus": q.q_dedup_corpus,
        "sample_stratified": q.q_sample_stratified,
        "shuffle_corpus": q.q_shuffle_corpus,
        "tfidf": q.q_tfidf,
        "pack_sequences": q.q_pack_sequences,
        "sink_status": q.q_sink_status,
        "bm25_topk": q.q_bm25_topk,
        "more_like_this": q.q_more_like_this,
        "phrase_search": q.q_phrase_search,
        "snippet_search": q.q_snippet_search,
        "search_facets": q.q_search_facets,
        "spell_suggest": q.q_spell_suggest,
        "regex_search": q.q_regex_search,
        "emb_covariance": q.q_emb_covariance,
        "readability": q.q_readability,
        "prefix_suggest": q.q_prefix_suggest,
        "balanced_shards": q.q_balanced_shards,
        "significant_terms": q.q_significant_terms,
        "collapse_topk": q.q_collapse_topk,
        "percentile_ranks": q.q_percentile_ranks,
        "events_moving": q.q_events_moving,
        "encoding_anomalies": q.q_encoding_anomalies,
        "positional_postings": q.q_positional_postings,
        "phrase_index": q.q_phrase_index,
        "rescore": q.q_rescore,
        "index_size_est": q.q_index_size_est,
        "fuzzy_search": q.q_fuzzy_search,
        "bool_search": q.q_bool_search,
        "percolate": q.q_percolate,
        "graph_components": q.q_graph_components,
        "shipping_priority": q.q_shipping_priority,
        "late_orders": q.q_late_orders,
        "oov_rate": q.q_oov_rate,
        "search_after": q.q_search_after,
        "multi_match": q.q_multi_match,
        "decay_scores": q.q_decay_scores,
        "zone_prune": q.q_zone_prune,
        "bloom_route": q.q_bloom_route,
        "span_near": q.q_span_near,
        "rank_eval": q.q_rank_eval,
        "reshard_moves": q.q_reshard_moves,
        "robots_wildcards": q.q_robots_wildcards,
        "canonical_groups": q.q_canonical_groups,
        "cache_control": q.q_cache_control,
        "charset_sniff": q.q_charset_sniff,
        "segment_merge": q.q_segment_merge,
        "doc_deletes": q.q_doc_deletes,
        "c4_line_filter": q.q_c4_line_filter,
        "badwords": q.q_badwords,
        "mirror_detect": q.q_mirror_detect,
        "soft404": q.q_soft404,
        "stopword_gen": q.q_stopword_gen,
        "terms_set": q.q_terms_set,
        "composite_agg": q.q_composite_agg,
        "host_boilerplate": q.q_host_boilerplate,
        "ltr_features": q.q_ltr_features,
        "meta_robots": q.q_meta_robots,
        "hreflang_map": q.q_hreflang_map,
        "hreflang_reciprocal": q.q_hreflang_reciprocal,
        "extended_stats": q.q_extended_stats,
        "dis_max": q.q_dis_max,
        "change_rate": q.q_change_rate,
        "adjacency_matrix": q.q_adjacency_matrix,
        "lexical_diversity": q.q_lexical_diversity,
        "stale_pages": q.q_stale_pages,
        "robots_directives": q.q_robots_directives,
        "link_rel_stats": q.q_link_rel_stats,
        "rare_terms": q.q_rare_terms,
        "ann_filtered": q.q_ann_filtered,
        "prf_expansion": q.q_prf_expansion,
        "wand_topk": q.q_wand_topk,
        "bucket_pipeline": q.q_bucket_pipeline,
        "diversified_sample": q.q_diversified_sample,
        "dispersion": q.q_dispersion,
        "bfs_hops": q.q_bfs_hops,
        "phrase_prefix": q.q_phrase_prefix,
        "boosting": q.q_boosting,
        "sentences": q.q_sentences,
        "fold_accents": q.q_fold_accents,
        "outer_join": q.q_outer_join,
        "terms_shards": q.q_terms_shards,
        "auto_histogram": q.q_auto_histogram,
        "rollover": q.q_rollover,
        "ip_prefix": q.q_ip_prefix,
        "cohort_retention": q.q_cohort_retention,
        "ivm": q.q_ivm,
        "fuzzy_join": q.q_fuzzy_join,
        "fair_share": q.q_fair_share,
        "jsonld": q.q_jsonld,
        "img_srcset": q.q_img_srcset,
        "feed_urls": q.q_feed_urls,
        "setsim_join": q.q_setsim_join,
        "rrf_hybrid": q.q_rrf_hybrid,
        "meta_counts": q.q_meta_counts,
        "geo_distance": q.q_geo_distance,
        "homoglyphs": q.q_homoglyphs,
        "event_bigrams": q.q_event_bigrams,
        # rows-only (iterative peel fixpoint has no SQL analog; peel
        # oracle + clique fixture tests)
        "kcore": q.q_kcore,
        # rows-only (float ranks; numpy-oracle test, both paths)
        "trustrank": q.q_trustrank,
        # rows-only (float loadings; eigen-residual unit test)
        "emb_pca": q.q_emb_pca,
        # rows-only (float MMR scores; full-corpus numpy oracle test)
        "mmr_rerank": q.q_mmr_rerank,
        # rows-only (dHash has no SQL analog; brute-force oracle test)
        "image_phash": q.q_image_phash,
        "audio_phash": q.q_audio_phash,
        # rows-only (y4m container parsing / box resize have no SQL
        # analog; single-process decode + numpy oracle tests)
        "video_frames": q.q_video_frames,
        "image_resize": q.q_image_resize,
        # rows-only (gear rolling hash has no SQL analog; oracle tests)
        "cdc_stats": q.q_cdc_stats,
        "term_stats": q.q_term_stats,
        "postings": q.q_postings,
        "unigram_nll": q.q_unigram_nll,
        "ppl_buckets": q.q_ppl_buckets,
        "heavy_hitters": q.q_heavy_hitters,
        "dsir": q.q_dsir,
        "redirects": q.q_redirects,
        "source_kl": q.q_source_kl,
        "source_overlap": q.q_source_overlap,
        "suffix_array": q.q_suffix_array,
        "dup_spans": q.q_dup_spans,
        "lcp": q.q_lcp,
        "bigram_nll": q.q_bigram_nll,
        "pmi_pairs": q.q_pmi_pairs,
        "pmi_window": q.q_pmi_window,
        "log_odds": q.q_log_odds,
        "sb_nll": q.q_sb_nll,
        "token_entropy": q.q_token_entropy,
        "dedup_best": q.q_dedup_best,
        "link_stats": q.q_link_stats,
        "triangles": q.q_triangles,
        "funnel": q.q_funnel,
        "value_hist": q.q_value_hist,
        "pii_scrub": q.q_pii_scrub,
        "snapshot_diff": q.q_snapshot_diff,
        "latest_events": q.q_latest_events,
        "json_props": q.q_json_props,
        "rep_stats": q.q_rep_stats,
        "line_dedup": q.q_line_dedup,
        "span_dedup": q.q_span_dedup,
        "decontam": q.q_decontam,
        "corpus_overlap": q.q_corpus_overlap,
        "mixture_sample": q.q_mixture_sample,
        "corpus_split": q.q_corpus_split,
        "weighted_sample": q.q_weighted_sample,
        "domain_terms": q.q_domain_terms,
        "corpus_filter": q.q_corpus_filter,
        "incremental_index": q.q_incremental_index,
        "export_shards": q.q_export_shards,
        "export_jsonl": q.q_export_jsonl,
        "chunk_docs": q.q_chunk_docs,
        "url_filter": q.q_url_filter,
        "url_templates": q.q_url_templates,
        "pagination_chains": q.q_pagination_chains,
        "normalize_text": q.q_normalize_text,
        "novelty": q.q_novelty,
        "containment": q.q_containment,
        "winnow_overlap": q.q_winnow_overlap,
        "cdx_pages": q.q_cdx_pages,
        "cdx_shards": q.q_cdx_shards,
        "warc_dedup": q.q_warc_dedup,
        "robots_rules": q.q_robots_rules,
        "sitemap_urls": q.q_sitemap_urls,
        "robots_sitemaps": q.q_robots_sitemaps,
        "lang_confusion": q.q_lang_confusion,
        "dedup_report": q.q_dedup_report,
        "outlinks": q.q_outlinks,
        "export_warc": q.q_export_warc,
        "export_wat": q.q_export_wat,
        "export_wet": q.q_export_wet,
        "crawl_metrics": q.q_crawl_metrics,
        "recrawl": q.q_recrawl,
        "crawl_host_budget": q.q_crawl_host_budget,
        # rows-only (non-SQL-expressible)
        "quality_classifier": q.q_quality_classifier,
        "neardup_incremental": q.q_neardup_incremental,
        "hits_scores": q.q_hits,
        "compress_ratio": q.q_compress_ratio,
        "anchor_terms": q.q_anchor_terms,
        "cluster_topics": q.q_cluster_topics,
        "cms_counts": q.q_cms_counts,
        "tfidf_pairs": q.q_tfidf_pairs,
        "textrank": q.q_textrank,
        "webis_ids": q.q_webis_ids,
        "bpe_tokens": q.q_bpe_tokens,
        "bpe_merges": q.q_bpe_merges,
        "minhash_dedup": q.q_minhash_dedup,
        "ngram_dedup": q.q_ngram_dedup,
        "simhash": q.q_simhash,
        "simhash_pairs": q.q_simhash_pairs,
        "embedding_dedup": q.q_embedding_dedup,
        "semdedup": q.q_semdedup,
        "ann_ivf": q.q_ann_ivf,
        "ann_quantized": q.q_ann_quantized,
        "ann_pq": q.q_ann_pq,
        "extract_enriched": q.q_extract_enriched,
        "media_features": q.q_media_features,
        "dedup_clusters": q.q_dedup_clusters,
        "approx_users": q.q_approx_users,
        "bloom_dedup": q.q_bloom_dedup,
        "approx_quantiles": q.q_approx_quantiles,
        "pagerank": q.q_pagerank,
        "corpus_build": q.q_corpus_build,
    }


def _lang_pred_ctes(src: str) -> str:
    """CTE chain ending in ``lang(doc_id, lang_pred)``, generated from
    engine.lang's stopword lists (single source of truth) over any source
    relation ``src(doc_id, text)``.  The detector is pure stopword counting
    with integer thresholds: the 0.05 evidence ratio becomes the exact
    integer test ``20*sc < nw``, so the whole thing is faithfully
    SQL-expressible (verified 0 mismatches on all three testdata scale
    factors)."""
    from engine.lang import LANGS, _STOPWORDS

    score_cols = ",\n    ".join(
        "len(list_filter(lwords, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
        + f"], x))) AS s_{lang}"
        for lang in LANGS
    )
    cases = []
    for i, lang in enumerate(LANGS):
        others = [f"s_{lang} >= s_{o}" for o in LANGS[i + 1 :]]
        cases.append(
            f"WHEN {' AND '.join(others)} THEN '{lang}'" if others else f"ELSE '{lang}'"
        )
    case_chain = "\n         ".join(cases)
    greatest = ", ".join(f"s_{l}" for l in LANGS)
    return f"""lw AS (
          SELECT doc_id, text, regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS lwords
          FROM {src}
        ), ls AS (
          SELECT doc_id, text, len(lwords) AS nw,
            {score_cols}
          FROM lw
        ), lb AS (
          SELECT doc_id, text, nw, greatest({greatest}) AS sc,
            CASE {case_chain} END AS best
          FROM ls
        ), lang AS (
          SELECT doc_id,
            CASE WHEN text IS NULL OR length(text) < 20 OR nw = 0 OR sc = 0
                      OR 20*sc < nw
                 THEN 'unknown' ELSE best END AS lang_pred
          FROM lb
        )"""


def _lang_id_sql() -> str:
    return f"""
        WITH {_lang_pred_ctes("documents")}
        SELECT doc_id, lang_pred FROM lang
    """


def _filter_inject_sql() -> str:
    """The corpus_filter fixture-injection CTE ``inj(doc_id, text)`` —
    mirrors queries._inject_filter_fixture verbatim: doc_id%11==3 docs
    become one shared boilerplate page (creates an exact-duplicate group),
    everything else gets the _inject_pii suffixes."""
    from engine.pipelines.queries import _FILTER_BOILERPLATE

    return f"""inj AS (SELECT doc_id,
          CASE WHEN doc_id % 11 = 3 THEN '{_FILTER_BOILERPLATE}'
          ELSE coalesce(text, '')
            || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com now' ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555 '
                         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' '
                         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
            || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
          END AS text FROM documents)"""


def _corpus_filter_sql() -> str:
    """Generate the corpus_filter oracle from the engine's own pieces —
    the injection CTE, the stopword-language CTE chain (_lang_pred_ctes),
    the SQL-verified signal definitions (token/char counts, dup-word ppm,
    alpha ppm, PII_RULES match counts) and the threshold constants
    imported from engine.stages.filter_pipeline (single source of truth).
    The ordered CASE mirrors the verdict chain verbatim."""
    from engine.stages.filter_pipeline import (
        MAX_DUP_WORD_PPM,
        MAX_PII,
        MIN_ALPHA_PPM,
        MIN_CHARS,
        MIN_WORDS,
    )
    from engine.stages.pii import PII_RULES

    pii_sum = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for _, p, _ in PII_RULES
    )
    return rf"""
        WITH {_filter_inject_sql()},
        {_lang_pred_ctes("inj")},
        d AS (SELECT doc_id, text, md5(text) AS h,
                     regexp_extract_all(text, '[^\t\n\v\f\r ]+') AS w
              FROM inj),
        wc AS (SELECT doc_id, unnest(w) AS word FROM d),
        wcounts AS (SELECT doc_id, word, count(*) AS c FROM wc GROUP BY doc_id, word),
        wstat AS (SELECT doc_id,
                         CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) AS dups
                  FROM wcounts GROUP BY doc_id),
        sig AS (SELECT d.doc_id, d.h,
                   CAST(length(d.text) AS BIGINT) AS n_chars,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(CASE WHEN len(w) > 0
                             THEN floor(1000000.0 * coalesce(wstat.dups, 0) / len(w))
                             ELSE 0 END AS BIGINT) AS dup_word_ppm,
                   CAST(CASE WHEN length(d.text) > 0
                             THEN floor(1000000.0 * len(regexp_extract_all(d.text, '[A-Za-z]'))
                                        / length(d.text))
                             ELSE 0 END AS BIGINT) AS alpha_ppm,
                   CAST({pii_sum} AS BIGINT) AS n_pii
                FROM d LEFT JOIN wstat USING (doc_id)),
        keepid AS (SELECT h, min(doc_id) AS mid FROM sig GROUP BY h)
        SELECT doc_id, n_chars, n_words,
          CASE WHEN doc_id <> keepid.mid THEN 'duplicate'
               WHEN n_pii > {MAX_PII} THEN 'pii'
               WHEN lang.lang_pred = 'unknown' THEN 'lang'
               WHEN n_chars < {MIN_CHARS} OR n_words < {MIN_WORDS} THEN 'short'
               WHEN dup_word_ppm > {MAX_DUP_WORD_PPM} THEN 'repetition'
               WHEN alpha_ppm < {MIN_ALPHA_PPM} THEN 'quality'
               ELSE 'kept' END AS status
        FROM sig JOIN keepid USING (h) JOIN lang USING (doc_id)
    """


def _pii_sql() -> str:
    """Generate the pii_scrub oracle from engine.stages.pii.PII_RULES
    (single source of truth).  DuckDB's regex engine is RE2 — the same
    engine behind pyarrow's count/replace_substring_regex — so counts and
    replacements match exactly; the staged CTEs mirror the engine's fixed
    rule order (each rule counts against the previous rule's output).
    The injection CASEs mirror queries._inject_pii verbatim."""
    from engine.stages.pii import PII_RULES

    stages = []
    prev = "t0"
    for i, (name, pattern, repl) in enumerate(PII_RULES, start=1):
        cur = f"t{i}"
        carry = ", ".join(f"n_{n}" for n, _, _ in PII_RULES[: i - 1])
        carry = carry + ", " if carry else ""
        stages.append(
            f"s{i} AS (SELECT doc_id, {carry}"
            f"CAST(len(regexp_extract_all({prev}, '{pattern}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace({prev}, '{pattern}', '{repl}', 'g') AS {cur} FROM "
            f"{'inj' if i == 1 else f's{i - 1}'})"
        )
        prev = cur
    n_cols = ", ".join(f"n_{n}" for n, _, _ in PII_RULES)
    return rf"""
        WITH inj AS (SELECT doc_id,
               coalesce(text, '')
               || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com now' ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555 '
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' '
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
               || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END AS t0
             FROM documents),
        {", ".join(stages)}
        SELECT doc_id, {n_cols}, {prev} AS clean_text,
               CAST(length({prev}) AS BIGINT) AS clean_chars
        FROM s{len(PII_RULES)}
    """


def _bm25_sql() -> str:
    """Generate the bm25_topk oracle from engine.stages.search.BM25_TERMS
    (single source of truth).  Rank-only: both engines evaluate the SAME
    Lucene-BM25 expression in the same operation order; the ordering
    survives ln-ULP noise (same device as ann_topk).  avgdl is written as
    sum/count (not avg()) so the float matches Python's sum_dl/N."""
    from engine.stages.search import BM25_TERMS

    terms = list(BM25_TERMS)
    tf_cols = ",\n                   ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"(ln(1 + (stats.N - df.df_{i} + 0.5) / (df.df_{i} + 0.5)) * tf_{i} * (1.2 + 1.0)"
        f" / (tf_{i} + 1.2 * (1 - 0.75 + 0.75 * (dl / stats.avgdl))))"
        for i in range(len(terms))
    )
    return rf"""
        WITH d AS (SELECT doc_id,
                          regexp_extract_all(coalesce(text,''), '[^\t\n\v\f\r ]+') AS w
                   FROM documents),
        tf AS (SELECT doc_id, len(w) AS dl,
                   {tf_cols}
               FROM d),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS N,
                         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM tf),
        df AS (SELECT {df_cols}
               FROM tf)
        SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
               doc_id
        FROM (SELECT doc_id, {score} AS score FROM tf, stats, df)
        WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT 50
    """


def _rrf_sql() -> str:
    """Generate the rrf_hybrid oracle: the bm25 ranking (nested, single
    source of truth) fused with the doc-length-prior ranking at
    rank_const 60 — contributions 1000000 // (60 + rank), candidates
    only (no corpus default), top-20 by (fused desc, doc_id)."""
    return f"""
        WITH bm AS ({_bm25_sql()}),
        lp AS (SELECT doc_id,
                      CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                           AS BIGINT) AS rank
               FROM documents),
        u AS (
            SELECT doc_id, 1000000 // (60 + rank) AS m FROM bm
            UNION ALL
            SELECT doc_id, 1000000 // (60 + rank) FROM lp WHERE rank <= 50
        ),
        f AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS rrf_micro,
                     CAST(count(*) AS BIGINT) AS n_lists
              FROM u GROUP BY doc_id),
        r AS (SELECT *, CAST(row_number() OVER (
                  ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rank
              FROM f)
        SELECT doc_id, rrf_micro, n_lists, rank FROM r WHERE rank <= 20
    """


def _prf_sql() -> str:
    """Rocchio PRF expansion oracle: nests the generated bm25 SQL (LIMIT
    rewritten to the feedback depth) as the feedback-doc CTE, then ranks
    feedback terms by exact integer tf_sum with the query terms excluded
    — constants from engine.stages.search (single source of truth)."""
    from engine.stages.search import BM25_TERMS, PRF_K_FB, PRF_N_TERMS

    base = _bm25_sql().replace("LIMIT 50", f"LIMIT {PRF_K_FB}")
    not_in = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return rf"""
        WITH topdocs AS ({base}),
        fbtok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(coalesce(text,''),
                        '[^\t\n\v\f\r ]+')) AS term
          FROM documents
          WHERE doc_id IN (SELECT doc_id FROM topdocs)
        )
        SELECT term,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS fb_df,
               CAST(count(*) AS BIGINT) AS tf_sum
        FROM fbtok WHERE term NOT IN ({not_in})
        GROUP BY term ORDER BY tf_sum DESC, term LIMIT {PRF_N_TERMS}
    """


def _mlt_sql() -> str:
    """Generate the more_like_this oracle from engine.stages.search's MLT
    constants (single source of truth).  Rank-only; float parity devices:
    per-term BM25 component spelled with the SAME literal operation order
    as _bm25_sql, per-(seed,doc) total via DuckDB's ordered aggregate
    ``sum(... ORDER BY tok)`` — the engine accumulates token-ascending
    left-to-right with exact 0.0 for masked terms, so the doubles match
    bit-for-bit and the (score DESC, doc_id) ordering is identical."""
    from engine.stages.search import (
        MLT_K,
        MLT_MAX_DF_RATIO,
        MLT_N_SEEDS,
        MLT_N_TERMS,
        MLT_SEED_MOD,
    )

    return rf"""
        WITH d AS (SELECT doc_id,
                          regexp_extract_all(coalesce(text,''), '[^\t\n\v\f\r ]+') AS w
                   FROM documents),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS N,
                         CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl FROM d),
        seeds AS (SELECT doc_id AS seed_id, w FROM d
                  WHERE doc_id % {MLT_SEED_MOD} = 0
                  ORDER BY doc_id LIMIT {MLT_N_SEEDS}),
        stok AS (SELECT seed_id, tok, count(*) AS stf
                 FROM (SELECT seed_id, unnest(w) AS tok FROM seeds)
                 GROUP BY seed_id, tok),
        dtf AS (SELECT doc_id, tok, count(*) AS tf
                FROM (SELECT doc_id, unnest(w) AS tok FROM d)
                WHERE tok IN (SELECT DISTINCT tok FROM stok)
                GROUP BY doc_id, tok),
        dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dtf GROUP BY tok),
        cand AS (SELECT s.seed_id, s.tok,
                        ln(1 + (stats.N - f.df + 0.5) / (f.df + 0.5)) AS lnidf,
                        s.stf * ln(1 + (stats.N - f.df + 0.5) / (f.df + 0.5)) AS tscore
                 FROM stok s JOIN dfs f ON f.tok = s.tok, stats
                 WHERE f.df <= {MLT_MAX_DF_RATIO} * stats.N),
        topt AS (SELECT seed_id, tok, lnidf FROM (
                    SELECT *, row_number() OVER (PARTITION BY seed_id
                                ORDER BY tscore DESC, tok) AS rn
                    FROM cand) WHERE rn <= {MLT_N_TERMS}),
        dls AS (SELECT doc_id, len(w) AS dl FROM d),
        scored AS (SELECT t.seed_id, p.doc_id,
                          sum(t.lnidf * p.tf * (1.2 + 1.0)
                              / (p.tf + 1.2 * (1 - 0.75 + 0.75 * (dls.dl / stats.avgdl)))
                              ORDER BY t.tok) AS score
                   FROM topt t JOIN dtf p ON p.tok = t.tok
                   JOIN dls ON dls.doc_id = p.doc_id, stats
                   WHERE p.doc_id <> t.seed_id
                   GROUP BY t.seed_id, p.doc_id)
        SELECT seed_id,
               CAST(row_number() OVER (PARTITION BY seed_id
                        ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
               doc_id
        FROM scored
        QUALIFY rank <= {MLT_K}
        ORDER BY seed_id, rank
    """


def _sql_utf8_bytes(s: str) -> str:
    """SQL expression: exact UTF-8 byte list of string expression ``s``.
    DuckDB has no byte-level string access, but codepoints
    (unicode(substring(...))) + arithmetic UTF-8 expansion give the exact
    byte sequence."""
    return f"""flatten(list_transform(
        list_transform(range(length({s})), i -> unicode(substring({s}, i+1, 1))),
        cp -> CASE
            WHEN cp < 128 THEN [cp]
            WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
            WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                                  128 + cp % 64]
            ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
                  128 + (cp // 64) % 64, 128 + cp % 64]
        END))"""


def _sql_fnv(s: str) -> str:
    """SQL expression: exact 64-bit FNV-1a of string expression ``s`` —
    ``list_reduce`` over HUGEINT implements the fold
    ``f(a,b) = (xor(a,b) * prime) mod 2^64`` reduced over
    ``[offset, b0, b1, ...]`` (bit-identical to text.fnv1a_batch)."""
    return f"""list_reduce(
        list_prepend(CAST(14695981039346656037 AS HUGEINT),
                     list_transform({_sql_utf8_bytes(s)}, b -> CAST(b AS HUGEINT))),
        (a, b) -> (xor(a, b) * 1099511628211) % 18446744073709551616)"""


def _reshard_sql() -> str:
    """Generate the reshard_moves oracle from engine.stages.reshard's HRW
    constants (single source of truth): per doc the 9 rendezvous weights
    are FNV-1a("{id}:{salted_shard}") via the exact _sql_fnv fold (salt =
    sh * _HRW_SALT mod 2^63, rendered in decimal by CAST-to-VARCHAR on
    both engines); argmax-first via list_position(list_max)."""
    from engine.stages.reshard import _HRW_MOD, _HRW_SALT

    n = 8
    fnv = _sql_fnv(
        f"(CAST(doc_id AS VARCHAR) || ':' || "
        f"CAST(CAST(sh AS HUGEINT) * {_HRW_SALT} % {_HRW_MOD} AS VARCHAR))"
    )
    return f"""
        WITH h AS (
          SELECT doc_id,
                 list_transform(range(0, {n + 1}), sh -> {fnv}) AS hs
          FROM documents
        ), asg AS (
          SELECT doc_id,
             CAST(list_position(hs[1:{n}], list_max(hs[1:{n}])) - 1
                  AS BIGINT) AS old_shard,
             CAST(list_position(hs, list_max(hs)) - 1 AS BIGINT) AS new_shard
          FROM h
        )
        SELECT old_shard AS shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN old_shard != new_shard THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved
        FROM asg GROUP BY old_shard ORDER BY shard
    """


def _rank_eval_sql() -> str:
    """Generate the rank_eval oracle from engine.stages.search's constants
    (single source of truth): tf ranking, title-proxy relevance, integer
    precision@k basis points and fixed-point MRR."""
    from engine.stages.search import (
        RANK_EVAL_K,
        RANK_EVAL_TERMS,
        RANK_EVAL_TITLE_TOKENS,
    )

    vals = ",".join(f"('{t}')" for t in RANK_EVAL_TERMS)
    return rf"""
        WITH d AS (SELECT doc_id,
                          regexp_extract_all(coalesce(text,''),
                                             '[^\t\n\x0b\x0c\r ]+') AS w
                   FROM documents),
        per AS (
          SELECT t.term AS term, doc_id,
                 CAST(len(list_filter(w, x -> x = t.term)) AS BIGINT) AS tf,
                 CASE WHEN len(list_filter(w[1:{RANK_EVAL_TITLE_TOKENS}],
                                           x -> x = t.term)) > 0
                      THEN 1 ELSE 0 END AS rel
          FROM d, (VALUES {vals}) AS t(term)
        ),
        ranked AS (
          SELECT term, doc_id, tf, rel,
                 row_number() OVER (PARTITION BY term
                                    ORDER BY tf DESC, doc_id) AS rn
          FROM per WHERE tf > 0
        ),
        topk AS (SELECT * FROM ranked WHERE rn <= {RANK_EVAL_K})
        SELECT term,
          CAST(count(*) AS BIGINT) AS n_ret,
          CAST(sum(rel) AS BIGINT) AS n_rel,
          CAST((sum(rel) * 10000) // count(*) AS BIGINT) AS prec_bp,
          CAST(coalesce(1000000 // min(CASE WHEN rel = 1 THEN rn END), 0)
               AS BIGINT) AS mrr_fp
        FROM topk GROUP BY term ORDER BY term
    """


def _bloom_sql() -> str:
    """Generate the bloom_route oracle: rebuild the per-shard 4x63-bit
    term bloom (k=2 positions from one FNV-1a, bit-identical to
    bloomindex._positions) with bit_or aggregates, then route the five
    probe terms and attach true containment."""
    fnv_tok = _sql_fnv("tok")
    fnv_term = _sql_fnv("term")
    word = lambda p: (  # noqa: E731
        f"(CASE {p} // 63 WHEN 0 THEN w.b0 WHEN 1 THEN w.b1 "
        f"WHEN 2 THEN w.b2 ELSE w.b3 END)"
    )
    bit = lambda p: (  # noqa: E731
        f"((({word(p)} >> CAST({p} % 63 AS INTEGER)) & 1) = 1)"
    )
    return f"""
        WITH tokx AS (
          SELECT doc_id // 50 AS shard,
                 unnest(regexp_extract_all(coalesce(text,''),
                        '[^\t\n\x0b\x0c\r ]+')) AS tok
          FROM documents
        ), d AS (SELECT DISTINCT shard, tok FROM tokx),
        h AS (SELECT shard, {fnv_tok} AS hh FROM d),
        bits AS (
          SELECT shard, CAST(hh % 252 AS BIGINT) AS p FROM h
          UNION ALL
          SELECT shard, CAST((hh // 4294967296) % 252 AS BIGINT) FROM h
        ),
        words AS (
          SELECT shard,
            bit_or(CASE WHEN p // 63 = 0
                   THEN CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)
                   ELSE 0 END) AS b0,
            bit_or(CASE WHEN p // 63 = 1
                   THEN CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)
                   ELSE 0 END) AS b1,
            bit_or(CASE WHEN p // 63 = 2
                   THEN CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)
                   ELSE 0 END) AS b2,
            bit_or(CASE WHEN p // 63 = 3
                   THEN CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)
                   ELSE 0 END) AS b3
          FROM bits GROUP BY shard
        ),
        probes AS (SELECT unnest(['merge','scan','window','zebra','quantum'])
                   AS term),
        pb AS (
          SELECT term,
                 CAST(hh % 252 AS BIGINT) AS p1,
                 CAST((hh // 4294967296) % 252 AS BIGINT) AS p2
          FROM (SELECT term, {fnv_term} AS hh FROM probes)
        )
        SELECT w.shard, p.term,
               ({bit("p.p1")} AND {bit("p.p2")}) AS maybe,
               EXISTS (SELECT 1 FROM d
                       WHERE d.shard = w.shard AND d.tok = p.term) AS actual
        FROM words w CROSS JOIN pb p
        ORDER BY shard, term
    """


def _dsir_sql() -> str:
    """Generate the DSIR oracle: hashed unigram+bigram importance weights
    (engine.stages.dsir) replayed exactly in SQL.  Grams are tokens plus
    space-joined adjacent pairs; bucket = FNV-1a(gram) % 1024 (_sql_fnv);
    target = the lang='en' subset; lambda_b is the add-one-smoothed
    log-ratio (integer / integer division -> DOUBLE, same correctly-rounded
    value as Python int/int); the per-document accumulation is an explicit
    bucket-ascending list_reduce `+` chain mirroring the engine's Python
    loop, so the floored nanonat weights match bit-for-bit."""
    fnv = _sql_fnv

    return f"""
        WITH d AS (SELECT doc_id, lang,
                          regexp_extract_all(coalesce(text, ''),
                                             '[^\t\n\v\f\r ]+') AS w
                   FROM documents),
        g AS (SELECT doc_id, lang,
                     unnest(list_concat(
                         w, list_transform(range(len(w) - 1),
                                           i -> w[i+1] || ' ' || w[i+2])
                     )) AS gram
              FROM d),
        hb AS (SELECT doc_id, lang,
                      CAST({fnv('gram')} % 1024 AS BIGINT) AS bucket
               FROM g),
        nt AS (SELECT count(*) AS n FROM hb WHERE lang = 'en'),
        nr AS (SELECT count(*) AS n FROM hb),
        ct AS (SELECT bucket, count(*) AS c FROM hb WHERE lang = 'en'
               GROUP BY bucket),
        cr AS (SELECT bucket, count(*) AS c FROM hb GROUP BY bucket),
        lam AS (SELECT cr.bucket,
                       ln((coalesce(ct.c, 0) + 1) / (nt.n + 1024))
                     - ln((cr.c + 1) / (nr.n + 1024)) AS lam
                FROM cr LEFT JOIN ct USING (bucket), nt, nr),
        docb AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
                 FROM hb GROUP BY doc_id, bucket),
        comp AS (SELECT docb.doc_id, docb.c, docb.c * lam.lam AS x,
                        docb.bucket
                 FROM docb JOIN lam USING (bucket)),
        s AS (SELECT doc_id,
                     list_reduce(list(x ORDER BY bucket),
                                 (a, b) -> a + b) AS acc,
                     CAST(sum(c) AS BIGINT) AS ng
              FROM comp GROUP BY doc_id)
        SELECT d2.doc_id,
               CAST(coalesce(s.ng, 0) AS BIGINT) AS n_grams,
               CAST(CASE WHEN s.acc IS NOT NULL
                         THEN floor(1000000000.0 * s.acc)
                         ELSE 0 END AS BIGINT) AS w_nanonat
        FROM (SELECT doc_id FROM documents) d2 LEFT JOIN s USING (doc_id)
    """


def _fingerprint_sql() -> str:
    """Generate the fingerprint oracle: exact 64-bit FNV-1a in SQL
    (_sql_fnv).  The winnowing min-window fingerprint is sliding-window
    list_min + list_distinct + xor-reduce, mirroring
    engine.stages.text.fingerprint (window=8).  Verified 0 mismatches on
    the testdata at sf0.001/sf0.01."""
    TOK = r"'[^\t\n\v\f\r ]+'"
    fnv = _sql_fnv

    return f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), {TOK}) AS toks,
                 array_to_string(regexp_extract_all(coalesce(text, ''), {TOK}),
                                 ' ') AS norm
          FROM documents
        ), th AS (
          SELECT doc_id, norm,
                 list_transform(toks, tok -> {fnv('tok')}) AS h,
                 len(toks) AS nt
          FROM t
        ), win AS (
          SELECT doc_id, norm, nt, h,
                 CASE
                   WHEN nt = 0 THEN CAST(0 AS HUGEINT)
                   WHEN nt < 8 THEN list_min(h)
                   ELSE list_reduce(
                       list_distinct(list_transform(range(nt - 7),
                                                    i -> list_min(h[i+1:i+8]))),
                       (a, b) -> xor(a, b))
                 END AS wfp
          FROM th
        )
        SELECT doc_id,
               CAST({fnv('norm')} AS VARCHAR) AS doc_fp,
               CAST(wfp AS VARCHAR) AS win_fp
        FROM win
    """


def _winnow_overlap_sql() -> str:
    """Generate the winnow_overlap oracle: exact FNV-1a token hashes
    (_sql_fnv), sliding window-8 minima, list_distinct (the fingerprint
    machinery BEFORE its xor-fold), 63-bit masked to match the engine's
    int64 shuffle keys; df-capped self-join on shared fingerprints —
    the cap (128) and threshold (3) mirror dedup.winnow_overlap_pairs."""
    TOK = r"'[^\t\n\v\f\r ]+'"
    fnv = _sql_fnv

    return f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_extract_all(coalesce(text, ''), {TOK}) AS toks
          FROM documents
        ), th AS (
          SELECT doc_id,
                 list_transform(toks, tok -> {fnv('tok')}) AS h,
                 len(toks) AS nt
          FROM t
          WHERE len(toks) > 0
        ), fpl AS (
          SELECT doc_id,
                 CASE
                   WHEN nt < 8 THEN [list_min(h)]
                   ELSE list_distinct(list_transform(range(nt - 7),
                                                     i -> list_min(h[i+1:i+8])))
                 END AS fps
          FROM th
        ), fp AS (
          SELECT doc_id,
                 CAST(unnest(fps) % 9223372036854775808 AS BIGINT) AS f,
                 len(fps) AS nf
          FROM fpl
        ), dfreq AS (
          SELECT f, count(*) AS df FROM fp GROUP BY f
        ), kept AS (
          SELECT fp.doc_id, fp.f, fp.nf
          FROM fp JOIN dfreq USING (f)
          WHERE dfreq.df BETWEEN 2 AND 128
        ), pairs AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS shared,
                 any_value(a.nf) AS na, any_value(b.nf) AS nb
          FROM kept a JOIN kept b ON a.f = b.f AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT ia AS id_a, ib AS id_b,
               CAST(shared AS BIGINT) AS shared_fps,
               CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(shared * 1000000 // least(na, nb) AS BIGINT) AS overlap_ppm
        FROM pairs
        WHERE shared >= 3
    """


def _warc_dedup_sql() -> str:
    """Generate the warc_dedup oracle: the cdx_pages capture derivation,
    digest = md5(content), shard = fnv1a(digest hex) % 8 (the engine's
    digest-routed layout), original per digest = the (ts, url)-minimum
    capture (row_number), payload bytes stored = originals' utf-8 byte
    lengths.  Matching the read-back manifest proves digest routing, the
    revisit writer and the revisit-aware CDX parser together."""
    fnv = _sql_fnv

    return f"""
        WITH caps AS (
          SELECT 'https://' || source || '.example.com/docs/' ||
                     CAST(doc_id AS VARCHAR) || '.html' AS url,
                 20240101000000 + c AS ts,
                 CASE WHEN c % 2 = 0 THEN coalesce(text, '')
                      ELSE coalesce(text, '') || ' (updated)' END AS content
          FROM documents, range(3) r(c)
          WHERE c < 1 + doc_id % 3
        ), d AS (
          SELECT url, ts, content, md5(content) AS digest FROM caps
        ), r AS (
          SELECT content,
                 row_number() OVER (PARTITION BY digest
                                    ORDER BY ts, url) AS rn,
                 CAST({fnv('digest')} % 8 AS BIGINT) AS shard
          FROM d
        )
        SELECT shard,
               CAST(count(*) AS BIGINT) AS n_records,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_revisits,
               CAST(sum(CASE WHEN rn = 1
                             THEN octet_length(encode(content))
                             ELSE 0 END) AS BIGINT) AS payload_bytes
        FROM r GROUP BY shard
    """


# The politeness-budgeted 2-wave crawl schedule, shared verbatim by the
# crawl_order oracle and every oracle that derives from the schedule
# (crawl_host_budget) — ONE copy, so the crawl constants (8 seeds,
# per-host cap 6, 2 waves) mirroring q_crawl_order's CrawlConfig live in
# exactly two places: here and the engine config.
# shared 2-wave unroll prefix: synthetic link graph, seeds, wave 0
# (mirrors q_crawl_order/_domain/_inlinks's 8-seed / cap-6 config)
_CRAWL_PREFIX = """
            WITH m AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            g AS (
              SELECT doc_id AS gid, source AS gsrc,
                     row_number() OVER (ORDER BY doc_id) - 1 AS gpos
              FROM documents
            ),
            gn AS (SELECT count(*) AS c FROM documents),
            tgt AS (
              SELECT m.doc_id, d.ordn, m2.doc_id AS t, m2.source AS tsrc
              FROM m
              JOIN (VALUES (1),(2),(3)) AS d(ordn) ON true
              JOIN m m2 ON m2.source = m.source AND m2.pos = (m.pos + d.ordn) % m.n
              WHERE m2.doc_id <> m.doc_id
              UNION ALL
              SELECT m.doc_id, 4 AS ordn, g.gid, g.gsrc
              FROM m CROSS JOIN gn JOIN g ON g.gpos = (m.doc_id * 7 + 3) % gn.c
              WHERE g.gid <> m.doc_id
            ),
            links AS (
              SELECT DISTINCT doc_id,
                     'https://' || tsrc || '.example.com/docs/' || t || '.html' AS turl,
                     tsrc || '.example.com' AS thost
              FROM tgt
            ),
            srcs AS (
              SELECT source, min(doc_id) AS first_doc,
                     row_number() OVER (ORDER BY source) AS srn
              FROM documents GROUP BY source
            ),
            seeds AS (
              SELECT 'https://' || source || '.example.com/docs/' || first_doc
                         || '.html' AS url,
                     source || '.example.com' AS host,
                     first_doc AS doc_id
              FROM srcs WHERE srn <= 8
            ),
            wave0 AS (
              SELECT 0 AS wave,
                     CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS seq,
                     url, host, doc_id
              FROM seeds
            ),
            n0 AS (SELECT count(*) AS c FROM wave0)"""

_CRAWL_ORDER_SQL = _CRAWL_PREFIX + """,
            cand1 AS (
              SELECT DISTINCT l.turl AS url, l.thost AS host
              FROM wave0 w JOIN links l ON l.doc_id = w.doc_id
              WHERE l.turl NOT IN (SELECT url FROM seeds)
            ),
            sel1 AS (
              SELECT url, host,
                     row_number() OVER (PARTITION BY host ORDER BY url) AS hrn
              FROM cand1
            ),
            wave1 AS (
              SELECT 1 AS wave,
                     CAST((SELECT c FROM n0)
                          + row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS seq,
                     url, host
              FROM sel1 WHERE hrn <= 6
            )
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave0
            UNION ALL
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave1
"""

# priority_mode="inlinks": wave-1 candidates carry their emission count n
# (one per distinct wave-0 doc linking to them — the links CTE is already
# per-page-deduped like discover_links); priority = 0.5 + 0.01*least(n,9),
# ordering per host and globally by (priority DESC, url).
_CRAWL_ORDER_INLINKS_SQL = _CRAWL_PREFIX + """,
            cand1 AS (
              SELECT l.turl AS url, l.thost AS host, count(*) AS n
              FROM wave0 w JOIN links l ON l.doc_id = w.doc_id
              WHERE l.turl NOT IN (SELECT url FROM seeds)
              GROUP BY l.turl, l.thost
            ),
            pri AS (
              SELECT url, host, 0.5 + 0.01 * least(n, 9) AS p FROM cand1
            ),
            sel1 AS (
              SELECT url, host, p,
                     row_number() OVER (PARTITION BY host ORDER BY p DESC, url) AS hrn
              FROM pri
            ),
            wave1 AS (
              SELECT 1 AS wave,
                     CAST((SELECT c FROM n0)
                          + row_number() OVER (ORDER BY p DESC, url) - 1 AS BIGINT) AS seq,
                     url, host
              FROM sel1 WHERE hrn <= 6
            )
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave0
            UNION ALL
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave1
"""


# politeness_scope="domain": every synthetic host registers under
# example.com, so the whole corpus is ONE politeness unit (cap 6/wave).
# Wave 0: the 6 smallest seed urls (equal priority 1.0).  Wave 1: seed
# carryover (still priority 1.0) ranks ahead of depth-1 links (0.5);
# links pointing at seed urls are already seen.  Mirrors
# q_crawl_order_domain's config (8 seeds / cap 6 / 2 waves).
_CRAWL_ORDER_DOMAIN_SQL = """
            WITH m AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            g AS (
              SELECT doc_id AS gid, source AS gsrc,
                     row_number() OVER (ORDER BY doc_id) - 1 AS gpos
              FROM documents
            ),
            gn AS (SELECT count(*) AS c FROM documents),
            tgt AS (
              SELECT m.doc_id, d.ordn, m2.doc_id AS t, m2.source AS tsrc
              FROM m
              JOIN (VALUES (1),(2),(3)) AS d(ordn) ON true
              JOIN m m2 ON m2.source = m.source AND m2.pos = (m.pos + d.ordn) % m.n
              WHERE m2.doc_id <> m.doc_id
              UNION ALL
              SELECT m.doc_id, 4 AS ordn, g.gid, g.gsrc
              FROM m CROSS JOIN gn JOIN g ON g.gpos = (m.doc_id * 7 + 3) % gn.c
              WHERE g.gid <> m.doc_id
            ),
            links AS (
              SELECT DISTINCT doc_id,
                     'https://' || tsrc || '.example.com/docs/' || t || '.html' AS turl,
                     tsrc || '.example.com' AS thost
              FROM tgt
            ),
            srcs AS (
              SELECT source, min(doc_id) AS first_doc,
                     row_number() OVER (ORDER BY source) AS srn
              FROM documents GROUP BY source
            ),
            seeds AS (
              SELECT 'https://' || source || '.example.com/docs/' || first_doc
                         || '.html' AS url,
                     source || '.example.com' AS host,
                     first_doc AS doc_id
              FROM srcs WHERE srn <= 8
            ),
            seeds_rn AS (
              SELECT url, host, doc_id,
                     row_number() OVER (ORDER BY url) AS rn
              FROM seeds
            ),
            wave0 AS (
              SELECT 0 AS wave, CAST(rn - 1 AS BIGINT) AS seq, url, host, doc_id
              FROM seeds_rn WHERE rn <= 6
            ),
            n0 AS (SELECT count(*) AS c FROM wave0),
            carry AS (
              SELECT url, host FROM seeds_rn WHERE rn > 6
            ),
            cand1 AS (
              SELECT DISTINCT l.turl AS url, l.thost AS host
              FROM wave0 w JOIN links l ON l.doc_id = w.doc_id
              WHERE l.turl NOT IN (SELECT url FROM seeds)
            ),
            u1 AS (
              SELECT url, host, 1.0 AS pri FROM carry
              UNION ALL
              SELECT url, host, 0.5 AS pri FROM cand1
            ),
            sel1 AS (
              SELECT url, host,
                     row_number() OVER (ORDER BY pri DESC, url) AS rn
              FROM u1
            ),
            wave1 AS (
              SELECT 1 AS wave,
                     CAST((SELECT c FROM n0) + rn - 1 AS BIGINT) AS seq,
                     url, host
              FROM sel1 WHERE rn <= 6
            )
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave0
            UNION ALL
            SELECT CAST(wave AS BIGINT) AS wave, seq, url, host FROM wave1
"""


def oracle_sql() -> dict[str, str]:
    from engine.stages.domains import _SUFFIX2

    # the eTLD+1 oracle shares the engine's frozen suffix table verbatim
    _suf2_in = ", ".join(f"'{s}'" for s in _SUFFIX2)
    return {
        "lang_id": _lang_id_sql(),
        "export_wet": f"""
            WITH u AS (SELECT 'https://' || source || '.example.com/docs/'
                              || CAST(doc_id AS VARCHAR) || '.html' AS url
                       FROM documents
                       WHERE length('Document ' || doc_id || '.0' || chr(10)
                                    || text) >= 200),
            h AS (SELECT CAST({_sql_fnv("url")} AS HUGEINT) AS hv FROM u)
            SELECT CAST(hv % 8 AS BIGINT) AS shard,
                   count(*) AS n_records,
                   CAST(sum(hv % 1000000000000) AS BIGINT) AS sum_urlh
            FROM h GROUP BY CAST(hv % 8 AS BIGINT)
        """,
        "export_wat": f"""
            WITH m AS (
              SELECT doc_id, source, text,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            g AS (
              SELECT doc_id AS gid, source AS gsrc,
                     row_number() OVER (ORDER BY doc_id) - 1 AS gpos
              FROM documents
            ),
            gn AS (SELECT count(*) AS c FROM documents),
            tgt AS (
              SELECT m.doc_id, d.ordn, m2.doc_id AS t, m2.source AS tsrc
              FROM m
              JOIN (VALUES (1),(2),(3)) AS d(ordn) ON true
              JOIN m m2 ON m2.source = m.source AND m2.pos = (m.pos + d.ordn) % m.n
              WHERE m2.doc_id <> m.doc_id
              UNION ALL
              SELECT m.doc_id, 4 AS ordn, g.gid, g.gsrc
              FROM m CROSS JOIN gn JOIN g ON g.gpos = (m.doc_id * 7 + 3) % gn.c
              WHERE g.gid <> m.doc_id
            ),
            tgtd AS (
              SELECT doc_id, ordn, t, tsrc,
                     row_number() OVER (PARTITION BY doc_id, t ORDER BY ordn) AS rk
              FROM tgt
            ),
            links AS (
              SELECT doc_id,
                     string_agg('<a href="https://' || tsrc || '.example.com/docs/' || t
                         || '.html">d' || t || '</a> ', '' ORDER BY ordn) AS l,
                     count(*) AS n_links
              FROM tgtd WHERE rk = 1 GROUP BY doc_id
            ),
            page AS (
              SELECT m.doc_id, m.source,
                     'https://' || m.source || '.example.com/docs/' || m.doc_id
                         || '.html' AS url,
                     coalesce(l.n_links, 0) AS n_links,
                     length(
                     '<!DOCTYPE html><html><head><title>Document ' || m.doc_id || '.0</title>'
                     || '<meta name="description" content="synthetic doc ' || m.doc_id
                     || ' from ' || m.source || '">'
                     || '<meta name="keywords" content="' || m.source || ', doc' || m.doc_id
                     || ', synthetic">'
                     || '</head><body><nav>' || coalesce(l.l, '') || '</nav>'
                     || '<article><h1>Document ' || m.doc_id || '.0</h1><p>'
                     || replace(m.text, '<', '&lt;') || '</p></article>'
                     || '</body></html>') AS html_len
              FROM m LEFT JOIN links l ON l.doc_id = m.doc_id
            ),
            h AS (SELECT CAST({_sql_fnv("url")} AS HUGEINT) AS hv,
                         n_links, html_len
                  FROM page)
            SELECT CAST(hv % 8 AS BIGINT) AS shard,
                   count(*) AS n_records,
                   CAST(sum(hv % 1000000000000) AS BIGINT) AS sum_urlh,
                   CAST(sum(n_links) AS BIGINT) AS sum_links,
                   CAST(sum(html_len) AS BIGINT) AS sum_html_len
            FROM h GROUP BY CAST(hv % 8 AS BIGINT)
        """,
        "export_warc": f"""
            WITH u AS (SELECT 'https://' || source || '.example.com/docs/'
                              || CAST(doc_id AS VARCHAR) || '.html' AS url
                       FROM documents),
            h AS (SELECT CAST({_sql_fnv("url")} AS HUGEINT) AS hv FROM u)
            SELECT CAST(hv % 8 AS BIGINT) AS shard,
                   count(*) AS n_records,
                   CAST(sum(hv % 1000000000000) AS BIGINT) AS sum_urlh
            FROM h GROUP BY CAST(hv % 8 AS BIGINT)
        """,
        "lang_confusion": f"""
            SELECT d.lang, p.lang_pred, count(*) AS n
            FROM documents d JOIN ({_lang_id_sql()}) p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
        """,
        "outlinks": r"""
            WITH m AS (SELECT doc_id, source,
                              row_number() OVER (PARTITION BY source
                                                 ORDER BY doc_id) - 1 AS pos,
                              count(*) OVER (PARTITION BY source) AS n
                       FROM documents),
            nbr AS (SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc
                    FROM m a
                    JOIN (SELECT unnest([1, 2, 3]) AS d) dd ON true
                    JOIN m b ON b.source = a.source
                           AND b.pos = (a.pos + dd.d) % a.n
                    WHERE b.doc_id <> a.doc_id),
            g AS (SELECT doc_id,
                         row_number() OVER (ORDER BY doc_id) - 1 AS grn,
                         count(*) OVER () AS nn
                  FROM documents),
            cl AS (SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc
                   FROM g a JOIN g b ON b.grn = (a.doc_id * 7 + 3) % a.nn
                   WHERE b.doc_id <> a.doc_id)
            SELECT DISTINCT src_doc, dst_doc
            FROM (SELECT * FROM nbr UNION ALL SELECT * FROM cl)
        """,
        "dedup_report": r"""
            WITH h AS (SELECT doc_id, source, md5(coalesce(text, '')) AS h
                       FROM documents),
            w AS (SELECT source,
                         CASE WHEN doc_id > min(doc_id) OVER (PARTITION BY h)
                              THEN 1 ELSE 0 END AS isdup
                  FROM h)
            SELECT source, count(*) AS n_docs,
                   CAST(sum(isdup) AS BIGINT) AS n_dup,
                   CAST(sum(isdup) * 1000000 // count(*) AS BIGINT) AS dup_ppm
            FROM w GROUP BY source
        """,
        "fingerprint": _fingerprint_sql(),
        "winnow_overlap": _winnow_overlap_sql(),
        "warc_dedup": _warc_dedup_sql(),
        # logical CDX: md5 digest (the repo-wide exact-dedup hash, native in
        # DuckDB), reverse-host SURT (the surt_hosts device), utf-8 byte
        # length, revisit = strictly-later capture of (url, digest)
        "cdx_pages": """
            WITH caps AS (
              SELECT 'https://' || source || '.example.com/docs/' ||
                         CAST(doc_id AS VARCHAR) || '.html' AS url,
                     array_to_string(list_reverse(string_split(
                         source || '.example.com', '.')), ',')
                         || ')/docs/' || CAST(doc_id AS VARCHAR) || '.html' AS surt,
                     20240101000000 + c AS ts,
                     CASE WHEN c % 2 = 0 THEN coalesce(text, '')
                          ELSE coalesce(text, '') || ' (updated)' END AS content
              FROM documents, range(3) r(c)
              WHERE c < 1 + doc_id % 3
            )
            SELECT surt, ts, url,
                   md5(content) AS digest,
                   CAST(octet_length(encode(content)) AS BIGINT) AS length,
                   ts > min(ts) OVER (PARTITION BY url, md5(content)) AS revisit
            FROM caps
        """,
        "dsir": _dsir_sql(),
        # redirect-chain resolution: the engine runs log-many pointer-
        # doubling joins; the oracle walks the same deterministic
        # functional graph one hop at a time with a recursive CTE
        # (acyclic by construction: every edge strictly decreases u)
        "redirects": """
            WITH RECURSIVE e AS (
              SELECT doc_id AS src,
                     CASE WHEN doc_id % 3 = 0 THEN doc_id // 2
                          ELSE doc_id - 1 END AS dst
              FROM documents WHERE doc_id % 17 <> 0 AND doc_id > 0
            ),
            -- DISTINCT over UNION ALL, not bare UNION: inside a WITH
            -- RECURSIVE block DuckDB parses a UNION CTE as an
            -- anchor/recursive pair and skips the dedup
            nodes AS (SELECT DISTINCT node FROM (
                      SELECT src AS node FROM e
                      UNION ALL SELECT dst FROM e)),
            walk AS (
              SELECT src AS node, dst AS ptr, 1 AS hops FROM e
              UNION ALL
              SELECT w.node, e.dst, w.hops + 1
              FROM walk w JOIN e ON w.ptr = e.src
            ),
            fin AS (SELECT node, ptr AS final, hops FROM walk w
                    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.ptr))
            SELECT n.node,
                   CAST(coalesce(f.final, n.node) AS BIGINT) AS final,
                   CAST(coalesce(f.hops, 0) AS BIGINT) AS hops
            FROM nodes n LEFT JOIN fin f USING (node)
        """,
        "bm25_topk": _bm25_sql(),
        "prf_expansion": _prf_sql(),
        "rrf_hybrid": _rrf_sql(),
        # pruned WAND evaluation is an OPTIMIZATION with a pinned-identical
        # contract: the oracle is the exact BM25 ranking itself
        "wand_topk": _bm25_sql(),
        "more_like_this": _mlt_sql(),
        # positional phrase query: DuckDB list lambdas over the same
        # tokenizer char class; overlapping counts, 1-based token index
        "phrase_search": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), hits AS (
              SELECT doc_id,
                     list_min(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'value' AND tk[i+1] = 'table'
                            THEN i ELSE NULL END)) AS fp,
                     CAST(coalesce(list_sum(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'value' AND tk[i+1] = 'table'
                            THEN 1 ELSE 0 END)), 0) AS BIGINT) AS phrase_count
              FROM toks
            )
            SELECT doc_id, CAST(fp AS BIGINT) AS first_pos, phrase_count
            FROM hits WHERE phrase_count > 0
        """,
        # conjunctive search + snippet: position() is char-based 1-indexed,
        # snippet cut from lower(text) on both sides (normalized contract)
        "snippet_search": """
            WITH lt AS (SELECT doc_id, lower(text) AS t FROM documents),
            p AS (SELECT doc_id, t,
                         position('merge' IN t) AS p1,
                         position('batch' IN t) AS p2
                  FROM lt)
            SELECT doc_id,
                   CASE WHEN p1 <= p2 THEN 'merge' ELSE 'batch' END AS anchor_term,
                   CAST(least(p1, p2) AS BIGINT) AS anchor_pos,
                   substring(t, greatest(1, least(p1, p2) - 40), 120) AS snippet
            FROM p WHERE p1 > 0 AND p2 > 0
        """,
        "search_facets": """
            WITH m AS (SELECT * FROM documents
                       WHERE position('merge' IN lower(text)) > 0)
            SELECT 'lang' AS facet, lang AS value,
                   CAST(count(*) AS BIGINT) AS doc_count FROM m GROUP BY lang
            UNION ALL
            SELECT 'source' AS facet, source AS value,
                   CAST(count(*) AS BIGINT) AS doc_count FROM m GROUP BY source
        """,
        # did-you-mean: DuckDB levenshtein is the same plain edit distance
        # as the engine's batched DP; rank (dist, cf desc, term)
        "spell_suggest": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+')) AS term
              FROM documents
            ), vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY term
            )
            SELECT term, cf, CAST(levenshtein(term, 'pat') AS BIGINT) AS dist
            FROM vocab WHERE levenshtein(term, 'pat') <= 2
            ORDER BY dist, cf DESC, term LIMIT 5
        """,
        # both sides are RE2 with leftmost non-overlapping match counts
        "regex_search": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, 'ta[bg]le')) AS BIGINT)
                     AS n_matches
            FROM documents WHERE regexp_matches(text, 'ta[bg]le')
        """,
        # exact varint byte counts: CASE thresholds mirror the engine's
        # searchsorted table (ids here < 2^28 so 5 levels suffice)
        "index_size_est": r"""
            WITH tokd AS (
              SELECT DISTINCT doc_id, unnest(regexp_extract_all(
                     coalesce(text,''), '[^\t\n\x0b\x0c\r ]+')) AS token
              FROM documents
            ), p AS (
              SELECT token, doc_id FROM tokd
              WHERE token IN ('value', 'table', 'join', 'dup')
            ), g AS (
              SELECT token, doc_id,
                     doc_id - lag(doc_id) OVER (PARTITION BY token
                                                ORDER BY doc_id) AS gap
              FROM p
            ), v AS (SELECT token, greatest(coalesce(gap, doc_id), 0) AS val
                     FROM g),
            b AS (SELECT token,
                         CASE WHEN val < 128 THEN 1 WHEN val < 16384 THEN 2
                              WHEN val < 2097152 THEN 3
                              WHEN val < 268435456 THEN 4
                              ELSE 5 END AS nb
                  FROM v)
            SELECT token, CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(nb) AS BIGINT) AS postings_bytes
            FROM b GROUP BY token
        """,
        # two-phase ranking: phase-1 window by (tf1 desc, id), phase-2
        # integer rescore INSIDE the window only (the ES rescore contract)
        "rescore": r"""
            WITH tf AS (
              SELECT doc_id,
                CAST(len(list_filter(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+'), t -> t = 'value'))
                  AS BIGINT) AS tf1,
                CAST(len(list_filter(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+'), t -> t = 'table'))
                  AS BIGINT) AS tf2
              FROM documents
            ), nz AS (SELECT * FROM tf WHERE tf1 > 0),
            win AS (SELECT * FROM nz ORDER BY tf1 DESC, doc_id LIMIT 50),
            sc AS (SELECT doc_id, tf1, tf2,
                          CAST(2*tf1 + 3*tf2 AS BIGINT) AS score2 FROM win)
            SELECT CAST(row_number() OVER (ORDER BY score2 DESC, doc_id)
                        AS BIGINT) AS rank,
                   doc_id, tf1, tf2, score2
            FROM sc ORDER BY rank LIMIT 10
        """,
        "fuzzy_search": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+')) AS term
              FROM documents
            ), m AS (
              SELECT doc_id, CAST(levenshtein(term, 'tble') AS BIGINT) AS d
              FROM toks WHERE levenshtein(term, 'tble') <= 1
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fuzzy_tokens,
                   CAST(min(d) AS BIGINT) AS best_dist
            FROM m GROUP BY doc_id
        """,
        "oov_rate": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+')) AS term
              FROM documents
            ), vocab AS (
              SELECT term FROM (SELECT term, count(*) AS cf FROM tok
                                GROUP BY term)
              ORDER BY cf DESC, term LIMIT 20
            ), per AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(count(*) FILTER (WHERE term NOT IN
                          (SELECT term FROM vocab)) AS BIGINT) AS n_oov
              FROM tok GROUP BY doc_id
            )
            SELECT doc_id, n_tokens, n_oov,
                   (1000000 * n_oov) // n_tokens AS oov_ppm
            FROM per WHERE n_tokens > 0
        """,
        # keyset pagination: strictly-after-cursor filter, page-local rank
        "search_after": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(coalesce(text,''),
                          '[^\t\n\x0b\x0c\r ]+')) AS BIGINT) AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                        AS BIGINT) AS rank
            FROM t WHERE n_tokens < 60 OR (n_tokens = 60 AND doc_id > 0)
            ORDER BY n_tokens DESC, doc_id LIMIT 10
        """,
        # integer half-life decay: 1e6 >> (age//7) is exact on both sides
        # (float exp is not); CAST(ts AS DATE) truncation == floor for
        # positive timestamps, age clamped at 0
        "decay_scores": """
            WITH e AS (
              SELECT user_id,
                     GREATEST(date_diff('day', CAST(ts AS DATE),
                              DATE '2024-02-01'), 0) AS age
              FROM events
            ), s AS (
              SELECT user_id,
                     CAST(sum(1000000 >> LEAST(age // 7, 62)) AS BIGINT)
                         AS score
              FROM e GROUP BY user_id
            )
            SELECT user_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, user_id)
                        AS BIGINT) AS rank
            FROM s ORDER BY score DESC, user_id LIMIT 20
        """,
        # multi_match title^3+body: title = first 6 tokens (list slice is
        # 1-based inclusive), integer field-boost scoring
        "multi_match": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), s AS (
              SELECT doc_id,
                     CAST(len(list_filter(tk[1:6], x -> x = 'merge'))
                          AS BIGINT) AS tf_title,
                     CAST(len(list_filter(tk[7:], x -> x = 'merge'))
                          AS BIGINT) AS tf_body
              FROM t
            )
            SELECT doc_id, tf_title, tf_body,
                   CAST(3*tf_title + tf_body AS BIGINT) AS score,
                   CAST(row_number() OVER (
                        ORDER BY 3*tf_title + tf_body DESC, doc_id)
                        AS BIGINT) AS rank
            FROM s WHERE tf_title + tf_body > 0
            ORDER BY score DESC, doc_id LIMIT 10
        """,
        # integer revenue cents: floor(p*(1-d)*100+0.5) is the identical
        # IEEE float64 expression on both sides; sums exact int64
        "shipping_priority": """
            WITH c AS (SELECT c_custkey FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
            o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
                  WHERE o_orderdate < TIMESTAMP '1995-03-15'
                    AND o_custkey IN (SELECT c_custkey FROM c)),
            l AS (SELECT l_orderkey,
                         CAST(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT) AS cents
                  FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-03-15'
                    AND l_orderkey IN (SELECT o_orderkey FROM o))
            SELECT l.l_orderkey, CAST(sum(l.cents) AS BIGINT) AS revenue_c,
                   CAST(epoch_us(any_value(o.o_orderdate)) // 86400000000
                        AS BIGINT) AS order_day,
                   any_value(o.o_orderpriority) AS o_orderpriority
            FROM l JOIN o ON o.o_orderkey = l.l_orderkey
            GROUP BY l.l_orderkey
            ORDER BY revenue_c DESC, l_orderkey LIMIT 10
        """,
        "late_orders": """
            WITH late AS (
              SELECT o.o_orderkey FROM orders o
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE epoch_us(l.l_shipdate) // 86400000000
                    > epoch_us(o.o_orderdate) // 86400000000 + 120
              GROUP BY o.o_orderkey)
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
            FROM orders
            WHERE o_orderkey IN (SELECT o_orderkey FROM late)
            GROUP BY o_orderpriority
        """,
        # CC with a FULL SQL oracle: closure with min-label pruning
        # (r.lbl < u.b keeps only useful propagations; the component min
        # always passes).  NB the und/nodes CTEs use SELECT DISTINCT over
        # UNION ALL -- inside WITH RECURSIVE a bare UNION is parsed as an
        # anchor/recursive pair and skips dedup (CLAUDE.md).
        "graph_components": """
            WITH RECURSIVE m AS (SELECT doc_id, source,
                    CAST(row_number() OVER (
                        PARTITION BY source ORDER BY doc_id) - 1
                        AS BIGINT) AS pos,
                    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
                FROM documents),
            offs(d) AS (VALUES (1), (2), (3)),
            ring AS (SELECT a.doc_id AS src, b.doc_id AS dst
                     FROM m a JOIN m b ON a.source = b.source
                     CROSS JOIN offs
                     WHERE b.pos = (a.pos + offs.d) % a.n
                       AND b.doc_id != a.doc_id),
            ord AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1
                                   AS BIGINT) AS idx FROM documents),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
            crosse AS (SELECT a.doc_id AS src, b.doc_id AS dst
                       FROM documents a CROSS JOIN nn
                       JOIN ord b ON b.idx = (a.doc_id * 7 + 3) % nn.c
                       WHERE b.doc_id != a.doc_id),
            edges AS (SELECT DISTINCT src, dst
                      FROM (SELECT * FROM ring UNION ALL SELECT * FROM crosse)
                      WHERE (src + dst) % 3 != 0),
            und AS (SELECT DISTINCT a, b FROM
                    (SELECT src AS a, dst AS b FROM edges
                     UNION ALL SELECT dst, src FROM edges)),
            nodes AS (SELECT DISTINCT a AS node FROM und),
            reach(node, lbl) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.node
              WHERE r.lbl < u.b
            )
            SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        """,
        "percolate": """
            WITH lt AS (SELECT doc_id, lower(coalesce(text,'')) AS t
                        FROM documents),
            q(query_id) AS (VALUES (1), (2), (3), (4))
            SELECT doc_id, CAST(query_id AS BIGINT) AS query_id
            FROM lt, q
            WHERE (query_id = 1 AND position('merge' IN t) > 0)
               OR (query_id = 2 AND position('batch' IN t) > 0
                               AND position('window' IN t) > 0)
               OR (query_id = 3 AND position('table' IN t) > 0
                               AND position('merge' IN t) = 0)
               OR (query_id = 4 AND position('zebra' IN t) > 0)
        """,
        "bool_search": """
            WITH lt AS (SELECT doc_id, lower(coalesce(text,'')) AS t
                        FROM documents),
            f AS (SELECT doc_id,
                    CAST((position('batch' IN t) > 0)::BIGINT
                       + (position('window' IN t) > 0)::BIGINT AS BIGINT)
                      AS n_should,
                    position('merge' IN t) > 0 AS m1,
                    position('zebra' IN t) > 0 AS nn
                  FROM lt)
            SELECT doc_id, n_should
            FROM f WHERE m1 AND NOT nn AND n_should >= 1
        """,
        "positional_postings": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), p AS (
              SELECT doc_id, 'value' AS token,
                     list_filter(range(1, len(tk)+1), i -> tk[i] = 'value')
                       AS pos FROM toks
              UNION ALL
              SELECT doc_id, 'sort',
                     list_filter(range(1, len(tk)+1), i -> tk[i] = 'sort')
                FROM toks
            )
            SELECT token, doc_id, CAST(len(pos) AS BIGINT) AS tf,
                   array_to_string(pos, ',') AS positions
            FROM p WHERE len(pos) > 0
        """,
        # same token-lambda device as phrase_search, phrase 'key agg'
        "phrase_index": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), hits AS (
              SELECT doc_id,
                     list_min(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'key' AND tk[i+1] = 'agg'
                            THEN i ELSE NULL END)) AS fp,
                     CAST(coalesce(list_sum(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'key' AND tk[i+1] = 'agg'
                            THEN 1 ELSE 0 END)), 0) AS BIGINT) AS phrase_count
              FROM toks
            )
            SELECT doc_id, CAST(fp AS BIGINT) AS first_pos, phrase_count
            FROM hits WHERE phrase_count > 0
        """,
        # same RE2 classes both sides; DuckDB length() is codepoint-based
        # like pc.utf8_length
        "encoding_anomalies": r"""
            WITH c AS (
              SELECT doc_id,
                CAST(length(coalesce(text,'')) AS BIGINT) AS n_chars,
                CAST(len(regexp_extract_all(coalesce(text,''), '\x{FFFD}'))
                  AS BIGINT) AS n_replacement,
                CAST(len(regexp_extract_all(coalesce(text,''),
                     '[\x00-\x08\x0e-\x1f\x7f]')) AS BIGINT) AS n_control
              FROM documents)
            SELECT doc_id, n_chars, n_replacement, n_control,
                   (1000000 * (n_replacement + n_control)) // n_chars
                     AS anomaly_ppm
            FROM c WHERE n_chars > 0
        """,
        # exact integer ppm ranks: floor division both sides
        "percentile_ranks": """
            WITH probes(value) AS (VALUES (100.0), (250.0), (500.0)),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
            SELECT p.value,
                   CAST(count(*) FILTER (WHERE d.n_chars <= p.value) AS BIGINT)
                     AS cnt_le,
                   any_value(n.n) AS n,
                   CAST((1000000 * count(*) FILTER (WHERE d.n_chars <= p.value))
                        // any_value(n.n) AS BIGINT) AS rank_ppm
            FROM probes p, documents d, n
            GROUP BY p.value
        """,
        # pipeline agg over the tumbling-window histogram: window fns on
        # the SAME bucket expression as events_window
        "events_moving": """
            WITH w AS (
              SELECT epoch_us(ts) // 3600000000 AS bucket, event_type,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2
            )
            SELECT bucket, event_type, n_events,
                   CAST(sum(n_events) OVER (PARTITION BY event_type
                        ORDER BY bucket
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS moving_sum3,
                   CAST(n_events - coalesce(lag(n_events) OVER (
                        PARTITION BY event_type ORDER BY bucket), 0)
                     AS BIGINT) AS delta
            FROM w
        """,
        # fg/bg df with DISTINCT-per-doc semantics; integer cross-multiplied
        # rate score -- no division, bit-exact
        "significant_terms": r"""
            WITH tokd AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+')) AS term
              FROM documents
            ), fg_ids AS (
              SELECT doc_id FROM documents
              WHERE position('merge' IN lower(coalesce(text,''))) > 0
            ), nf AS (SELECT CAST(count(*) AS BIGINT) n_fg FROM fg_ids),
               nb AS (SELECT CAST(count(*) AS BIGINT) n_bg FROM documents),
            df AS (
              SELECT term,
                     CAST(count(*) FILTER (WHERE doc_id IN
                          (SELECT doc_id FROM fg_ids)) AS BIGINT) AS fg_df,
                     CAST(count(*) AS BIGINT) AS bg_df
              FROM tokd GROUP BY term
            )
            SELECT term, fg_df, bg_df,
                   CAST(fg_df * (SELECT n_bg FROM nb)
                        - bg_df * (SELECT n_fg FROM nf) AS BIGINT) AS score
            FROM df WHERE fg_df >= 1
            ORDER BY score DESC, term LIMIT 10
        """,
        "collapse_topk": r"""
            WITH tf AS (
              SELECT doc_id, source,
                CAST(len(list_filter(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+'), t -> t = 'value'))
                  AS BIGINT) AS tf
              FROM documents
            ), nz AS (SELECT * FROM tf WHERE tf > 0),
            best AS (
              SELECT source, doc_id, tf,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY tf DESC, doc_id) AS rn
              FROM nz)
            SELECT CAST(row_number() OVER (ORDER BY tf DESC, doc_id)
                        AS BIGINT) AS rank,
                   source, doc_id, tf
            FROM best WHERE rn = 1 ORDER BY rank LIMIT 4
        """,
        "balanced_shards": """
            SELECT doc_id, n_chars,
              CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1
                   AS BIGINT) AS rank,
              CAST((row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1) % 16
                   AS BIGINT) AS shard
            FROM documents
        """,
        "prefix_suggest": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+')) AS term
              FROM documents
            ), vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY term
            )
            SELECT term, cf FROM vocab WHERE starts_with(term, 's')
            ORDER BY cf DESC, term LIMIT 4
        """,
        # integer fixed-point Flesch: positive-operand floor divisions,
        # identical in DuckDB's BIGINT // and numpy's int64 //
        "readability": r"""
            WITH c AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(coalesce(text,''),
                     '[^	

 ]+')) AS BIGINT) AS n_words,
                CAST(greatest(len(regexp_extract_all(coalesce(text,''),
                     '[.!?]+')), 1) AS BIGINT) AS n_sentences,
                CAST(len(regexp_extract_all(lower(coalesce(text,'')),
                     '[aeiouy]+')) AS BIGINT) AS n_syllables
              FROM documents)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   206835 - (1015 * n_words) // n_sentences
                          - (84600 * n_syllables) // greatest(n_words, 1)
                     AS flesch_milli
            FROM c WHERE n_words > 0
        """,
        # exact quantized covariance moments: floor(x*2^16 + 0.5) is the
        # same IEEE float64 expression the engine evaluates; sums are
        # integer-exact on both sides
        "emb_covariance": """
            WITH q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                     CAST(floor(unnest(embedding) * 65536.0 + 0.5) AS BIGINT) AS v
              FROM embeddings
            ), s AS (SELECT i, CAST(sum(v) AS BIGINT) AS s1 FROM q GROUP BY i),
               nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM q)
            SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS s2,
                   any_value(sa.s1) AS si, any_value(sb.s1) AS sj,
                   any_value(nn.n) AS n
            FROM q a JOIN q b USING (vec_id)
                 JOIN s sa ON sa.i = a.i JOIN s sb ON sb.i = b.i, nn
            WHERE b.i >= a.i
            GROUP BY a.i, b.i
        """,
        "pii_scrub": _pii_sql(),
        # crawl-snapshot diff: the mutated second snapshot is re-derived
        # in SQL (drop %31, append ' v2' on %17, re-add %41 under +1e6);
        # content compare == md5 compare
        "recrawl": """
            WITH diff AS (
            WITH old AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
            new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
              FROM old WHERE doc_id % 31 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
              FROM old WHERE doc_id % 41 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'same'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        )
            SELECT doc_id, status,
                   CAST(CASE status WHEN 'changed' THEN 43200
                                    WHEN 'same' THEN 172800
                                    WHEN 'added' THEN 86400
                                    ELSE -1 END AS BIGINT) AS interval_s
            FROM diff
        """,
        "snapshot_diff": """
            WITH old AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
            new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
              FROM old WHERE doc_id % 31 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
              FROM old WHERE doc_id % 41 = 0
            )
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN o.text = n.text THEN 'same'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        """,
        # JSON property extraction over the events props column
        "json_props": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        # latest event per user: argmax by (ts, event_id)
        "latest_events": """
            SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                   event_type
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        # coalesce mirrors the Python `(x or "")` null handling throughout
        "exact_dedup": """
            SELECT md5(coalesce(text, '')) AS h, min(doc_id) AS doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY md5(coalesce(text, ''))
        """,
        # tokenizer class matches engine.stages.text._TOKEN exactly
        # (explicit ASCII whitespace — Python \S and RE2 \S disagree on
        # Unicode spaces)
        "token_stats": r"""
            WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '[^\t\n\v\f\r ]+')) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(
                       regexp_extract_all(text, '[^\t\n\v\f\r ]+'),
                       x -> length(x))), 0) AS BIGINT) AS tok_chars
            FROM d
        """,
        "doc_filter": r"""
            SELECT doc_id, lang, n_chars,
                   length(regexp_extract_all(coalesce(text, ''),
                                             '[^\t\n\v\f\r ]+')) AS n_tokens
            FROM documents
            WHERE n_chars >= 200
              AND length(regexp_extract_all(coalesce(text, ''),
                                            '[^\t\n\v\f\r ]+')) >= 40
        """,
        "pack_sequences": r"""
            WITH d AS (
              SELECT doc_id,
                     length(regexp_extract_all(coalesce(text, ''),
                                               '[^\t\n\v\f\r ]+')) AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS stream_offset
              FROM d
            )
            SELECT doc_id, n_tokens, stream_offset,
                   stream_offset // 2048 AS pack_id
            FROM c
        """,
        "dedup_corpus": """
            SELECT doc_id, lang, n_chars
            FROM (SELECT doc_id, lang, n_chars,
                         row_number() OVER (PARTITION BY md5(coalesce(text, ''))
                                            ORDER BY doc_id) AS rn
                  FROM documents)
            WHERE rn = 1
        """,
        # per-doc sink retry protocol (es_sink parity) driven by the
        # deterministic md5 fault injector: hv%23==0 -> retryable failure
        # every attempt (exhausts max_retries=3 -> 'failed'/3);
        # hv%23==1 -> non-retryable 400 analog ('rejected'/1);
        # else hv%5==0 -> transient, succeeds on retry ('indexed'/2);
        # else first-try success ('indexed'/1)
        "sink_status": """
            SELECT doc_id,
                   CASE WHEN hv % 23 = 0 THEN 'failed'
                        WHEN hv % 23 = 1 THEN 'rejected'
                        ELSE 'indexed' END AS status,
                   CAST(CASE WHEN hv % 23 = 0 THEN 3
                             WHEN hv % 23 = 1 THEN 1
                             WHEN hv % 5 = 0 THEN 2
                             ELSE 1 END AS BIGINT) AS attempts,
                   CASE WHEN hv % 23 = 0 THEN 'bulk_error'
                        WHEN hv % 23 = 1 THEN 'rejected_400'
                        ELSE '' END AS reason
            FROM (SELECT doc_id,
                         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS hv
                  FROM documents)
        """,
        # Gopher-style repetition signals; the words list is the repo-wide
        # SQL-portable tokenizer; ppm ints via floor (bit-reproducible)
        "rep_stats": r"""
            WITH d AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text,''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            wc AS (SELECT doc_id, unnest(w) AS word FROM d),
            wcounts AS (SELECT doc_id, word, count(*) AS c FROM wc GROUP BY doc_id, word),
            wstat AS (SELECT doc_id,
                             CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) AS dups
                      FROM wcounts GROUP BY doc_id),
            g AS (SELECT doc_id,
                         list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2]) AS grams
                  FROM d),
            gc AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            gcounts AS (SELECT doc_id, gram, count(*) AS c FROM gc GROUP BY doc_id, gram),
            gstat AS (SELECT doc_id,
                             CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) AS gdups,
                             CAST(coalesce(max(c), 0) AS BIGINT) AS gmax
                      FROM gcounts GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(CASE WHEN len(w) > 0
                             THEN floor(1000000.0 * coalesce(wstat.dups, 0) / len(w))
                             ELSE 0 END AS BIGINT) AS dup_word_ppm,
                   CAST(CASE WHEN len(w) > 1
                             THEN floor(1000000.0 * coalesce(gstat.gdups, 0) / (len(w) - 1))
                             ELSE 0 END AS BIGINT) AS dup_gram2_ppm,
                   CAST(CASE WHEN len(w) > 1
                             THEN floor(1000000.0 * coalesce(gstat.gmax, 0) / (len(w) - 1))
                             ELSE 0 END AS BIGINT) AS top_gram2_ppm
            FROM d LEFT JOIN wstat USING (doc_id) LEFT JOIN gstat USING (doc_id)
        """,
        # CCNet-style cross-corpus line dedup: a line dropped everywhere
        # when it appears in >= 2 DISTINCT docs; clean_text rebuilt in
        # original order (string_agg skips NULLed hot lines)
        "line_dedup": r"""
            WITH l AS (SELECT doc_id, ord, line FROM (
                    SELECT doc_id,
                           unnest(string_split(coalesce(text, ''), chr(10))) AS line,
                           generate_subscripts(string_split(coalesce(text, ''), chr(10)), 1) AS ord
                    FROM documents)),
            hot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS d
                                      FROM l GROUP BY line)
                    WHERE d >= 2)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(coalesce(sum(CASE WHEN line IN (SELECT line FROM hot)
                                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped,
                   coalesce(string_agg(CASE WHEN line IN (SELECT line FROM hot)
                                            THEN NULL ELSE line END,
                                       chr(10) ORDER BY ord), '') AS clean_text,
                   CAST(length(coalesce(string_agg(
                        CASE WHEN line IN (SELECT line FROM hot) THEN NULL ELSE line END,
                        chr(10) ORDER BY ord), '')) AS BIGINT) AS clean_chars
            FROM l GROUP BY doc_id
        """,
        # exact duplicated-span removal (Lee et al. arXiv:2107.06499,
        # fixed-width variant): every 8-token window occurring >= 2 times
        # keeps only its globally first occurrence, first = min packed
        # (doc_id * 2^20 + start); non-first occurrences' token indices
        # [p, p+7] are dropped and the doc rebuilt in order.  Groups by
        # the window STRING where the engine groups by a 60-bit md5 of it
        # (collision probability ~|windows|^2 / 2^60 — negligible).
        "span_dedup": r"""
            WITH d AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            occ AS (SELECT doc_id, w,
                           CAST(unnest(range(1, greatest(len(w) - 6, 1))) AS BIGINT) AS p
                    FROM d),
            o2 AS (SELECT doc_id, p, array_to_string(w[p : p + 7], ' ') AS win
                   FROM occ),
            f AS (SELECT win, min(doc_id * 1048576 + p) AS fk, count(*) AS n
                  FROM o2 GROUP BY win),
            drops AS (SELECT DISTINCT o2.doc_id, o2.p + k.k AS j
                      FROM o2 JOIN f USING (win)
                      CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k
                      WHERE f.n >= 2 AND o2.doc_id * 1048576 + o2.p <> f.fk),
            tok AS (SELECT doc_id, unnest(w) AS tk, generate_subscripts(w, 1) AS j
                    FROM d),
            kept AS (SELECT t.doc_id, string_agg(t.tk, ' ' ORDER BY t.j) AS clean_text
                     FROM tok t LEFT JOIN drops x ON t.doc_id = x.doc_id AND t.j = x.j
                     WHERE x.j IS NULL
                     GROUP BY t.doc_id),
            nd AS (SELECT doc_id, count(*) AS n_dropped FROM drops GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(len(d.w) AS BIGINT) AS n_tokens,
                   CAST(coalesce(nd.n_dropped, 0) AS BIGINT) AS n_dropped,
                   coalesce(kept.clean_text, '') AS clean_text,
                   CAST(length(coalesce(kept.clean_text, '')) AS BIGINT) AS clean_chars
            FROM d LEFT JOIN kept USING (doc_id) LEFT JOIN nd USING (doc_id)
        """,
        # benchmark decontamination: distinct word 5-grams vs the
        # doc_id % 97 == 0 eval subset's gram set
        "decontam": r"""
            WITH d AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text,''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(range(greatest(len(w) - 4, 0)),
                             i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
                                  w[i+4] || ' ' || w[i+5])) AS grams
                  FROM d),
            ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
            gd AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            hits AS (SELECT doc_id, count(*) AS cnt FROM gd
                     WHERE gram IN (SELECT gram FROM ev) GROUP BY doc_id)
            SELECT g.doc_id,
                   CAST(len(grams) AS BIGINT) AS n_grams,
                   CAST(coalesce(hits.cnt, 0) AS BIGINT) AS contam_grams
            FROM g LEFT JOIN hits USING (doc_id)
        """,
        # inverted-index term dictionary head: df = docs containing the
        # token, cf = total occurrences; deterministic (cf desc, token)
        # order — token is unique so the LIMIT cut is total-ordered
        "term_stats": r"""
            WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
                                coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                         FROM documents)
            SELECT token,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                   CAST(count(*) AS BIGINT) AS cf
            FROM tok GROUP BY token
            ORDER BY cf DESC, token LIMIT 200
        """,
        # phi-heavy-hitter tokens (count/N >= 2000 ppm): the engine runs a
        # Misra-Gries sketch pass + an exact confirm pass over the sketch's
        # candidate superset, so despite the sketch the counts are EXACT
        # and SQL-verifiable
        "heavy_hitters": r"""
            WITH tok AS (SELECT unnest(regexp_extract_all(
                                coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                         FROM documents),
            n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tok)
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM tok, n
            GROUP BY token, n.nn
            HAVING CAST(count(*) AS BIGINT) * 1000000 >= 2000 * n.nn
        """,
        # postings lists for a fixed term set: (token, doc_id, tf)
        "postings": r"""
            WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(
                                coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                         FROM documents)
            SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
            FROM tok WHERE token IN ('join', 'merge', 'scan', 'window')
            GROUP BY token, doc_id
        """,
        # unigram-LM mean negative log-likelihood (perplexity signal,
        # CCNet-style), bit-reproducible fixed-point: components
        # tf * ln(cf/N) summed in token-asc order by an explicit
        # list_reduce `+` chain — exactly the engine's Python loop —
        # so the doubles (and the floored nanonats) match bit-for-bit
        # conditional bigram NLL: per-(doc, bigram) contributions floor
        # to integer nanonats individually (order-free integer sums, no
        # list_reduce ordering contract); docs with < 2 tokens get (0,0)
        "bigram_nll": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w
                    FROM d WHERE len(w) >= 2),
            big AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2 FROM pos),
            tf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf
                   FROM big GROUP BY doc_id, w1, w2),
            c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c
                    FROM tf GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cs
                   FROM c12 GROUP BY w1),
            comp AS (SELECT tf.doc_id,
                            CAST(floor((-1000000000.0 * tf.tf)
                                 * ln(c12.c / c1.cs)) AS BIGINT) AS k,
                            tf.tf
                     FROM tf JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
            s AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS k,
                         CAST(sum(tf) AS BIGINT) AS np
                  FROM comp GROUP BY doc_id)
            SELECT d2.doc_id,
                   CAST(coalesce(s.np, 0) AS BIGINT) AS n_pairs,
                   CAST(coalesce(s.k, 0) AS BIGINT) AS nll2_sum_nanonat
            FROM (SELECT doc_id FROM documents) d2 LEFT JOIN s USING (doc_id)
        """,
        # per-source KL divergence vs the corpus unigram distribution:
        # each (source, token) contribution is floored to integer
        # nanonats INDIVIDUALLY, so the per-source total is an
        # order-independent integer sum — no list_reduce ordering
        # contract needed, exact in both engines
        "source_kl": r"""
            WITH tok AS (SELECT source, unnest(regexp_extract_all(
                                coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                         FROM documents),
            cst AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
                    FROM tok GROUP BY source, token),
            ctt AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct
                    FROM cst GROUP BY token),
            ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                   FROM cst GROUP BY source),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cst),
            comp AS (SELECT cst.source,
                            CAST(floor(1000000000.0 * (cst.c / ns.n)
                                 * (ln(cst.c / ns.n) - ln(ctt.ct / n.nn)))
                                 AS BIGINT) AS k
                     FROM cst JOIN ctt USING (token)
                              JOIN ns USING (source), n)
            SELECT ns.source, ns.n AS n_tokens,
                   CAST(coalesce(s.k, 0) AS BIGINT) AS kl_nanonat
            FROM ns LEFT JOIN (SELECT source, CAST(sum(k) AS BIGINT) AS k
                               FROM comp GROUP BY source) s USING (source)
        """,
        # corpus-wide suffix array: the engine runs log-round prefix
        # doubling (distributed sorts + doc-bucket shifts); the oracle
        # simply ORDERS THE SUFFIX LISTS (DuckDB list comparison ==
        # token-sequence comparison incl. the prefix rule) and dense_rank
        # replays the equal-suffix tie semantics
        "suffix_array": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT doc_id, unnest(range(len(w))) AS pos, w FROM d)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST(dense_rank() OVER (ORDER BY w[pos+1:]) - 1
                        AS BIGINT) AS rank
            FROM pos
        """,
        # LCP array: the engine answers each adjacent-pair query by
        # descending the doubling-round rank tables (sparse table); the
        # oracle sorts the literal suffix lists, lags, and finds the
        # first element mismatch (nullif: list_position returns 0, not
        # NULL, on no-match)
        "lcp": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT doc_id, unnest(range(len(w))) AS pos, w FROM d),
            suf AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                           w[pos+1:] AS s
                    FROM pos),
            o AS (SELECT doc_id, pos, s,
                         lag(s) OVER (ORDER BY s, doc_id, pos) AS p
                  FROM suf)
            SELECT doc_id, pos,
                   CAST(CASE
                     WHEN p IS NULL OR least(len(s), len(p)) = 0 THEN 0
                     ELSE coalesce(
                       nullif(list_position(
                         list_transform(range(least(len(s), len(p))),
                                        i -> s[i+1] = p[i+1]), false), 0) - 1,
                       least(len(s), len(p)))
                   END AS BIGINT) AS lcp
            FROM o
        """,
        # exact duplicated 8-token windows: the engine ranks windows via
        # suffix-rank pairs (sparse-table overlap); the oracle counts the
        # literal window strings (space-joined == token-sequence equality
        # since tokens contain no spaces)
        "dup_spans": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT doc_id, unnest(range(len(w))) AS pos, w FROM d),
            g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                         array_to_string(w[pos+1:pos+8], ' ') AS gram
                  FROM pos WHERE pos + 8 <= len(w)),
            c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_occ
                  FROM g GROUP BY gram)
            SELECT doc_id, pos, n_occ FROM g JOIN c USING (gram)
        """,
        # all-pairs slice Jaccard: the oracle takes the naive quadratic
        # path (distinct (source,token) self-join); the engine computes
        # the same integers via the per-token bitmask device, no join
        "source_overlap": r"""
            WITH st AS (SELECT DISTINCT source, token FROM (
                        SELECT source, unnest(regexp_extract_all(
                               coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                        FROM documents)),
            sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                      FROM st GROUP BY source),
            inter AS (SELECT a.source AS sa, b.source AS sb,
                             CAST(count(*) AS BIGINT) AS inter
                      FROM st a JOIN st b USING (token)
                      WHERE a.source < b.source GROUP BY 1, 2)
            SELECT x.source AS src_a, y.source AS src_b,
                   CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
                   x.n + y.n - coalesce(i.inter, 0) AS uni,
                   (coalesce(i.inter, 0) * 1000000)
                     // (x.n + y.n - coalesce(i.inter, 0)) AS jacc_ppm
            FROM sizes x JOIN sizes y ON x.source < y.source
            LEFT JOIN inter i ON i.sa = x.source AND i.sb = y.source
        """,
        "unigram_nll": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS token FROM d),
            cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf
                   FROM tok GROUP BY token),
            n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tok),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, token),
            comp AS (SELECT tf.doc_id, tf.token, tf.tf,
                            tf.tf * ln(CAST(cf.cf AS DOUBLE) / n.nn) AS c
                     FROM tf JOIN cf USING (token), n),
            s AS (SELECT doc_id,
                         list_reduce(list(c ORDER BY token), (a, b) -> a + b) AS lp,
                         CAST(sum(tf) AS BIGINT) AS dl
                  FROM comp GROUP BY doc_id)
            SELECT d2.doc_id,
                   CAST(coalesce(s.dl, 0) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN coalesce(s.dl, 0) > 0
                             THEN floor(-1000000000.0 * s.lp / s.dl)
                             ELSE 0 END AS BIGINT) AS nll_nanonat
            FROM (SELECT doc_id FROM documents) d2 LEFT JOIN s USING (doc_id)
        """,
        # CCNet-style per-language perplexity bucketing: the unigram_nll
        # CTE chain verbatim, then per-lang discrete quartile thresholds
        # (quantile_disc == the engine's grouped_quantiles_disc convention,
        # already pinned by the `quantiles` query) and a CASE bucket.
        # Low nll = fluent = 'head'.
        "ppl_buckets": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS token FROM d),
            cf AS (SELECT token, CAST(count(*) AS BIGINT) AS cf
                   FROM tok GROUP BY token),
            n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tok),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, token),
            comp AS (SELECT tf.doc_id, tf.token, tf.tf,
                            tf.tf * ln(CAST(cf.cf AS DOUBLE) / n.nn) AS c
                     FROM tf JOIN cf USING (token), n),
            s AS (SELECT doc_id,
                         list_reduce(list(c ORDER BY token), (a, b) -> a + b) AS lp,
                         CAST(sum(tf) AS BIGINT) AS dl
                  FROM comp GROUP BY doc_id),
            nll AS (SELECT d2.doc_id, d2.lang,
                           CAST(CASE WHEN coalesce(s.dl, 0) > 0
                                     THEN floor(-1000000000.0 * s.lp / s.dl)
                                     ELSE 0 END AS BIGINT) AS nll_nanonat
                    FROM (SELECT doc_id, lang FROM documents) d2
                    LEFT JOIN s USING (doc_id)),
            th AS (SELECT lang,
                          CAST(quantile_disc(nll_nanonat, 0.25) AS BIGINT) AS t_lo,
                          CAST(quantile_disc(nll_nanonat, 0.75) AS BIGINT) AS t_hi
                   FROM nll GROUP BY lang)
            SELECT nll.doc_id, nll.lang, nll.nll_nanonat,
                   CASE WHEN nll.nll_nanonat <= th.t_lo THEN 'head'
                        WHEN nll.nll_nanonat >  th.t_hi THEN 'tail'
                        ELSE 'middle' END AS bucket
            FROM nll JOIN th USING (lang)
        """,
        # corpus-vs-corpus 5-gram overlap: even-doc_id corpus A vs
        # odd-doc_id corpus B.  The engine semi-joins 63-bit FNV gram
        # hashes; the oracle joins the gram STRINGS (collision odds
        # ~|grams|^2/2^63 — negligible, and the fixture agrees exactly).
        "corpus_overlap": r"""
            WITH tok AS (SELECT doc_id,
                                regexp_extract_all(coalesce(text,''), '[^\t\n\v\f\r ]+') AS w
                         FROM documents),
            ag AS (SELECT DISTINCT doc_id, array_to_string(w[p : p + 4], ' ') AS g
                   FROM (SELECT doc_id, w,
                                CAST(unnest(range(1, greatest(len(w) - 3, 1))) AS BIGINT) AS p
                         FROM tok WHERE doc_id % 2 = 0)),
            bg AS (SELECT DISTINCT array_to_string(w[p : p + 4], ' ') AS g
                   FROM (SELECT doc_id, w,
                                CAST(unnest(range(1, greatest(len(w) - 3, 1))) AS BIGINT) AS p
                         FROM tok WHERE doc_id % 2 = 1)),
            hit AS (SELECT ag.doc_id, count(*) AS c FROM ag JOIN bg USING (g)
                    GROUP BY ag.doc_id),
            tot AS (SELECT doc_id, count(*) AS c FROM ag GROUP BY doc_id)
            SELECT a.doc_id,
                   CAST(coalesce(tot.c, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(hit.c, 0) AS BIGINT) AS overlap_grams
            FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) a
            LEFT JOIN tot USING (doc_id) LEFT JOIN hit USING (doc_id)
        """,
        "corpus_filter": _corpus_filter_sql(),
        # overlapping token-window chunking: stride 48 (= 64 - 16);
        # chunk k covers tokens [48k, 48k+64); list_slice is 1-based
        # inclusive and clamps at the list end, matching Python slicing.
        # Chunk count = max(1, ceil((n - overlap)/stride)) = (n + 31) // 48:
        # chunking stops once a window reaches the document end (no
        # redundant tail chunks), matching engine.stages.text.chunk_docs
        "chunk_docs": r"""
            WITH d AS (SELECT doc_id,
                              regexp_extract_all(coalesce(text, ''),
                                                 '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            c AS (SELECT doc_id, w,
                         unnest(range(CASE WHEN len(w) = 0 THEN 0
                                      ELSE greatest(1, (len(w) + 31) // 48)
                                      END)) AS chunk_id
                  FROM d)
            SELECT doc_id,
                   CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(chunk_id * 48 AS BIGINT) AS start_tok,
                   CAST(len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64))
                        AS BIGINT) AS n_tok,
                   array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64),
                                   ' ') AS chunk_text
            FROM c
        """,
        # sharded-export manifest: the engine writes hash-assigned parquet
        # shards and derives the manifest by reading the files back; the
        # oracle computes the same (shard, count, independent-hash-slice
        # sum) from the source table — a full write+read round-trip check
        "export_shards": """
            WITH s AS (SELECT
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 16 AS shard,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                      AS BIGINT) AS idh
               FROM documents)
            SELECT shard, count(*) AS n_rows, CAST(sum(idh) AS BIGINT) AS sum_idh
            FROM s GROUP BY shard
        """,
        # JSONL export manifest: same md5 routing device with the 'jsonl'
        # salt; the engine derives its manifest by reading the written
        # line-delimited files back
        "export_jsonl": """
            WITH s AS (SELECT
                 CAST(('0x' || substring(md5('jsonl' || CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 8 AS shard,
                 CAST(('0x' || substring(md5('jsonl' || CAST(doc_id AS VARCHAR)), 9, 8))
                      AS BIGINT) AS idh
               FROM documents)
            SELECT shard, count(*) AS n_rows, CAST(sum(idh) AS BIGINT) AS sum_idh
            FROM s GROUP BY shard
        """,
        # incremental re-index: the engine re-processes ONLY added/changed
        # docs (hash diff vs the old state) and carries 'same' rows; the
        # oracle is a FULL reprocess of the mutated snapshot — the two
        # must be bit-identical (that equality IS the resume semantics)
        "incremental_index": r"""
            WITH o AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
            newsnap AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
              FROM o WHERE doc_id % 31 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
              FROM o WHERE doc_id % 41 = 0
            )
            SELECT doc_id, md5(text) AS h,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '[^\t\n\v\f\r ]+')) AS BIGINT) AS n_tokens
            FROM newsnap
        """,
        # deterministic mixture sampling: all-integer rate derivation
        # (rate_bp = min(10000, w_bp * ((total*40)//100) // n_domain)) +
        # the same md5 hash gate as sample_stratified, mod 10000
        "mixture_sample": """
            WITH w(source, w_bp) AS (VALUES
                ('src0', 1000), ('src1', 1000), ('src2', 1000), ('src3', 1000),
                ('src4', 1000), ('src5', 1000), ('src6', 1000), ('src7', 1000),
                ('src8', 1000), ('src9', 1000)),
            cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
            tot AS (SELECT count(*) AS t FROM documents),
            rates AS (SELECT cnt.source,
                             LEAST(10000, (w.w_bp * ((tot.t * 40) // 100)) // cnt.n) AS bp
                      FROM cnt JOIN w USING (source) CROSS JOIN tot)
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN rates r USING (source)
            WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 10000 < r.bp
        """,
        # grouped top-k: token-count window rank per source; ties break
        # token-ascending (binary UTF-8 order == Python codepoint order)
        "domain_terms": r"""
            WITH tok AS (SELECT source,
                                unnest(regexp_extract_all(coalesce(text, ''),
                                                          '[^\t\n\v\f\r ]+')) AS token
                         FROM documents),
            cnt AS (SELECT source, token, count(*) AS n FROM tok GROUP BY source, token),
            rk AS (SELECT source, token, CAST(n AS BIGINT) AS term_count,
                          CAST(row_number() OVER (
                              PARTITION BY source ORDER BY n DESC, token ASC
                          ) AS BIGINT) AS term_rank
                   FROM cnt)
            SELECT source, token, term_count, term_rank FROM rk WHERE term_rank <= 10
        """,
        # hash-gated sampling: bucket = int(md5(id)[:8], 16) % 100 — the
        # '0x'-prefixed CAST parses hex identically to Python int(s, 16)
        "sample_stratified": """
            SELECT doc_id, lang, n_chars
            FROM (SELECT doc_id, lang, n_chars,
                         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) % 100 AS b
                  FROM documents)
            WHERE b < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END
        """,
        # per-doc token entropy: contributions floor individually
        # (order-free integer sums); expression mirrors the engine —
        # (-1e9 * (tf/dl)) * ln(tf/dl)
        "token_entropy": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS token FROM d),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, token),
            dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
                   FROM tf GROUP BY doc_id),
            comp AS (SELECT tf.doc_id,
                            CAST(floor((-1000000000.0 * (tf.tf / dl.dl))
                                 * ln(tf.tf / dl.dl)) AS BIGINT) AS k
                     FROM tf JOIN dl USING (doc_id))
            SELECT d2.doc_id,
                   CAST(coalesce(dl.dl, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(s.k, 0) AS BIGINT) AS entropy_nanonat
            FROM (SELECT doc_id FROM documents) d2
            LEFT JOIN dl USING (doc_id)
            LEFT JOIN (SELECT doc_id, CAST(sum(k) AS BIGINT) AS k
                       FROM comp GROUP BY doc_id) s USING (doc_id)
        """,
        # fixed-bin value histogram: identical double ops both sides —
        # floor((value - 0.0) / 50.0) clamped to [0, 19]
        "value_hist": """
            SELECT event_type,
                   LEAST(GREATEST(CAST(floor((value - 0.0) / 50.0) AS BIGINT),
                                  0), 19) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY event_type, bin
        """,
        # ordered funnel: strictly-increasing min-ts chain per user,
        # -1 for unreached stages; epoch_us for int64 parity
        "funnel": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 ON e.user_id = s1.user_id
                        AND e.ts > s1.t1
                   WHERE e.event_type = 'click' GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 ON e.user_id = s2.user_id
                        AND e.ts > s2.t2
                   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT u.user_id,
                   CAST(CASE WHEN t3 IS NOT NULL THEN 3
                             WHEN t2 IS NOT NULL THEN 2
                             WHEN t1 IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS reached,
                   CAST(coalesce(epoch_us(t1), -1) AS BIGINT) AS t1_us,
                   CAST(coalesce(epoch_us(t2), -1) AS BIGINT) AS t2_us,
                   CAST(coalesce(epoch_us(t3), -1) AS BIGINT) AS t3_us
            FROM u LEFT JOIN s1 USING (user_id)
                   LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)
        """,
        # per-node degree + reciprocity: the oracle re-derives the
        # synthetic ring+cross topology (testdata_pages.build_link_maps)
        # with window functions — ring offsets 1..3 within each source's
        # doc_id order, cross edge to all_sorted[(id*7+3) % N], self
        # targets skipped, order-preserving dedup == DISTINCT, then the
        # (src+dst)%3 drop q_pagerank/q_link_stats apply
        "link_stats": """
            WITH m AS (SELECT doc_id, source,
                              CAST(row_number() OVER (
                                  PARTITION BY source ORDER BY doc_id) - 1
                                  AS BIGINT) AS pos,
                              CAST(count(*) OVER (PARTITION BY source)
                                  AS BIGINT) AS n
                       FROM documents),
            offs(d) AS (VALUES (1), (2), (3)),
            ring AS (SELECT a.doc_id AS src, b.doc_id AS dst
                     FROM m a JOIN m b ON a.source = b.source
                     CROSS JOIN offs
                     WHERE b.pos = (a.pos + offs.d) % a.n
                       AND b.doc_id != a.doc_id),
            ord AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1
                                   AS BIGINT) AS idx
                    FROM documents),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
            crosse AS (SELECT a.doc_id AS src, b.doc_id AS dst
                       FROM documents a CROSS JOIN nn
                       JOIN ord b ON b.idx = (a.doc_id * 7 + 3) % nn.c
                       WHERE b.doc_id != a.doc_id),
            edges AS (SELECT DISTINCT src, dst
                      FROM (SELECT * FROM ring UNION ALL SELECT * FROM crosse)
                      WHERE (src + dst) % 3 != 0),
            outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS out_deg
                     FROM edges GROUP BY src),
            ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS in_deg
                    FROM edges GROUP BY dst),
            mut AS (SELECT e.src AS node, CAST(count(*) AS BIGINT) AS mutual_deg
                    FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
                    GROUP BY e.src),
            nodes AS (SELECT DISTINCT node FROM
                      (SELECT src AS node FROM edges
                       UNION ALL SELECT dst FROM edges))
            SELECT nodes.node,
                   CAST(coalesce(outd.out_deg, 0) AS BIGINT) AS out_deg,
                   CAST(coalesce(ind.in_deg, 0) AS BIGINT) AS in_deg,
                   CAST(coalesce(mut.mutual_deg, 0) AS BIGINT) AS mutual_deg
            FROM nodes LEFT JOIN outd USING (node)
                       LEFT JOIN ind USING (node)
                       LEFT JOIN mut USING (node)
        """,
        # per-node triangle counts: same topology replay as link_stats,
        # undirected (lo, hi) pairs joined three ways (a<b<c finds each
        # triangle once), every triangle credits its three corners
        "triangles": """
            WITH m AS (SELECT doc_id, source,
                              CAST(row_number() OVER (
                                  PARTITION BY source ORDER BY doc_id) - 1
                                  AS BIGINT) AS pos,
                              CAST(count(*) OVER (PARTITION BY source)
                                  AS BIGINT) AS n
                       FROM documents),
            offs(d) AS (VALUES (1), (2), (3)),
            ring AS (SELECT a.doc_id AS src, b.doc_id AS dst
                     FROM m a JOIN m b ON a.source = b.source
                     CROSS JOIN offs
                     WHERE b.pos = (a.pos + offs.d) % a.n
                       AND b.doc_id != a.doc_id),
            ord AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1
                                   AS BIGINT) AS idx
                    FROM documents),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
            crosse AS (SELECT a.doc_id AS src, b.doc_id AS dst
                       FROM documents a CROSS JOIN nn
                       JOIN ord b ON b.idx = (a.doc_id * 7 + 3) % nn.c
                       WHERE b.doc_id != a.doc_id),
            dedges AS (SELECT DISTINCT src, dst
                       FROM (SELECT * FROM ring UNION ALL SELECT * FROM crosse)
                       WHERE (src + dst) % 3 != 0),
            ue AS (SELECT DISTINCT least(src, dst) AS lo,
                                   greatest(src, dst) AS hi
                   FROM dedges WHERE src != dst),
            tri AS (SELECT x.lo AS a, x.hi AS b, y.hi AS c
                    FROM ue x JOIN ue y ON y.lo = x.hi
                              JOIN ue z ON z.lo = x.lo AND z.hi = y.hi),
            credit AS (SELECT a AS node FROM tri
                       UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri),
            nodes AS (SELECT DISTINCT node FROM
                      (SELECT lo AS node FROM ue UNION ALL SELECT hi FROM ue)),
            cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
                    FROM credit GROUP BY node)
            SELECT nodes.node,
                   CAST(coalesce(cnt.tri_cnt, 0) AS BIGINT) AS tri_cnt
            FROM nodes LEFT JOIN cnt USING (node)
        """,
        # keep-best exact dedup: argmax per content hash under the total
        # order (n_chars desc, doc_id asc)
        "dedup_best": """
            SELECT doc_id, n_chars, lang
            FROM (SELECT doc_id, n_chars, lang,
                         row_number() OVER (
                             PARTITION BY md5(coalesce(text, ''))
                             ORDER BY n_chars DESC, doc_id ASC) AS rn
                  FROM documents)
            WHERE rn = 1
        """,
        # trigram Stupid Backoff (Brants et al. 2007): even ids train,
        # odd ids score; per-(doc,trigram) contributions floor to integer
        # nanonats individually (order-free sums); expression shapes
        # mirror the engine exactly — (-1e9*tf) * ln(...), 0.4 literals,
        # unseen-w3 floor via coalesce(c3, 1)
        "sb_nll": r"""
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            tr AS (SELECT doc_id, unnest(range(len(w) - 2)) AS i, w
                   FROM d WHERE len(w) >= 3),
            tri AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2, w[i+3] AS w3
                    FROM tr),
            train AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c
                      FROM tri WHERE doc_id % 2 = 0 GROUP BY w1, w2, w3),
            c12 AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cs
                    FROM train GROUP BY w1, w2),
            c23 AS (SELECT w2, w3, CAST(sum(c) AS BIGINT) AS cs
                    FROM train GROUP BY w2, w3),
            c2 AS (SELECT w2, CAST(sum(c) AS BIGINT) AS cs
                   FROM train GROUP BY w2),
            c3 AS (SELECT w3, CAST(sum(c) AS BIGINT) AS cs
                   FROM train GROUP BY w3),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM train),
            sc AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS tf
                   FROM tri WHERE doc_id % 2 = 1
                   GROUP BY doc_id, w1, w2, w3),
            comp AS (SELECT sc.doc_id, sc.tf,
                            CASE
                              WHEN t.c IS NOT NULL THEN
                                CAST(floor((-1000000000.0 * sc.tf)
                                     * ln(t.c / c12.cs)) AS BIGINT)
                              WHEN c23.cs IS NOT NULL THEN
                                CAST(floor((-1000000000.0 * sc.tf)
                                     * ln(0.4 * c23.cs / c2.cs)) AS BIGINT)
                              ELSE
                                CAST(floor((-1000000000.0 * sc.tf)
                                     * ln(0.4 * 0.4 * coalesce(c3.cs, 1) / n.nn))
                                     AS BIGINT)
                            END AS k
                     FROM sc LEFT JOIN train t USING (w1, w2, w3)
                             LEFT JOIN c12 USING (w1, w2)
                             LEFT JOIN c23 USING (w2, w3)
                             LEFT JOIN c2 USING (w2)
                             LEFT JOIN c3 USING (w3), n),
            s AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS nt,
                         CAST(sum(k) AS BIGINT) AS k
                  FROM comp GROUP BY doc_id)
            SELECT d2.doc_id,
                   CAST(coalesce(s.nt, 0) AS BIGINT) AS n_tri,
                   CAST(coalesce(s.k, 0) AS BIGINT) AS sb_nll_nanonat
            FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d2
            LEFT JOIN s USING (doc_id)
        """,
        # PMI collocations: all-integer count inputs, one ln per pair
        # (floor(1e9*ln((N*c12)/(c1*c2))) — libm parity, products < 2^53
        # so int->double conversion is exact in both engines); marginals
        # c1/c2 are the bigram-table sums, ties (pmi desc, w1, w2)
        "pmi_pairs": r"""
            WITH d AS (SELECT regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT unnest(range(len(w) - 1)) AS i, w
                    FROM d WHERE len(w) >= 2),
            big AS (SELECT w[i+1] AS w1, w[i+2] AS w2 FROM pos),
            c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                    FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cs1
                   FROM c12 GROUP BY w1),
            c2 AS (SELECT w2, CAST(sum(c) AS BIGINT) AS cs2
                   FROM c12 GROUP BY w2),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c12),
            scored AS (SELECT w1, w2, c AS pair_count,
                              CAST(floor(1000000000.0
                                   * ln((n.nn * c) / (c1.cs1 * c2.cs2)))
                                   AS BIGINT) AS pmi_nano
                       FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
                       WHERE c >= 5)
            SELECT w1, w2, pair_count, pmi_nano,
                   CAST(row_number() OVER (
                       ORDER BY pmi_nano DESC, w1 ASC, w2 ASC
                   ) AS BIGINT) AS rank
            FROM scored
            ORDER BY rank LIMIT 100
        """,
        # Efraimidis-Spirakis weighted sample: key = u^(1/w), u = the md5
        # uniform (b+1)/2^32 in (0,1], w = max(n_chars,1); pow/division
        # on identical doubles are identical libm calls, ties break on
        # doc_id — selection AND rank verified
        "weighted_sample": """
            WITH s AS (SELECT doc_id, lang, n_chars,
                              pow((CAST(('0x' || substring(
                                       md5('ws' || CAST(doc_id AS VARCHAR)),
                                       1, 8)) AS BIGINT) + 1) / 4294967296.0,
                                  1.0 / greatest(n_chars, 1)) AS key
                       FROM documents)
            SELECT doc_id, lang, n_chars,
                   CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC)
                        AS BIGINT) AS sample_rank
            FROM s ORDER BY key DESC, doc_id ASC LIMIT 100
        """,
        # Fightin' Words log-odds z: alpha=1 Dirichlet prior, alpha0=|V|;
        # expression shapes mirror the engine exactly (int adds first,
        # then the 1.0 float ops; ln/sqrt libm parity)
        "log_odds": r"""
            WITH tok AS (SELECT lang AS side, unnest(regexp_extract_all(
                                coalesce(text, ''), '[^\t\n\v\f\r ]+')) AS token
                         FROM documents WHERE lang IN ('en', 'de')),
            c AS (SELECT side, token, CAST(count(*) AS BIGINT) AS c
                  FROM tok GROUP BY side, token),
            v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM c),
            na AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n
                   FROM c WHERE side = 'en'),
            nb AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n
                   FROM c WHERE side = 'de'),
            w AS (SELECT token,
                         CAST(coalesce(max(CASE WHEN side = 'en' THEN c END), 0)
                              AS BIGINT) AS cnt_a,
                         CAST(coalesce(max(CASE WHEN side = 'de' THEN c END), 0)
                              AS BIGINT) AS cnt_b
                  FROM c GROUP BY token),
            scored AS (SELECT token, cnt_a, cnt_b,
                              CAST(floor(1000000000.0 * (
                                  (ln((cnt_a + 1.0) / (na.n + v.v - cnt_a - 1.0))
                                   - ln((cnt_b + 1.0) / (nb.n + v.v - cnt_b - 1.0)))
                                  / sqrt(1.0 / (cnt_a + 1.0) + 1.0 / (cnt_b + 1.0))
                              )) AS BIGINT) AS z_nano
                       FROM w, na, nb, v)
            SELECT token, cnt_a, cnt_b, z_nano,
                   CAST(row_number() OVER (ORDER BY z_nano DESC, token ASC)
                        AS BIGINT) AS rank
            FROM scored ORDER BY rank LIMIT 50
        """,
        # skip-gram PMI: ordered pairs at offsets 1..3; marginals and N
        # are window-co-occurrence totals, scoring identical to pmi_pairs
        "pmi_window": r"""
            WITH d AS (SELECT regexp_extract_all(
                              coalesce(text, ''), '[^\t\n\v\f\r ]+') AS w
                       FROM documents),
            pos AS (SELECT unnest(range(len(w))) AS i, w, len(w) AS n FROM d),
            offs(k) AS (VALUES (1), (2), (3)),
            big AS (SELECT w[i+1] AS w1, w[i+1+k] AS w2
                    FROM pos CROSS JOIN offs WHERE i + k < n),
            c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
                    FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cs1
                   FROM c12 GROUP BY w1),
            c2 AS (SELECT w2, CAST(sum(c) AS BIGINT) AS cs2
                   FROM c12 GROUP BY w2),
            n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c12),
            scored AS (SELECT w1, w2, c AS pair_count,
                              CAST(floor(1000000000.0
                                   * ln((n.nn * c) / (c1.cs1 * c2.cs2)))
                                   AS BIGINT) AS pmi_nano
                       FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
                       WHERE c >= 5)
            SELECT w1, w2, pair_count, pmi_nano,
                   CAST(row_number() OVER (
                       ORDER BY pmi_nano DESC, w1 ASC, w2 ASC
                   ) AS BIGINT) AS rank
            FROM scored
            ORDER BY rank LIMIT 100
        """,
        # deterministic train/val/test split: one md5 bucket (salt
        # 'split'), cumulative thresholds 90/95 — disjoint + exhaustive
        "corpus_split": """
            SELECT doc_id, lang,
                   CASE WHEN b < 90 THEN 'train'
                        WHEN b < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, lang,
                         CAST(('0x' || substring(
                              md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) % 100 AS b
                  FROM documents)
        """,
        # tf-idf vectors: scores verified via the fixed-point ln trick
        # (floor(1e9 * tf * ln(n_docs/df)) — libm-double parity, see
        # unigram_nll); vocab = top-500 by (cf desc, token), rank ties
        # break (score desc, token asc) in both engines
        "tfidf": """
            WITH d AS (SELECT doc_id, regexp_extract_all(
                              coalesce(text, ''), '[^\\t\\n\\v\\f\\r ]+') AS w
                       FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS token FROM d),
            stats AS (SELECT token,
                             CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                             CAST(count(*) AS BIGINT) AS cf
                      FROM tok GROUP BY token),
            vocab AS (SELECT token, df FROM stats
                      ORDER BY cf DESC, token LIMIT 500),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
            tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, token),
            scored AS (SELECT tf.doc_id, tf.token, tf.tf,
                              CAST(floor(1e9 * tf.tf * ln(
                                   CAST(n.n_docs AS DOUBLE) / vocab.df))
                                   AS BIGINT) AS tfidf_nano
                       FROM tf JOIN vocab USING (token), n),
            rk AS (SELECT scored.*, row_number() OVER (
                          PARTITION BY doc_id
                          ORDER BY tfidf_nano DESC, token) AS r
                   FROM scored)
            SELECT doc_id, token, tf, tfidf_nano FROM rk WHERE r <= 5
        """,
        # seeded deterministic shuffle: the permutation itself is checked —
        # pos is ROW_NUMBER over the identical (md5 key, id) total order
        "shuffle_corpus": """
            SELECT doc_id,
                   md5('42:' || CAST(doc_id AS VARCHAR)) AS shuf_key,
                   CAST(ROW_NUMBER() OVER (
                        ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) - 1 AS BIGINT) AS pos
            FROM documents
        """,
        "lang_agg": """
            SELECT lang, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "lookup_join": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            LEFT JOIN nation ON c_nationkey = n_nationkey
            LEFT JOIN region ON n_regionkey = r_regionkey
        """,
        # hopping windows: each event in size/hop = 2 windows (cross join
        # with hop offsets 0,1); all-integer arithmetic
        "events_hopping": """
            SELECT (epoch_us(ts) // 1800000000 - k.k) * 1800000000 AS win_start,
                   event_type,
                   count(*) AS n_events,
                   max(value) AS max_value
            FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
            GROUP BY 1, 2
        """,
        "events_window": """
            SELECT epoch_us(ts) // 3600000000 AS bucket,
                   event_type,
                   count(*) AS n_events,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty, count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "distinct_users": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "sessions": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT user_id, ts,
                       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
                FROM marked
            )
            SELECT user_id, sess_no,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, sess_no
        """,
        "hash_join": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "asof_join": """
            SELECT e.event_id, e.user_id,
                   CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
                   o.o_orderkey
            FROM events e
            ASOF JOIN (SELECT o_custkey, o_orderdate,
                              max(o_orderkey) AS o_orderkey
                       FROM orders GROUP BY o_custkey, o_orderdate) o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "range_join": """
            SELECT e.event_id, e.user_id, a.anchor_id, a.start_us
            FROM events e
            JOIN (SELECT user_id, event_id AS anchor_id,
                         epoch_us(ts) AS start_us,
                         epoch_us(ts) + 3600000000 AS end_us
                  FROM events) a
              ON e.user_id = a.user_id
             AND epoch_us(e.ts) >= a.start_us
             AND epoch_us(e.ts) <  a.end_us
        """,
        # ann_topk: rank-only check (sim deliberately excluded — see
        # q_ann_topk docstring).  DOUBLE[] cast avoids DuckDB's float32
        # path on list<float> columns.
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 5
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
        """,
        "quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99,
                   count(*) AS n_rows
            FROM events GROUP BY event_type
        """,
        # crawl_order: the politeness-budgeted frontier crawl, driver-
        # verified.  q_crawl_order runs CrawlConfig(max_waves=2) with
        # default politeness over the synthesized pages graph; with all
        # priorities equal per wave (priority = 1/(1+depth)) the scheduler
        # reduces to: wave 0 = the 8 seeds ordered by url; wave 1 = links
        # of wave-0 docs minus the seen set, capped at
        # floor(wave_seconds/crawl_delay) = 6 per host by url order, then
        # globally ordered by url.  Two waves unroll into plain CTEs (the
        # link graph is the same tgt derivation as the extract_pages
        # oracle).  Constants (8 seeds, cap 6, 2 waves) mirror
        # q_crawl_order's config — change them together.
        "crawl_metrics": """
            WITH m AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            g AS (
              SELECT doc_id AS gid, source AS gsrc,
                     row_number() OVER (ORDER BY doc_id) - 1 AS gpos
              FROM documents
            ),
            gn AS (SELECT count(*) AS c FROM documents),
            tgt AS (
              SELECT m.doc_id, d.ordn, m2.doc_id AS t, m2.source AS tsrc
              FROM m
              JOIN (VALUES (1),(2),(3)) AS d(ordn) ON true
              JOIN m m2 ON m2.source = m.source AND m2.pos = (m.pos + d.ordn) % m.n
              WHERE m2.doc_id <> m.doc_id
              UNION ALL
              SELECT m.doc_id, 4 AS ordn, g.gid, g.gsrc
              FROM m CROSS JOIN gn JOIN g ON g.gpos = (m.doc_id * 7 + 3) % gn.c
              WHERE g.gid <> m.doc_id
            ),
            links AS (
              SELECT DISTINCT doc_id,
                     'https://' || tsrc || '.example.com/docs/' || t || '.html' AS turl,
                     tsrc || '.example.com' AS thost
              FROM tgt
            ),
            srcs AS (
              SELECT source, min(doc_id) AS first_doc,
                     row_number() OVER (ORDER BY source) AS srn
              FROM documents GROUP BY source
            ),
            seeds AS (
              SELECT 'https://' || source || '.example.com/docs/' || first_doc
                         || '.html' AS url,
                     source || '.example.com' AS host,
                     first_doc AS doc_id
              FROM srcs WHERE srn <= 8
            ),
            wave0 AS (
              SELECT 0 AS wave,
                     CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS seq,
                     url, host, doc_id
              FROM seeds
            ),
            n0 AS (SELECT count(*) AS c FROM wave0),
            cand1 AS (
              SELECT DISTINCT l.turl AS url, l.thost AS host
              FROM wave0 w JOIN links l ON l.doc_id = w.doc_id
              WHERE l.turl NOT IN (SELECT url FROM seeds)
            ),
            sel1 AS (
              SELECT url, host,
                     row_number() OVER (PARTITION BY host ORDER BY url) AS hrn
              FROM cand1
            ),
            wave1 AS (
              SELECT 1 AS wave,
                     CAST((SELECT c FROM n0)
                          + row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS seq,
                     url, host
              FROM sel1 WHERE hrn <= 6
            )
            , w1doc AS (
              SELECT CAST(regexp_extract(url, '/docs/(\d+)\.html', 1) AS BIGINT)
                  AS doc_id
              FROM wave1
            ),
            seen1 AS (SELECT url FROM seeds UNION ALL SELECT url FROM cand1),
            cand2 AS (
              SELECT DISTINCT l.turl AS url
              FROM w1doc w JOIN links l ON l.doc_id = w.doc_id
              WHERE l.turl NOT IN (SELECT url FROM seen1)
            ),
            c1 AS (SELECT count(*) AS c FROM cand1),
            c2 AS (SELECT count(*) AS c FROM cand2),
            s1 AS (SELECT count(*) AS c FROM wave1)
            SELECT CAST(-1 AS BIGINT) AS wave, CAST(0 AS BIGINT) AS n_selected,
                   CAST(n0.c AS BIGINT) AS n_new_enqueued,
                   CAST(n0.c AS BIGINT) AS n_frontier_out,
                   CAST(n0.c AS BIGINT) AS seen_total
            FROM n0
            UNION ALL
            SELECT 0, CAST(n0.c AS BIGINT), CAST(c1.c AS BIGINT),
                   CAST(c1.c AS BIGINT), CAST(n0.c + c1.c AS BIGINT)
            FROM n0, c1
            UNION ALL
            SELECT 1, CAST(s1.c AS BIGINT), CAST(c2.c AS BIGINT),
                   CAST(c1.c - s1.c + c2.c AS BIGINT),
                   CAST(n0.c + c1.c + c2.c AS BIGINT)
            FROM n0, c1, c2, s1
        """,
        "crawl_host_budget": f"""
            WITH ord AS ({_CRAWL_ORDER_SQL})
            SELECT wave, host, count(*) AS n_fetched
            FROM ord GROUP BY wave, host
        """,
        "crawl_order": _CRAWL_ORDER_SQL,
        "crawl_order_domain": _CRAWL_ORDER_DOMAIN_SQL,
        "crawl_order_inlinks": _CRAWL_ORDER_INLINKS_SQL,
        # quality: counts are exact; ppm = floor(1e6*count/n_chars) is
        # bit-reproducible IEEE (unlike round(x,6), whose half-way handling
        # differs between Python and DuckDB — measured on this testdata).
        # coalesce(text,'') mirrors quality_scores' `t or ""` — a NULL text
        # row must yield zeros, not NULLs
        "quality": """
            WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
                   length(regexp_extract_all(text, '[0-9]')) AS n_digit,
                   CASE WHEN length(text) = 0 THEN 0 ELSE
                       CAST(floor(1000000.0 * length(regexp_extract_all(text, '[A-Za-z]'))
                            / length(text)) AS BIGINT) END AS alpha_ppm,
                   CASE WHEN length(text) = 0 THEN 0 ELSE
                       CAST(floor(1000000.0 * length(regexp_extract_all(text, '[0-9]'))
                            / length(text)) AS BIGINT) END AS digit_ppm
            FROM d
        """,
        # extract_pages: the pages table is a pure function of documents
        # (engine/pipelines/testdata_pages.py); this SQL re-derives the
        # synthesized HTML (incl. the link graph) and the extraction
        # semantics for the synthetic shape: body is EXACTLY
        # 'Document {id}.0\\n' + text (byte-identical extracted text, the
        # input_hint per-row invariant, verified via the driver value hash),
        # body_length = len(decoded html), kept iff len(body) >= 200
        # (MIN_MAIN_CONTENT; the other skip gates never fire on well-formed
        # synthetic pages).
        "extract_pages": """
            WITH m AS (
              SELECT doc_id, source, text,
                     row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS pos,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            g AS (
              SELECT doc_id AS gid, source AS gsrc,
                     row_number() OVER (ORDER BY doc_id) - 1 AS gpos
              FROM documents
            ),
            gn AS (SELECT count(*) AS c FROM documents),
            tgt AS (
              SELECT m.doc_id, d.ordn, m2.doc_id AS t, m2.source AS tsrc
              FROM m
              JOIN (VALUES (1),(2),(3)) AS d(ordn) ON true
              JOIN m m2 ON m2.source = m.source AND m2.pos = (m.pos + d.ordn) % m.n
              WHERE m2.doc_id <> m.doc_id
              UNION ALL
              SELECT m.doc_id, 4 AS ordn, g.gid, g.gsrc
              FROM m CROSS JOIN gn JOIN g ON g.gpos = (m.doc_id * 7 + 3) % gn.c
              WHERE g.gid <> m.doc_id
            ),
            tgtd AS (
              SELECT doc_id, ordn, t, tsrc,
                     row_number() OVER (PARTITION BY doc_id, t ORDER BY ordn) AS rk
              FROM tgt
            ),
            links AS (
              SELECT doc_id,
                     string_agg('<a href="https://' || tsrc || '.example.com/docs/' || t
                         || '.html">d' || t || '</a> ', '' ORDER BY ordn) AS l
              FROM tgtd WHERE rk = 1 GROUP BY doc_id
            ),
            page AS (
              SELECT m.doc_id, m.source, m.text,
                     '<!DOCTYPE html><html><head><title>Document ' || m.doc_id || '.0</title>'
                     || '<meta name="description" content="synthetic doc ' || m.doc_id
                     || ' from ' || m.source || '">'
                     || '<meta name="keywords" content="' || m.source || ', doc' || m.doc_id
                     || ', synthetic">'
                     || '</head><body><nav>' || coalesce(l.l, '') || '</nav>'
                     || '<article><h1>Document ' || m.doc_id || '.0</h1><p>'
                     || replace(m.text, '<', '&lt;') || '</p></article>'
                     || '</body></html>' AS html
              FROM m LEFT JOIN links l ON l.doc_id = m.doc_id
            )
            SELECT 'https://' || source || '.example.com/docs/' || doc_id || '.html'
                       AS warc_target_uri,
                   'Document ' || doc_id || '.0' AS title,
                   'Document ' || doc_id || '.0' || chr(10) || text AS body,
                   length(html) AS body_length
            FROM page
            WHERE length('Document ' || doc_id || '.0' || chr(10) || text) >= 200
        """,
        "surt_hosts": """
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/' ||
                       CAST(doc_id AS VARCHAR) || '.html' AS url,
                   source || '.example.com' AS host,
                   array_to_string(list_reverse(string_split(
                       source || '.example.com', '.')), ',')
                       || ')/docs/' || CAST(doc_id AS VARCHAR) || '.html' AS surt
            FROM documents
        """,
        "domain_agg": rf"""
            WITH hosts AS (
                SELECT (CASE doc_id % 4 WHEN 0 THEN 'www.'
                             WHEN 1 THEN 'cdn.eu.' ELSE '' END)
                       || 'site' || CAST(doc_id % 37 AS VARCHAR) || '.'
                       || (CASE doc_id % 8 WHEN 0 THEN 'com'
                            WHEN 1 THEN 'co.uk' WHEN 2 THEN 'org'
                            WHEN 3 THEN 'com.au' WHEN 4 THEN 'gov.uk'
                            WHEN 5 THEN 'de' WHEN 6 THEN 'ac.jp'
                            ELSE 'net' END) AS host
                FROM documents
            ),
            ext AS (
                SELECT host,
                       nullif(regexp_extract(host, '([^.]+)$', 1), '') AS last1,
                       nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), '')
                           AS last2,
                       nullif(regexp_extract(host,
                           '([^.]+\.[^.]+\.[^.]+)$', 1), '') AS last3
                FROM hosts
            ),
            res AS (
                SELECT host,
                       CASE WHEN last2 IN ({_suf2_in})
                                THEN coalesce(last3, host)
                            ELSE coalesce(last2, host) END AS domain,
                       CASE WHEN last2 IN ({_suf2_in}) THEN last2
                            ELSE coalesce(last1, host) END AS suffix
                FROM ext
            )
            SELECT domain, suffix,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
            FROM res GROUP BY domain, suffix
        """,
        "url_filter": r"""
            WITH u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 13 = 0 THEN 'ftp://'
                             ELSE 'https://' END)
                       || source || '.example.com'
                       || (CASE WHEN doc_id % 17 = 0 THEN repeat('/x', 150)
                                ELSE repeat('/d', CAST(doc_id % 12 AS INT))
                           END)
                       || '/doc' || CAST(doc_id AS VARCHAR) || '.html'
                       || (CASE WHEN doc_id % 5 = 0
                                    THEN '?PHPSESSID=' || CAST(doc_id AS VARCHAR)
                                WHEN doc_id % 11 = 0
                                    THEN '?a=1&b=2&c=3&d=4&e=5&f=6'
                                ELSE '' END) AS url,
                       source || '.example.com' AS host
                FROM documents
            )
            SELECT doc_id, url,
                   CASE
                       WHEN NOT regexp_matches(url, '^https?://')
                           THEN 'scheme'
                       WHEN host IN ('src3.example.com', 'src7.example.com')
                           THEN 'blocked_host'
                       WHEN length(url) > 256 THEN 'too_long'
                       WHEN length(url) - length(replace(url, '/', '')) > 10
                           THEN 'too_deep'
                       WHEN regexp_matches(url,
                           '[?&](sid|sessionid|phpsessid|jsessionid|cfid|cftoken)=',
                           'i') THEN 'session_id'
                       WHEN length(url) - length(replace(url, '=', '')) > 4
                           THEN 'param_blowup'
                       ELSE 'ok'
                   END AS status
            FROM u
        """,
        "url_templates": r"""
            WITH u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 13 = 0 THEN 'ftp://'
                             ELSE 'https://' END)
                       || source || '.example.com'
                       || (CASE WHEN doc_id % 17 = 0 THEN repeat('/x', 150)
                                ELSE repeat('/d', CAST(doc_id % 12 AS INT))
                           END)
                       || '/doc' || CAST(doc_id AS VARCHAR) || '.html'
                       || (CASE WHEN doc_id % 5 = 0
                                    THEN '?PHPSESSID=' || CAST(doc_id AS VARCHAR)
                                WHEN doc_id % 11 = 0
                                    THEN '?a=1&b=2&c=3&d=4&e=5&f=6'
                                ELSE '' END) AS url
                FROM documents
            ),
            s AS (
                SELECT regexp_replace(url, '\?.*$', '') AS stripped FROM u
            ),
            t AS (
                SELECT regexp_replace(stripped, '[0-9]+', 'N', 'g') AS template,
                       regexp_extract(stripped, '^[a-z]+://([^/]+)', 1) AS host
                FROM s
            ),
            agg AS (
                SELECT template,
                       CAST(count(*) AS BIGINT) AS n_urls,
                       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
                FROM t GROUP BY template
            )
            SELECT template, n_urls, n_hosts FROM agg
            ORDER BY n_urls DESC, template LIMIT 20
        """,
        "pagination_chains": r"""
            WITH u AS (
                SELECT doc_id,
                       CASE
                           WHEN doc_id % 8 = 5 THEN
                               'https://h' || CAST((doc_id // 8) % 50 AS VARCHAR)
                               || '.example.com/a/' || CAST(doc_id AS VARCHAR)
                           ELSE
                               'https://h' || CAST((doc_id // 8) % 50 AS VARCHAR)
                               || '.example.com/s/'
                               || CAST(doc_id // 8 AS VARCHAR) || '/page/'
                               || CAST(CASE WHEN doc_id % 8 = 6 THEN 4
                                            ELSE doc_id % 8 + 1 END AS VARCHAR)
                       END AS url
                FROM documents
            ),
            m AS (
                SELECT regexp_extract(url, '^(.*/page/)[0-9]+$', 1) AS chain,
                       CAST(regexp_extract(url, '/page/([0-9]+)$', 1)
                            AS BIGINT) AS page
                FROM u WHERE regexp_matches(url, '/page/[0-9]+$')
            ),
            d AS (SELECT DISTINCT chain, page FROM m),
            agg AS (
                SELECT chain,
                       CAST(count(*) AS BIGINT) AS n_pages,
                       min(page) AS min_page,
                       max(page) AS max_page
                FROM d GROUP BY chain
            )
            SELECT chain, n_pages, min_page, max_page,
                   max_page - min_page + 1 - n_pages AS n_gaps
            FROM agg WHERE n_pages >= 2
        """,
        "robots_sitemaps": r"""
            WITH e AS (
                SELECT doc_id,
                       'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
                       CAST(unnest(range(0, CASE doc_id % 4 WHEN 0 THEN 2
                                               WHEN 1 THEN 1 WHEN 2 THEN 0
                                               ELSE 1 END)) AS BIGINT) AS ord
                FROM documents
            )
            SELECT host,
                   CASE
                       WHEN doc_id % 4 = 0 AND ord = 0
                           THEN 'https://' || host || '/sitemap'
                                || CAST(doc_id AS VARCHAR) || '.xml'
                       WHEN doc_id % 4 = 0 AND ord = 1
                           THEN 'https://' || host || '/news.xml'
                       WHEN doc_id % 4 = 1
                           THEN 'https://' || host || '/s'
                                || CAST(doc_id AS VARCHAR) || '.xml'
                       ELSE 'https://' || host || '/dup.xml'
                   END AS sitemap_url,
                   ord
            FROM e
        """,
        "sitemap_urls": r"""
            WITH k AS (SELECT doc_id,
                              CASE WHEN doc_id % 5 = 0 THEN 2
                                   ELSE doc_id % 3 + 1 END AS n
                       FROM documents),
            e AS (SELECT doc_id, CAST(unnest(range(0, n)) AS BIGINT) AS j
                  FROM k)
            SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
                   CASE WHEN doc_id % 5 = 0
                            THEN 'https://h' || CAST(doc_id AS VARCHAR)
                                 || '.example.com/sitemap'
                                 || CAST(j + 1 AS VARCHAR) || '.xml'
                        WHEN j = 0
                            THEN 'https://h' || CAST(doc_id AS VARCHAR)
                                 || '.example.com/p0?a=1&b=2'
                        ELSE 'https://h' || CAST(doc_id AS VARCHAR)
                             || '.example.com/p' || CAST(j AS VARCHAR)
                   END AS url,
                   CASE WHEN doc_id % 5 = 0
                            THEN CASE WHEN j = 0 THEN '2026-01-15' ELSE '' END
                        ELSE '2026-01-0' || CAST(j + 1 AS VARCHAR)
                   END AS lastmod,
                   CAST(CASE WHEN doc_id % 5 = 0 THEN -1
                             ELSE 250000 * (j + 1) END AS BIGINT)
                       AS priority_ppm,
                   CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
                       AS from_index
            FROM e
        """,
        "robots_rules": r"""
            SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
                   CAST(CASE doc_id % 4
                            WHEN 0 THEN (doc_id % 10) * 1000
                            WHEN 1 THEN 2500
                            ELSE -1
                        END AS BIGINT) AS crawl_delay_ms,
                   CASE doc_id % 4
                       WHEN 0 THEN '/priv' || CAST(doc_id AS VARCHAR) || ',/x'
                       WHEN 1 THEN '/tmp' || CAST(doc_id AS VARCHAR)
                       ELSE ''
                   END AS disallow
            FROM documents
        """,
        "novelty": r"""
            WITH tok AS (SELECT doc_id,
                                regexp_extract_all(coalesce(text, ''),
                                                   '[^\t\n\v\f\r ]+') AS w
                         FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(w[p : p + 2], ' ') AS g
                  FROM (SELECT doc_id, w,
                               CAST(unnest(range(1, greatest(len(w) - 1, 1)))
                                   AS BIGINT) AS p
                        FROM tok)),
            dfreq AS (SELECT g, count(*) AS df FROM g GROUP BY g),
            per AS (SELECT g.doc_id, count(*) AS tot,
                           sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS uniq
                    FROM g JOIN dfreq USING (g) GROUP BY g.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.tot, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(per.uniq, 0) AS BIGINT) AS uniq_grams,
                   CAST(CASE WHEN coalesce(per.tot, 0) = 0 THEN 0
                             ELSE coalesce(per.uniq, 0) * 1000000 // per.tot
                        END AS BIGINT) AS novelty_ppm
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "containment": r"""
            WITH tok AS (SELECT doc_id,
                                regexp_extract_all(coalesce(text, ''),
                                                   '[^\t\n\v\f\r ]+') AS w
                         FROM documents),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(w[p : p + 2], ' ') AS g
                  FROM (SELECT doc_id, w,
                               CAST(unnest(range(1, greatest(len(w) - 1, 1)))
                                   AS BIGINT) AS p
                        FROM tok)),
            sz AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
            dfreq AS (SELECT g, count(*) AS df FROM g GROUP BY g),
            kept AS (SELECT g.doc_id, g.g
                     FROM g JOIN dfreq USING (g)
                     WHERE dfreq.df BETWEEN 2 AND 256),
            pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                             count(*) AS inter
                      FROM kept a JOIN kept b
                        ON a.g = b.g AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b,
                   CAST(inter AS BIGINT) AS inter_grams,
                   CAST(sa.ng AS BIGINT) AS n_a,
                   CAST(sb.ng AS BIGINT) AS n_b,
                   CAST(inter * 1000000 // least(sa.ng, sb.ng) AS BIGINT)
                       AS containment_ppm
            FROM pairs
            JOIN sz sa ON sa.doc_id = ia
            JOIN sz sb ON sb.doc_id = ib
            WHERE inter * 1000000 // least(sa.ng, sb.ng) >= 100000
        """,
        "normalize_text": r"""
            WITH raw AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 3 = 0 THEN chr(7) || '  '
                             ELSE '' END)
                       || (CASE WHEN doc_id % 7 = 0
                                    THEN replace(text, 'e', 'e' || chr(769))
                                ELSE text END) AS txt
                FROM documents
            ),
            norm AS (
                SELECT doc_id, txt,
                       trim(regexp_replace(regexp_replace(
                           nfc_normalize(txt),
                           '[\x00-\x1f\x7f]', ' ', 'g'),
                           '\s+', ' ', 'g')) AS norm_text
                FROM raw
            )
            SELECT doc_id, norm_text,
                   CASE WHEN norm_text <> txt THEN 1 ELSE 0 END AS changed,
                   length(norm_text) AS n_chars
            FROM norm
        """,
        # zone maps: per-500-event shard (count,min,max) of epoch-us ts +
        # the disjointness verdict for [2024-01-10, 2024-01-16); all int64
        "zone_prune": """
            WITH z AS (
              SELECT event_id // 500 AS shard,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(min(epoch_us(ts)) AS BIGINT) AS vmin,
                     CAST(max(epoch_us(ts)) AS BIGINT) AS vmax
              FROM events GROUP BY shard
            )
            SELECT shard, n_rows, vmin, vmax,
                   (vmax < epoch_us(TIMESTAMP '2024-01-10')
                    OR vmin >= epoch_us(TIMESTAMP '2024-01-16')) AS skipped
            FROM z ORDER BY shard
        """,
        "bloom_route": _bloom_sql(),
        "reshard_moves": _reshard_sql(),
        # segment_merge: per-segment and merged term dictionaries
        # re-derived with dense_rank; the remap is checked row-by-row
        "segment_merge": r"""
            WITH toks AS (
              SELECT doc_id, doc_id % 3 AS seg,
                     unnest(regexp_extract_all(coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+')) AS token
              FROM documents
            ), tf AS (
              SELECT seg, token, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM toks GROUP BY 1, 2, 3
            ), segdict AS (
              SELECT seg, token,
                     CAST(dense_rank() OVER (PARTITION BY seg ORDER BY token)
                          - 1 AS BIGINT) AS local_term_id
              FROM (SELECT DISTINCT seg, token FROM tf)
            ), mdict AS (
              SELECT token,
                     CAST(dense_rank() OVER (ORDER BY token) - 1
                          AS BIGINT) AS term_id
              FROM (SELECT DISTINCT token FROM tf)
            )
            SELECT m.term_id, t.token, CAST(t.seg AS BIGINT) AS seg,
                   s.local_term_id, t.doc_id, t.tf
            FROM tf t
            JOIN segdict s USING (seg, token)
            JOIN mdict m USING (token)
        """,
        # doc_deletes: tombstones are doc_id % 13 == 0
        "doc_deletes": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+')) AS token
              FROM documents
            ), tf AS (
              SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2
            )
            SELECT token, CAST(count(*) AS BIGINT) AS df_total,
                   CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS df_live,
                   CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN tf ELSE 0 END)
                        AS BIGINT) AS cf_live
            FROM tf GROUP BY token
        """,
        # c4_line_filter: the oracle RE-SYNTHESIZES the 8-token lines
        # (same doc_id arithmetic as the query's synth) and re-applies
        # the C4 rules with DuckDB list/regexp kernels
        "c4_line_filter": r"""
            WITH tkt AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text,''),
                                        '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), ln AS (
              SELECT doc_id, i,
                array_to_string(tk[(i*8+1):(i*8+8)], ' ')
                  || CASE WHEN (doc_id+i)%17=0 THEN ' javascript' ELSE '' END
                  || CASE WHEN (doc_id+i)%3<>2 THEN '.' ELSE '' END
                  || CASE WHEN doc_id%31=0 AND i=0 THEN ' {' ELSE '' END
                  AS line
              FROM tkt,
                   UNNEST(range(0, greatest((len(tk)+7)//8, 1))) AS u(i)
            ), b AS (
              SELECT doc_id, line, contains(line, '{') AS curly,
                     length(line) AS nch,
                CASE WHEN regexp_matches(line, '(?i)javascript') THEN 'ban'
                     WHEN len(regexp_extract_all(line,
                          '[^\t\n\x0b\x0c\r ]+')) < 5 THEN 'short'
                     WHEN NOT regexp_matches(line, '[.!?"]$') THEN 'punct'
                     ELSE 'keep' END AS verdict
              FROM ln
            )
            SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CASE WHEN verdict='keep' THEN 1 ELSE 0 END)
                   AS BIGINT) AS kept_lines,
              CAST(sum(CASE WHEN verdict='ban' THEN 1 ELSE 0 END)
                   AS BIGINT) AS drop_banned,
              CAST(sum(CASE WHEN verdict='short' THEN 1 ELSE 0 END)
                   AS BIGINT) AS drop_short,
              CAST(sum(CASE WHEN verdict='punct' THEN 1 ELSE 0 END)
                   AS BIGINT) AS drop_punct,
              CAST(CASE WHEN NOT bool_or(curly)
                    AND sum(CASE WHEN verdict='keep' THEN 1 ELSE 0 END) >= 3
                    THEN 1 ELSE 0 END AS BIGINT) AS doc_kept,
              CAST(sum(CASE WHEN verdict='keep' THEN nch ELSE 0 END)
                   + greatest(sum(CASE WHEN verdict='keep' THEN 1 ELSE 0 END)
                              - 1, 0) AS BIGINT) AS clean_chars
            FROM b GROUP BY doc_id
        """,
        # badwords: exact token membership via list_filter
        "badwords": r"""
            WITH s AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+')) AS BIGINT) AS n_tokens,
                CAST(len(list_filter(regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+'),
                     t -> t IN ('dup','spark','null'))) AS BIGINT) AS n_bad
              FROM documents
            )
            SELECT doc_id, n_tokens, n_bad,
              CAST(floor(1000000.0 * n_bad / greatest(n_tokens, 1))
                   AS BIGINT) AS bad_ppm,
              CAST(CASE WHEN floor(1000000.0 * n_bad / greatest(n_tokens, 1))
                   >= 50000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
            FROM s
        """,
        # mirror_detect: content/host synth re-derived from doc_id
        # arithmetic; the md5 and the distinct-host group run for real
        "mirror_detect": """
            WITH c AS (
              SELECT doc_id,
                md5(CASE WHEN doc_id % 3 = 0
                     THEN 'u-' || CAST(doc_id AS VARCHAR)
                     ELSE 'page-' || CAST(doc_id // 4 AS VARCHAR) || '-body'
                    END) AS content_md5,
                'h' || CAST(doc_id % 7 AS VARCHAR) AS host
              FROM documents
            )
            SELECT content_md5,
                   CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(min(doc_id) AS BIGINT) AS rep_doc
            FROM c GROUP BY content_md5
            HAVING count(DISTINCT host) > 1
        """,
        # soft404: title synth re-derived from doc_id % 6; the marker
        # regex and the thin-body gate (REAL n_chars) run for real
        "soft404": """
            WITH s AS (
              SELECT doc_id, n_chars,
                CASE doc_id % 6
                  WHEN 0 THEN 'Page Not Found'
                  WHEN 1 THEN '404 - missing'
                  WHEN 2 THEN 'Internal Server Error'
                  WHEN 3 THEN 'Product page ' || CAST(doc_id AS VARCHAR)
                  WHEN 4 THEN 'File does not exist'
                  ELSE 'Home ' || CAST(doc_id AS VARCHAR) END AS title
              FROM documents
            )
            SELECT doc_id,
              CAST(CASE WHEN regexp_matches(title,
                   '(?i)(not found|404|error|does not exist|no longer available)')
                   THEN 1 ELSE 0 END AS BIGINT) AS marker,
              CAST(CASE WHEN regexp_matches(title,
                   '(?i)(not found|404|error|does not exist|no longer available)')
                   AND n_chars < 600 THEN 1 ELSE 0 END AS BIGINT) AS soft404
            FROM s
        """,
        # terms_set: exact-token membership with per-doc threshold
        "terms_set": r"""
            WITH s AS (
              SELECT doc_id, 1 + doc_id % 4 AS required,
                CAST(list_contains(tk, 'join') AS INT)
                + CAST(list_contains(tk, 'merge') AS INT)
                + CAST(list_contains(tk, 'scan') AS INT)
                + CAST(list_contains(tk, 'window') AS INT) AS n_matched
              FROM (
                SELECT doc_id,
                       regexp_extract_all(coalesce(text,''),
                                          '[^\t\n\x0b\x0c\r ]+') AS tk
                FROM documents
              )
            )
            SELECT doc_id, CAST(n_matched AS BIGINT) AS n_matched,
                   CAST(required AS BIGINT) AS required
            FROM s WHERE n_matched >= required
        """,
        # composite_agg: after-key cursor re-derived with a lexicographic
        # WHERE + ORDER BY + LIMIT page
        "composite_agg": """
            WITH b AS (
              SELECT event_type, user_id % 50 AS bucket,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(min(event_id) AS BIGINT) AS min_id
              FROM events GROUP BY 1, 2
            ), f AS (
              SELECT * FROM b
              WHERE event_type > 'error'
                 OR (event_type = 'error' AND bucket > 17)
            )
            SELECT event_type, bucket, n_rows, min_id,
                   CAST(row_number() OVER (ORDER BY event_type, bucket)
                        AS BIGINT) AS rank
            FROM f ORDER BY event_type, bucket LIMIT 20
        """,
        # ltr_features: df/dl/corpus stats re-derived; bm25_nano uses the
        # IDENTICAL folded-literal double expression (2.2/0.3/0.9) with
        # the same evaluation grouping as the numpy kernel
        "ltr_features": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+')) AS token
              FROM documents
            ), dld AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(coalesce(text,''),
                          '[^\t\n\x0b\x0c\r ]+')) AS BIGINT) AS dl
              FROM documents
            ), tfr AS (
              SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
              FROM toks WHERE token IN ('join','merge','scan','window')
              GROUP BY 1, 2
            ), dfm AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tfr GROUP BY token
            ), nm AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
              FROM tfr GROUP BY doc_id
            ), st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS total_tokens
              FROM dld
            )
            SELECT t.doc_id, t.token, t.tf, d.dl, m.n_matched,
              CAST(floor(1000000000.0
                   * ln((s.n_docs - f.df + 0.5) / (f.df + 0.5)))
                   AS BIGINT) AS idf_nano,
              CAST(floor(1000000000.0
                   * ln((s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + 0.3
                      + 0.9 * (d.dl * s.n_docs / s.total_tokens)))
                   AS BIGINT) AS bm25_nano
            FROM tfr t
            JOIN dld d USING (doc_id)
            JOIN nm m USING (doc_id)
            JOIN dfm f USING (token)
            CROSS JOIN st s
        """,
        # host_boilerplate: lines re-synthesized per doc (banner + even
        # footer + 8-token chunks); distinct-doc count per (host, line)
        "host_boilerplate": r"""
            WITH tkt AS (
              SELECT doc_id, 'h' || CAST(doc_id % 7 AS VARCHAR) AS host,
                     regexp_extract_all(coalesce(text,''),
                                        '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), ln AS (
              SELECT doc_id, host,
                     'nav menu for h' || CAST(doc_id % 7 AS VARCHAR) AS line
              FROM tkt
              UNION ALL
              SELECT doc_id, host,
                     'footer contact h' || CAST(doc_id % 7 AS VARCHAR)
              FROM tkt WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, host,
                     array_to_string(tk[(i*8+1):(i*8+8)], ' ')
              FROM tkt,
                   UNNEST(range(0, greatest((len(tk)+7)//8, 1))) AS u(i)
            )
            SELECT host, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occurrences
            FROM ln GROUP BY host, line
            HAVING count(DISTINCT doc_id) >= 3
        """,
        # stopword_gen: df over distinct per-doc tokens, 40% threshold
        "stopword_gen": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_distinct(regexp_extract_all(
                            coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+'))) AS token
              FROM documents
            ), n AS (SELECT count(*) AS nd FROM documents),
            d AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM toks GROUP BY token
            )
            SELECT token, df,
                   CAST(floor(1000000.0 * df / (SELECT nd FROM n))
                        AS BIGINT) AS df_ppm
            FROM d
            WHERE floor(1000000.0 * df / (SELECT nd FROM n)) >= 400000
        """,
        # charset_sniff: WHATWG ladder decisions re-derived per payload
        # variant (doc_id % 8); see queries._CHARSET_BODIES/_CHARSET_EXPECT
        "charset_sniff": """
            SELECT doc_id,
              CASE doc_id % 8
                WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                WHEN 2 THEN 'iso-8859-1' WHEN 3 THEN 'windows-1251'
                WHEN 4 THEN 'ascii' WHEN 5 THEN 'utf-8'
                WHEN 6 THEN 'utf-8' ELSE 'shift_jis' END AS encoding,
              CAST(CASE WHEN doc_id % 8 IN (0, 1, 6) THEN 1 ELSE 0
                   END AS BIGINT) AS bom,
              CAST(CASE WHEN doc_id % 8 IN (2, 3, 7) THEN 1 ELSE 0
                   END AS BIGINT) AS declared
            FROM documents
        """,
        # cache_control: RFC 9111 decisions re-derived per header variant
        # (doc_id % 8); see queries._CACHE_HEADERS for the eight cases
        "cache_control": """
            SELECT doc_id,
              CAST(CASE doc_id % 8
                WHEN 0 THEN 3600 WHEN 1 THEN -1 WHEN 2 THEN 600
                WHEN 3 THEN -1   WHEN 4 THEN 120 WHEN 5 THEN 45
                WHEN 6 THEN 7200 ELSE 10 END AS BIGINT) AS max_age,
              CAST(CASE WHEN doc_id % 8 IN (1, 2, 4) THEN 1 ELSE 0
                   END AS BIGINT) AS no_store,
              CAST(CASE doc_id % 8
                WHEN 0 THEN 3600 WHEN 1 THEN 0  WHEN 2 THEN 0
                WHEN 3 THEN 86400 WHEN 4 THEN 0 WHEN 5 THEN 45
                WHEN 6 THEN 7200 ELSE 10 END AS BIGINT) AS revisit_s
            FROM documents
        """,
        # canonical_groups: targets re-derived from doc_id arithmetic
        # (v0/v2 self, v1 -> previous doc's url, v3 -> relative /c/ path)
        "canonical_groups": """
            WITH c AS (
              SELECT doc_id,
                CASE doc_id % 4
                  WHEN 1 THEN 'https://s' || CAST((doc_id - 1) % 7 AS VARCHAR)
                              || '.example.com/p/' || CAST(doc_id - 1 AS VARCHAR)
                  WHEN 3 THEN 'https://s' || CAST(doc_id % 7 AS VARCHAR)
                              || '.example.com/c/' || CAST(doc_id // 4 AS VARCHAR)
                  ELSE 'https://s' || CAST(doc_id % 7 AS VARCHAR)
                       || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                END AS canonical
              FROM documents
            )
            SELECT canonical, CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(min(doc_id) AS BIGINT) AS rep_doc
            FROM c GROUP BY canonical
        """,
        # robots_wildcards: expected decisions hand-resolved per RFC 9309
        # §2.2.2 from the four fixed bodies x five paths (variant =
        # doc_id%4, path = doc_id%5) — independent of the engine's parser
        "robots_wildcards": """
            SELECT doc_id,
              CAST(CASE doc_id % 4
                WHEN 0 THEN CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                WHEN 1 THEN CASE WHEN doc_id % 5 = 1 THEN 0 ELSE 1 END
                WHEN 2 THEN CASE WHEN doc_id % 5 = 3 THEN 0 ELSE 1 END
                ELSE 1 END AS BIGINT) AS allowed,
              CAST(CASE doc_id % 4
                WHEN 0 THEN CASE WHEN doc_id % 5 = 0 THEN 8 ELSE 1 END
                WHEN 1 THEN CASE doc_id % 5 WHEN 1 THEN 10 WHEN 2 THEN 15
                            ELSE 0 END
                WHEN 2 THEN CASE WHEN doc_id % 5 = 3 THEN 7 ELSE 0 END
                ELSE 0 END AS BIGINT) AS rule_len
            FROM documents
        """,
        "rank_eval": _rank_eval_sql(),
        # span_near: position-list cross join per doc, min |pa-pb| <= slop+1
        "span_near": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text,''),
                                        '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), ap AS (
              SELECT doc_id, unnest(list_filter(list_transform(
                       range(1, len(tk)+1),
                       i -> CASE WHEN tk[i] = 'value' THEN i END),
                     x -> x IS NOT NULL)) AS p
              FROM toks
            ), bp AS (
              SELECT doc_id, unnest(list_filter(list_transform(
                       range(1, len(tk)+1),
                       i -> CASE WHEN tk[i] = 'table' THEN i END),
                     x -> x IS NOT NULL)) AS p
              FROM toks
            ), g AS (
              SELECT ap.doc_id AS doc_id,
                     CAST(min(abs(ap.p - bp.p)) AS BIGINT) AS min_gap
              FROM ap JOIN bp USING (doc_id) GROUP BY ap.doc_id
            )
            SELECT doc_id, min_gap FROM g WHERE min_gap <= 4
        """,
        # meta_robots: flags re-derived from the doc_id % 6 page variant
        # (queries._htmlmeta_page), independent of the HTML parser
        "meta_robots": """
            SELECT doc_id,
              CAST(CASE WHEN doc_id % 6 IN (1, 2) THEN 1 ELSE 0
                   END AS BIGINT) AS noindex,
              CAST(CASE WHEN doc_id % 6 IN (2, 3, 5) THEN 1 ELSE 0
                   END AS BIGINT) AS nofollow,
              CAST(CASE WHEN doc_id % 6 = 3 THEN 1 ELSE 0
                   END AS BIGINT) AS noarchive,
              CAST(CASE WHEN doc_id % 6 = 5 THEN 1 ELSE 0
                   END AS BIGINT) AS nosnippet
            FROM documents
        """,
        # hreflang_map: alternates re-derived from doc_id % 4; hrefs
        # follow https://alt.example.com/{lang}/{doc_id}
        "hreflang_map": """
            WITH m AS (
              SELECT doc_id, 'en' AS hreflang FROM documents
              WHERE doc_id % 4 = 0
              UNION ALL SELECT doc_id, 'de' FROM documents
              WHERE doc_id % 4 = 0
              UNION ALL SELECT doc_id, 'x-default' FROM documents
              WHERE doc_id % 4 = 0
              UNION ALL SELECT doc_id, 'fr' FROM documents
              WHERE doc_id % 4 = 2
              UNION ALL SELECT doc_id, 'en-gb' FROM documents
              WHERE doc_id % 4 = 3
            )
            SELECT doc_id, hreflang,
                   'https://alt.example.com/' || hreflang || '/'
                   || CAST(doc_id AS VARCHAR) AS href
            FROM m
        """,
        # hreflang_reciprocal: edges from doc_id % 4 (0 -> d+1 de,
        # 1 -> d-1 en, 2 -> d+1 fr dangling); the (0,1) pair is
        # reciprocal only when the partner page EXISTS in the corpus
        "hreflang_reciprocal": """
            WITH e AS (
              SELECT d.doc_id AS doc_id, 'de' AS hreflang,
                     'https://ex.com/p/' || CAST(d.doc_id + 1 AS VARCHAR)
                       AS href,
                     CASE WHEN EXISTS (SELECT 1 FROM documents p
                                       WHERE p.doc_id = d.doc_id + 1)
                          THEN 1 ELSE 0 END AS reciprocal
              FROM documents d WHERE d.doc_id % 4 = 0
              UNION ALL
              SELECT doc_id, 'en',
                     'https://ex.com/p/' || CAST(doc_id - 1 AS VARCHAR), 1
              FROM documents WHERE doc_id % 4 = 1
              UNION ALL
              SELECT doc_id, 'fr',
                     'https://ex.com/p/' || CAST(doc_id + 1 AS VARCHAR), 0
              FROM documents WHERE doc_id % 4 = 2
            )
            SELECT doc_id, hreflang, href,
                   CAST(reciprocal AS BIGINT) AS reciprocal
            FROM e
        """,
        # extended_stats: identical floor(v*1000+0.5) quantization, exact
        # int64 moments, variance in HUGEINT floor division
        "extended_stats": """
            WITH q AS (
              SELECT event_type,
                     CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vm
              FROM events WHERE value IS NOT NULL
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(vm) AS BIGINT) AS sum_m,
                   CAST(min(vm) AS BIGINT) AS min_m,
                   CAST(max(vm) AS BIGINT) AS max_m,
                   CAST(sum(vm * vm) AS BIGINT) AS ssq_m,
                   CAST((CAST(count(*) AS HUGEINT) * sum(vm * vm)
                         - CAST(sum(vm) AS HUGEINT) * sum(vm))
                        // (CAST(count(*) AS HUGEINT) * count(*))
                        AS BIGINT) AS var_m2
            FROM q GROUP BY event_type
        """,
        # dis_max: best-field max + tie_breaker*rest over the same
        # whitespace tokenizer; terms = _TERMS_SET[:3], tie 300 milli
        "dis_max": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), s AS (
              SELECT doc_id,
                     CAST(len(list_filter(tk, x -> x = 'join'))
                          AS BIGINT) AS tf1,
                     CAST(len(list_filter(tk, x -> x = 'merge'))
                          AS BIGINT) AS tf2,
                     CAST(len(list_filter(tk, x -> x = 'scan'))
                          AS BIGINT) AS tf3
              FROM t
            ), sc AS (
              SELECT doc_id,
                     CAST(greatest(tf1, tf2, tf3) AS BIGINT) AS max_tf,
                     CAST(tf1 + tf2 + tf3 AS BIGINT) AS sum_tf
              FROM s WHERE tf1 + tf2 + tf3 > 0
            )
            SELECT doc_id, max_tf, sum_tf,
                   CAST(1000 * max_tf + 300 * (sum_tf - max_tf)
                        AS BIGINT) AS score_milli,
                   CAST(row_number() OVER (
                        ORDER BY 1000 * max_tf + 300 * (sum_tf - max_tf)
                                 DESC, doc_id)
                        AS BIGINT) AS rank
            FROM sc
            ORDER BY score_milli DESC, doc_id LIMIT 10
        """,
        # change_rate: the visit log regenerated with generate_series,
        # aggregated independently; ladder thresholds 400k/350k ppm
        "change_rate": """
            WITH v AS (
              SELECT d.doc_id AS url_id, j.j AS j,
                     CASE WHEN (d.doc_id * 31 + j.j) % 3 = 0
                          THEN 1 ELSE 0 END AS changed
              FROM documents d,
                   LATERAL (SELECT unnest(generate_series(
                            0, 2 + d.doc_id % 5)) AS j) j
            ), a AS (
              SELECT url_id,
                     CAST(count(*) AS BIGINT) AS visits,
                     CAST(sum(changed) AS BIGINT) AS changes
              FROM v GROUP BY url_id
            )
            SELECT url_id, visits, changes,
                   CAST((1000000 * (changes + 1)) // (visits + 2)
                        AS BIGINT) AS ratio_ppm,
                   CAST(CASE
                     WHEN (1000000 * (changes + 1)) // (visits + 2)
                          >= 400000 THEN 3600
                     WHEN (1000000 * (changes + 1)) // (visits + 2)
                          >= 350000 THEN 86400
                     ELSE 604800 END AS BIGINT) AS revisit_s
            FROM a
        """,
        # adjacency_matrix: pairwise term-presence intersections over
        # the same whitespace tokenizer; zero pairs kept
        "adjacency_matrix": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), b AS (
              SELECT doc_id,
                     list_contains(tk, 'join') AS f1,
                     list_contains(tk, 'merge') AS f2,
                     list_contains(tk, 'scan') AS f3,
                     list_contains(tk, 'window') AS f4
              FROM t
            )
            SELECT 'join' AS filter_a, 'join' AS filter_b,
                   CAST(count(*) FILTER (WHERE f1) AS BIGINT) AS doc_count
            FROM b
            UNION ALL SELECT 'join', 'merge',
                   CAST(count(*) FILTER (WHERE f1 AND f2) AS BIGINT) FROM b
            UNION ALL SELECT 'join', 'scan',
                   CAST(count(*) FILTER (WHERE f1 AND f3) AS BIGINT) FROM b
            UNION ALL SELECT 'join', 'window',
                   CAST(count(*) FILTER (WHERE f1 AND f4) AS BIGINT) FROM b
            UNION ALL SELECT 'merge', 'merge',
                   CAST(count(*) FILTER (WHERE f2) AS BIGINT) FROM b
            UNION ALL SELECT 'merge', 'scan',
                   CAST(count(*) FILTER (WHERE f2 AND f3) AS BIGINT) FROM b
            UNION ALL SELECT 'merge', 'window',
                   CAST(count(*) FILTER (WHERE f2 AND f4) AS BIGINT) FROM b
            UNION ALL SELECT 'scan', 'scan',
                   CAST(count(*) FILTER (WHERE f3) AS BIGINT) FROM b
            UNION ALL SELECT 'scan', 'window',
                   CAST(count(*) FILTER (WHERE f3 AND f4) AS BIGINT) FROM b
            UNION ALL SELECT 'window', 'window',
                   CAST(count(*) FILTER (WHERE f4) AS BIGINT) FROM b
        """,
        # lexical_diversity: same tokenizer; DuckDB list_distinct
        "lexical_diversity": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(coalesce(text,''),
                     '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(tk)) AS BIGINT) AS n_types,
                   CAST(CASE WHEN len(tk) = 0 THEN -1
                        ELSE (1000000 * len(list_distinct(tk))) // len(tk)
                        END AS BIGINT) AS ttr_ppm
            FROM t
        """,
        # stale_pages: days since epoch via date arithmetic (no magic
        # constants); every 4th sitemap entry lacks lastmod, every 7th
        # url was never captured
        "stale_pages": """
            WITH s AS (
              SELECT doc_id,
                     'https://ex.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                     CASE WHEN doc_id % 4 = 0 THEN -1
                          ELSE date_diff('day', DATE '1970-01-01',
                                         DATE '2026-01-01') + doc_id % 28
                     END AS lastmod_day
              FROM documents
            ), c AS (
              SELECT doc_id,
                     date_diff('day', DATE '1970-01-01', DATE '2026-01-01')
                     + (doc_id * 3) % 28 AS capture_day
              FROM documents WHERE doc_id % 7 <> 0
            )
            SELECT s.url,
                   CAST(s.lastmod_day AS BIGINT) AS lastmod_day,
                   CAST(coalesce(c.capture_day, -1) AS BIGINT) AS capture_day,
                   CAST(CASE WHEN c.capture_day IS NULL
                             OR s.lastmod_day > c.capture_day
                        THEN 1 ELSE 0 END AS BIGINT) AS stale
            FROM s LEFT JOIN c USING (doc_id)
        """,
        # robots_directives: meta variant doc_id%6 (_htmlmeta_page) OR
        # header variant doc_id%5 (scoped group at %5=3 is ignored)
        "robots_directives": """
            SELECT doc_id,
              CAST(CASE WHEN doc_id % 6 IN (1, 2) OR doc_id % 5 = 2
                   THEN 1 ELSE 0 END AS BIGINT) AS noindex,
              CAST(CASE WHEN doc_id % 6 IN (2, 3, 5)
                        OR doc_id % 5 IN (2, 4)
                   THEN 1 ELSE 0 END AS BIGINT) AS nofollow,
              CAST(CASE WHEN doc_id % 6 = 3 OR doc_id % 5 = 1
                   THEN 1 ELSE 0 END AS BIGINT) AS noarchive,
              CAST(CASE WHEN doc_id % 6 = 5 OR doc_id % 5 = 4
                   THEN 1 ELSE 0 END AS BIGINT) AS nosnippet,
              CAST(CASE WHEN doc_id % 5 IN (1, 2, 4) THEN 1 ELSE 0
                   END AS BIGINT) AS from_header,
              CAST(CASE WHEN doc_id % 6 IN (1, 2, 3, 5) THEN 1 ELSE 0
                   END AS BIGINT) AS from_meta
            FROM documents
        """,
        # link_rel_stats: counts re-derived from the doc_id%4 page
        # variant (2 internal + 1 external / relative + nofollow ext /
        # nofollow int + decoy ext / none)
        "link_rel_stats": """
            SELECT doc_id,
              CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2
                   WHEN 2 THEN 2 ELSE 0 END AS BIGINT) AS n_links,
              CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1
                   WHEN 2 THEN 1 ELSE 0 END AS BIGINT) AS n_internal,
              CAST(CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 1 ELSE 0
                   END AS BIGINT) AS n_external,
              CAST(CASE WHEN doc_id % 4 IN (1, 2) THEN 1 ELSE 0
                   END AS BIGINT) AS n_nofollow
            FROM documents
        """,
        # filtered kNN: same rank-only contract as ann_topk, candidates
        # restricted by the metadata predicate (pushed to the scan in Ray)
        "ann_filtered": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 5
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qv,
                        CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e WHERE e.label <= 2
            ),
            ranked AS (
              SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
        """,
        # ES rare_terms: long-tail buckets by doc frequency (corpus-relative
        # cutoff n//10 -- documented deviation from ES's absolute
        # max_doc_count), df asc head
        "rare_terms": r"""
            WITH tokd AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(coalesce(text,''),
                            '[^\t\n\x0b\x0c\r ]+')) AS token
              FROM documents
            ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            df AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM tokd GROUP BY token
            )
            SELECT token, df FROM df, n
            WHERE df <= greatest(1, n.n // 10)
            ORDER BY df, token LIMIT 50
        """,
        # ES bucket_script/selector/sort over a daily date_histogram:
        # exact milli-mean, strictly-above-mean-size selector (integer
        # cross-multiplication), avg_m desc head.  All operands positive
        # so // is floor both sides.
        "bucket_pipeline": """
            WITH b AS (
              SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(floor(value*1000 + 0.5) AS BIGINT))
                          AS BIGINT) AS s_m
              FROM events GROUP BY 1, 2
            ), tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS tn,
                     CAST(count(*) AS BIGINT) AS nb FROM b
            )
            SELECT CAST(day AS BIGINT) AS day, event_type, n, s_m,
                   CAST(s_m // n AS BIGINT) AS avg_m
            FROM b, tot WHERE n * nb > tn
            ORDER BY avg_m DESC, day, event_type LIMIT 20
        """,
        # ES diversified_sampler: cap 3 docs per source (lowest ids =
        # deterministic score order), sub-agg over the de-biased sample
        "diversified_sample": """
            WITH r AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
              FROM documents
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_sampled,
                   CAST(sum(n_chars) AS BIGINT) AS sum_value,
                   CAST(min(doc_id) AS BIGINT) AS min_id,
                   CAST(max(doc_id) AS BIGINT) AS max_id
            FROM r WHERE rn <= 3
            GROUP BY source ORDER BY source
        """,
        "geo_distance": """
            WITH c AS (SELECT doc_id,
                (doc_id * 2654435761) % 180000000 - 90000000 AS lat_u,
                (doc_id * 2246822519) % 360000000 - 180000000 AS lon_u
              FROM documents),
            d AS (SELECT doc_id,
                    (lat_u - 10000000) * (lat_u - 10000000)
                  + (lon_u - (-20000000)) * (lon_u - (-20000000)) AS d2
                  FROM c),
            f AS (SELECT doc_id, CAST(d2 AS BIGINT) AS d2 FROM d
                  WHERE d2 <= CAST(60000000 AS BIGINT) * 60000000),
            r AS (SELECT *, CAST(row_number() OVER (
                      ORDER BY d2, doc_id) AS BIGINT) AS rank FROM f)
            SELECT doc_id, d2, rank FROM r WHERE rank <= 50
        """,
        "meta_counts": """
            SELECT 'documents' AS tbl, CAST(count(*) AS BIGINT) AS n_rows
            FROM documents
            UNION ALL SELECT 'events', count(*) FROM events
            UNION ALL SELECT 'lineitem', count(*) FROM lineitem
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'customer', count(*) FROM customer
        """,
        "homoglyphs": """
            WITH h AS (SELECT DISTINCT
                CASE WHEN doc_id % 9 = 0 THEN
                    'h' || CAST(doc_id % 50 AS VARCHAR) || '.examplе.com'
                WHEN doc_id % 9 = 1 THEN
                    'only-' || CAST(doc_id AS VARCHAR) || '.example.org'
                ELSE 'h' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
                END AS host
              FROM documents),
            s AS (SELECT host,
                         translate(host,
                             'аеорсхуіѕԁɡոοαντ',
                             'aeopcxyisdgnoavt') AS skeleton,
                         CAST(strlen(host) = length(host) AS BIGINT)
                             AS is_ascii
                  FROM h),
            g AS (SELECT skeleton, CAST(count(*) AS BIGINT) AS n_hosts
                  FROM s GROUP BY skeleton)
            SELECT s.skeleton, s.host, g.n_hosts, s.is_ascii
            FROM s JOIN g ON g.skeleton = s.skeleton
            WHERE g.n_hosts >= 2
        """,
        "setsim_join": """
            WITH s AS (SELECT doc_id,
                list_distinct(list_slice(regexp_extract_all(text,
                    '[^\t\n\x0b\x0c\r ]+'), 1, 5)) AS tk
              FROM documents),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT)
                             AS inter,
                         CAST(len(a.tk) + len(b.tk)
                              - len(list_intersect(a.tk, b.tk)) AS BIGINT)
                             AS uni
                  FROM s a JOIN s b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b, inter, uni
            FROM p WHERE 10 * inter >= 6 * uni
        """,
        "feed_urls": """
            WITH b AS (SELECT doc_id,
                'https://blog.example.com/' || CAST(doc_id AS VARCHAR)
                    AS u,
                printf('%02d', doc_id % 28 + 1) AS dd
              FROM documents),
            rows_ AS (
              SELECT doc_id AS feed_id, u || '/a1' AS url,
                     '2024-01-' || dd AS published, 1 AS is_atom
              FROM b WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id, u || '/a2', '', 1 FROM b WHERE doc_id % 3 = 0
              UNION ALL
              SELECT doc_id, u || '/r1', 'Mon, ' || dd || ' Jan 2024', 0
              FROM b WHERE doc_id % 3 != 0
              UNION ALL
              SELECT doc_id, u || '/r2', '', 0 FROM b WHERE doc_id % 3 != 0
            )
            SELECT feed_id, url, published, CAST(is_atom AS BIGINT) AS is_atom
            FROM rows_
        """,
        "img_srcset": """
            WITH b AS (SELECT doc_id,
                'https://img.example.com/' || CAST(doc_id AS VARCHAR)
                    AS base
              FROM documents),
            rows_ AS (
              SELECT doc_id, base || '.jpg' AS img_url,
                     CASE WHEN doc_id % 4 = 0 THEN 640 ELSE -1 END
                         AS width
              FROM b
              UNION ALL
              SELECT doc_id, base || '-small.jpg', 320 FROM b
              UNION ALL
              SELECT doc_id, base || '-big.jpg', 1280 FROM b
              UNION ALL
              SELECT doc_id, base || '-hd.jpg', -1 FROM b
            )
            SELECT doc_id, img_url, CAST(width AS BIGINT) AS width
            FROM rows_
        """,
        "jsonld": """
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'Article'
                        WHEN 1 THEN 'Product' ELSE 'FAQPage' END AS ld_type,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END
                        AS BIGINT) AS n_keys,
                   CAST(doc_id % 7 AS BIGINT) AS position
            FROM documents
            WHERE doc_id % 11 != 0 AND doc_id % 13 != 0
        """,
        "fair_share": """
            WITH d AS (SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
                              CAST(count(*) AS BIGINT) AS dem
                       FROM documents GROUP BY 1),
            -- water level via per-segment candidates: every candidate
            -- least(v, (B - below)//above) is feasible and the optimum
            -- is its own segment's candidate, so max() solves it
            dd AS (SELECT dem AS v, CAST(count(*) AS BIGINT) AS c
                   FROM d GROUP BY dem),
            w AS (SELECT v, c,
                     CAST(coalesce(sum(v * c) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS below,
                     CAST((SELECT count(*) FROM d)
                        - coalesce(sum(c) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS above
                  FROM dd),
            lv AS (SELECT CASE WHEN (SELECT sum(dem) FROM d) <= 300
                        THEN (SELECT max(dem) FROM d)
                        ELSE (SELECT max(least(v, (300 - below) // above))
                              FROM w) END AS level),
            lo AS (SELECT level,
                          CASE WHEN (SELECT sum(dem) FROM d) <= 300
                               THEN 0
                               ELSE 300 - (SELECT sum(least(dem, level))
                                           FROM d) END AS leftover
                   FROM lv),
            rk AS (SELECT host, dem, level, leftover,
                          CASE WHEN dem > level THEN
                              row_number() OVER (PARTITION BY dem > level
                                                 ORDER BY host)
                          ELSE NULL END AS rn
                   FROM d, lo)
            SELECT host, dem AS demand,
                   CAST(least(dem, level)
                        + CASE WHEN dem > level AND rn <= leftover
                               THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM rk
        """,
        "fuzzy_join": """
            WITH ti AS (SELECT DISTINCT source || '-t' ||
                            CAST(doc_id % 40 AS VARCHAR) AS title
                        FROM documents)
            SELECT a.title AS title_a, b.title AS title_b
            FROM ti a JOIN ti b ON a.title < b.title
            WHERE levenshtein(a.title, b.title) = 1
        """,
        "event_bigrams": """
            WITH o AS (SELECT user_id, event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT prev AS e_from, event_type AS e_to,
                   CAST(count(*) AS BIGINT) AS n
            FROM o WHERE prev IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "ivm": """
            WITH fin AS (
              SELECT lang, n_chars FROM documents
              WHERE doc_id % 10 = 0
                 OR (doc_id % 10 != 0 AND doc_id % 7 != 0)
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS sum_value
            FROM fin GROUP BY lang ORDER BY lang
        """,
        "cohort_retention": """
            WITH ud AS (SELECT DISTINCT user_id,
                            CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                                AS day
                        FROM events),
            c AS (SELECT user_id, min(day) AS cohort
                  FROM ud GROUP BY user_id)
            SELECT c.cohort AS cohort_day,
                   ud.day - c.cohort AS offset_day,
                   CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users
            FROM ud JOIN c ON c.user_id = ud.user_id
            GROUP BY 1, 2
        """,
        # window cumsum vs the distributed segmented prefix scan
        "rollover": """
            WITH w AS (SELECT doc_id, n_chars,
                CAST(sum(n_chars) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              FROM documents)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_bytes,
                   cum AS cum_bytes,
                   CAST((cum - n_chars) // 8000 AS BIGINT) AS index_gen
            FROM w
        """,
        # same Knuth multiplicative IP derivation; ES dotted bucket keys
        "ip_prefix": """
            WITH ip AS (SELECT (doc_id * 2654435761) % 4294967296 AS a
                        FROM documents),
            b AS (SELECT a // 65536 AS pfx, a // 256 AS s24 FROM ip),
            agg AS (SELECT pfx, CAST(count(*) AS BIGINT) AS n_docs,
                           CAST(count(DISTINCT s24) AS BIGINT) AS n_subnets
                    FROM b GROUP BY pfx)
            SELECT CAST((pfx * 65536) // 16777216 % 256 AS VARCHAR) || '.'
                   || CAST((pfx * 65536) // 65536 % 256 AS VARCHAR)
                   || '.0.0/16' AS prefix,
                   n_docs, n_subnets
            FROM agg ORDER BY pfx
        """,
        # real FULL OUTER JOIN + aggregate vs the union+groupby device
        "outer_join": """
            WITH c AS (SELECT c_custkey AS custkey FROM customer
                       WHERE c_custkey % 3 != 0),
            o AS (SELECT o_custkey AS custkey,
                         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             AS cents
                  FROM orders WHERE o_custkey % 5 != 0),
            oa AS (SELECT custkey, CAST(count(*) AS BIGINT) AS n_right,
                          CAST(sum(cents) AS BIGINT) AS sum_value
                   FROM o GROUP BY custkey)
            SELECT coalesce(c.custkey, oa.custkey) AS custkey,
                   CAST(c.custkey IS NOT NULL AS BIGINT) AS left_present,
                   coalesce(oa.n_right, 0) AS n_right,
                   coalesce(oa.sum_value, 0) AS sum_value
            FROM c FULL OUTER JOIN oa ON oa.custkey = c.custkey
        """,
        # window-function replay of the ES shard protocol: per-shard
        # top-5, last returned count, coordinator merge + error bounds
        "terms_shards": r"""
            WITH tok AS (
              SELECT doc_id % 4 AS shard,
                     unnest(list_distinct(regexp_extract_all(text,
                         '[^\t\n\x0b\x0c\r ]+'))) AS term
              FROM documents),
            cnts AS (SELECT shard, term, CAST(count(*) AS BIGINT) AS cnt
                     FROM tok GROUP BY shard, term),
            rk AS (SELECT *, row_number() OVER (PARTITION BY shard
                       ORDER BY cnt DESC, term) AS r FROM cnts),
            kept AS (SELECT * FROM rk WHERE r <= 5),
            lastc AS (SELECT shard, min(cnt) AS last_cnt
                      FROM kept GROUP BY shard),
            merged AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS doc_count
                       FROM kept GROUP BY term),
            err AS (SELECT m.term, m.doc_count,
                      CAST(coalesce((SELECT sum(l.last_cnt) FROM lastc l
                        WHERE NOT EXISTS (SELECT 1 FROM kept k
                          WHERE k.shard = l.shard AND k.term = m.term)), 0)
                        AS BIGINT) AS doc_count_error
                    FROM merged m),
            top AS (SELECT *, CAST(row_number() OVER (
                        ORDER BY doc_count DESC, term) AS BIGINT) AS rank
                    FROM err)
            SELECT term, doc_count, doc_count_error, rank
            FROM top WHERE rank <= 10
        """,
        # ladder decision replayed from min/max epoch micros; // is
        # integer floor division on BIGINT
        "auto_histogram": """
            WITH e AS (SELECT epoch_us(ts) AS us FROM events),
            mm AS (SELECT min(us) AS mn, max(us) AS mx FROM e),
            iv AS (SELECT CAST(CASE
                WHEN (mx // 60000000) - (mn // 60000000) + 1 <= 50
                    THEN 60
                WHEN (mx // 3600000000) - (mn // 3600000000) + 1 <= 50
                    THEN 3600
                WHEN (mx // 86400000000) - (mn // 86400000000) + 1 <= 50
                    THEN 86400
                ELSE 2592000 END AS BIGINT) AS interval_s FROM mm)
            SELECT CAST((us // (interval_s * 1000000)) * interval_s
                        AS BIGINT) AS bucket_s,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(interval_s AS BIGINT) AS interval_s
            FROM e, iv GROUP BY 1, 3 ORDER BY 1
        """,
        # sentinel-insert + split (RE2 has no lookbehind on either side);
        # zip-unnest gives the 1-based index
        "sentences": r"""
            WITH p AS (
              SELECT doc_id,
                     string_split(
                       regexp_replace(
                         regexp_replace(text, '(slow|fast)', '\1.', 'g'),
                         '([.!?])[\t\n\x0b\x0c\r ]+', '\1' || chr(1), 'g'),
                       chr(1)) AS s
              FROM documents
            ), u AS (
              SELECT doc_id,
                     CAST(unnest(generate_series(1, len(s))) AS BIGINT)
                         AS sent_idx,
                     unnest(s) AS sentence
              FROM p
            )
            SELECT doc_id, sent_idx, sentence,
                   CAST(length(sentence) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(sentence,
                        '[^\t\n\x0b\x0c\r ]+')) AS BIGINT) AS n_tokens
            FROM u
        """,
        # asciifolding+lowercase analyzer: strip_accents(lower()) ==
        # NFKD-strip-marks(lower()) for the fixture's accent set
        # (probe-verified: ø/ß pass through identically on both)
        "fold_accents": """
            WITH f AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN 'Ée ' || replace(text, 'a', 'ä')
                          ELSE 'THE ' || text END AS t
              FROM documents
            )
            SELECT doc_id, strip_accents(lower(t)) AS folded,
                   CAST(strip_accents(lower(t)) != t AS BIGINT) AS changed
            FROM f
        """,
        # match_phrase_prefix: phrase oracle with the final position
        # prefix-matched (starts_with)
        "phrase_prefix": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), hits AS (
              SELECT doc_id,
                     list_min(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'the'
                                 AND starts_with(tk[i+1], 's')
                            THEN i ELSE NULL END)) AS fp,
                     CAST(coalesce(list_sum(list_transform(range(1, len(tk)), i ->
                       CASE WHEN tk[i] = 'the'
                                 AND starts_with(tk[i+1], 's')
                            THEN 1 ELSE 0 END)), 0) AS BIGINT) AS phrase_count
              FROM toks
            )
            SELECT doc_id, CAST(fp AS BIGINT) AS first_pos, phrase_count
            FROM hits WHERE phrase_count > 0
        """,
        # ES boosting: positive tf x1000, negative presence demotes by
        # floor(x*300/1000); demotion not exclusion
        "boosting": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^\t\n\x0b\x0c\r ]+') AS tk
              FROM documents
            ), f AS (
              SELECT doc_id,
                     CAST(len(list_filter(tk, x -> x = 'merge'))
                        + len(list_filter(tk, x -> x = 'batch'))
                        AS BIGINT) AS pos_tf,
                     CAST(len(list_filter(tk, x -> x = 'slow')) > 0
                        AS BIGINT) AS demoted
              FROM toks
            ), s AS (
              SELECT doc_id, pos_tf, demoted,
                     CASE WHEN demoted = 1
                          THEN CAST((1000 * pos_tf * 300) // 1000 AS BIGINT)
                          ELSE CAST(1000 * pos_tf AS BIGINT)
                     END AS score_milli
              FROM f WHERE pos_tf > 0
            ), r AS (
              SELECT *, CAST(row_number() OVER (
                            ORDER BY score_milli DESC, doc_id)
                        AS BIGINT) AS rank
              FROM s
            )
            SELECT doc_id, pos_tf, demoted, score_milli, rank
            FROM r WHERE rank <= 50
        """,
        # bounded recursive-CTE reachability: same edge derivation as
        # graph_components, directed, min(hop) per node within 6 hops
        "bfs_hops": """
            WITH RECURSIVE m AS (SELECT doc_id, source,
                    CAST(row_number() OVER (
                        PARTITION BY source ORDER BY doc_id) - 1
                        AS BIGINT) AS pos,
                    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
                FROM documents),
            offs(d) AS (VALUES (1), (2), (3)),
            ring AS (SELECT a.doc_id AS src, b.doc_id AS dst
                     FROM m a JOIN m b ON a.source = b.source
                     CROSS JOIN offs
                     WHERE b.pos = (a.pos + offs.d) % a.n
                       AND b.doc_id != a.doc_id),
            ord AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) - 1
                                   AS BIGINT) AS idx FROM documents),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
            crosse AS (SELECT a.doc_id AS src, b.doc_id AS dst
                       FROM documents a CROSS JOIN nn
                       JOIN ord b ON b.idx = (a.doc_id * 7 + 3) % nn.c
                       WHERE b.doc_id != a.doc_id),
            edges AS (SELECT DISTINCT src, dst
                      FROM (SELECT * FROM ring UNION ALL SELECT * FROM crosse)
                      WHERE (src + dst) % 3 != 0),
            seeds AS (SELECT doc_id AS node FROM documents
                      WHERE doc_id % 97 = 0),
            hops(node, hop) AS (
              SELECT node, CAST(0 AS BIGINT) FROM seeds
              UNION
              SELECT e.dst, h.hop + 1
              FROM hops h JOIN edges e ON e.src = h.node
              WHERE h.hop < 6
            )
            SELECT node, CAST(min(hop) AS BIGINT) AS hop
            FROM hops GROUP BY node
        """,
        # ES boxplot + median_absolute_deviation: percentile_disc IS the
        # engine's discrete rule sorted[floor(q*(n-1))]; MAD = disc-median
        # of |v - median|
        "dispersion": """
            WITH q AS (SELECT l_returnflag,
                              CAST(l_quantity AS BIGINT) AS v
                       FROM lineitem),
            med AS (SELECT l_returnflag,
                           percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                               AS m
                    FROM q GROUP BY l_returnflag),
            base AS (SELECT l_returnflag,
                            CAST(count(*) AS BIGINT) AS n,
                            min(v) AS min_v, max(v) AS max_v,
                            percentile_disc(0.25) WITHIN GROUP (ORDER BY v)
                                AS q1,
                            percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                                AS median,
                            percentile_disc(0.75) WITHIN GROUP (ORDER BY v)
                                AS q3
                     FROM q GROUP BY l_returnflag),
            madt AS (SELECT q.l_returnflag,
                            percentile_disc(0.5)
                                WITHIN GROUP (ORDER BY abs(q.v - med.m))
                                AS mad
                     FROM q JOIN med ON med.l_returnflag = q.l_returnflag
                     GROUP BY q.l_returnflag)
            SELECT b.l_returnflag, b.n, b.min_v, b.max_v,
                   b.q1, b.median, b.q3, b.q3 - b.q1 AS iqr, madt.mad
            FROM base b JOIN madt ON madt.l_returnflag = b.l_returnflag
            ORDER BY b.l_returnflag
        """,
    }
