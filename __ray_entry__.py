"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 plus the training-data operator suite (dedup, ANN, text
analysis, multimodal plumbing, crawl frontier).  ``oracle_sql()`` provides
DuckDB-equivalent SQL for every SQL-expressible query with IDENTICAL column
names; non-SQL-expressible ops (uuid5 ids, HTML extraction, MinHash/SimHash,
ANN, crawl) are rows-only by design.

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
    extraction pipeline, return the kept-document rows."""
    _ctx()
    from engine.pipelines.queries import q_extract_pages

    return q_extract_pages("/root/testdata/sf0.001")


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
        "topk_orders": q.q_topk_orders,
        "pricing_summary": q.q_pricing_summary,
        "surt_hosts": q.q_surt_hosts,
        "distinct_users": q.q_distinct_users,
        "sessions": q.q_sessions,
        "hash_join": q.q_hash_join,
        "asof_join": q.q_asof_join,
        "range_join": q.q_range_join,
        "quantiles": q.q_quantiles,
        # rows-only (non-SQL-expressible)
        "webis_ids": q.q_webis_ids,
        "lang_id": q.q_lang_id,
        "quality": q.q_quality,
        "fingerprint": q.q_fingerprint,
        "bpe_tokens": q.q_bpe_tokens,
        "minhash_dedup": q.q_minhash_dedup,
        "ngram_dedup": q.q_ngram_dedup,
        "simhash": q.q_simhash,
        "embedding_dedup": q.q_embedding_dedup,
        "ann_topk": q.q_ann_topk,
        "ann_ivf": q.q_ann_ivf,
        "extract_pages": q.q_extract_pages,
        "media_features": q.q_media_features,
        "crawl_order": q.q_crawl_order,
        "dedup_clusters": q.q_dedup_clusters,
        "approx_users": q.q_approx_users,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            SELECT md5(text) AS h, min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY md5(text)
        """,
        # tokenizer class matches engine.stages.text._TOKEN exactly
        # (explicit ASCII whitespace — Python \S and RE2 \S disagree on
        # Unicode spaces)
        "token_stats": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(regexp_extract_all(text, '[^\t\n\v\f\r ]+')) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(
                       regexp_extract_all(text, '[^\t\n\v\f\r ]+'),
                       x -> length(x))), 0) AS BIGINT) AS tok_chars
            FROM documents
        """,
        "doc_filter": r"""
            SELECT doc_id, lang, n_chars,
                   length(regexp_extract_all(text, '[^\t\n\v\f\r ]+')) AS n_tokens
            FROM documents
            WHERE n_chars >= 200
              AND length(regexp_extract_all(text, '[^\t\n\v\f\r ]+')) >= 40
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
        "quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99,
                   count(*) AS n_rows
            FROM events GROUP BY event_type
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
    }
