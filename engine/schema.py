"""Fixed Arrow schemas for every table the engine reads or writes.

The reference's outputs are schemaless Elasticsearch action dicts with
dynamically-named per-language fields (``*_lang_xx``,
/root/reference/warc_indexer/indexer/process.py:291-298); Arrow favors fixed
schemas, so the language suffix becomes a plain ``lang`` column and the
per-language fields become fixed columns (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

# Input pages table (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # oracle-extracted main content; null if skipped
        ("lang", pa.string()),  # oracle-detected language; null if skipped
    ]
)

# Meta table: one row per parseable input record (reference meta_index.py:1-53,
# built at process.py:198-235). WARC envelope fields collapse for a Parquet
# pages source; source_file/source_offset keep lineage.
META = pa.schema(
    [
        ("uuid", pa.string()),           # webis_uuid(prefix, url)
        ("idx_id", pa.string()),         # index_uuid (time-sortable)
        ("source_file", pa.string()),
        ("source_offset", pa.int64()),
        ("warc_date", pa.string()),      # clipped ISO-8601
        ("warc_target_uri", pa.string()),
        ("content_length", pa.int64()),
        ("content_encoding", pa.string()),
        ("http_content_type", pa.string()),  # sniffed MIME
    ]
)

# Data table: one row per kept (extracted) document (reference
# conf/data_index.py + process.py:237-306).
DATA = pa.schema(
    [
        ("uuid", pa.string()),
        ("idx_id", pa.string()),
        ("date", pa.string()),
        ("lang", pa.string()),
        ("body_length", pa.int64()),
        ("warc_target_uri", pa.string()),
        ("warc_target_hostname", pa.string()),
        ("warc_target_path", pa.string()),
        ("warc_target_query_string", pa.string()),
        ("content_type", pa.string()),
        ("title", pa.string()),
        ("meta_keywords", pa.list_(pa.string())),
        ("meta_desc", pa.string()),
        ("body", pa.string()),        # main content (preserve_formatting)
        ("full_body", pa.string()),   # full text (collapsed)
        ("headings", pa.list_(pa.string())),
        ("spam_rank", pa.int64()),    # left-join lookup (nullable)
        ("page_rank", pa.float64()),  # left-join lookup (nullable)
    ]
)

# Frontier table (new, per BASELINE.json north_rule).  Matches what the
# crawl actually checkpoints (engine/pipelines/crawl.py _FRONTIER_SCHEMA);
# url_hash/surt are derivable from url via engine.canonicalize and are not
# persisted per frontier row.
FRONTIER = pa.schema(
    [
        ("url", pa.string()),          # canonical URL
        ("host", pa.string()),
        ("depth", pa.int64()),
        ("priority", pa.float64()),
    ]
)

# Crawl-order log (conformance artifact; golden/crawl_order.parquet).
CRAWL_ORDER = pa.schema(
    [
        ("wave", pa.int64()),
        ("seq", pa.int64()),
        ("url", pa.string()),
        ("host", pa.string()),
    ]
)

# Per-partition checkpoint manifest (SURVEY.md §4 resume design).
MANIFEST = pa.schema(
    [
        ("partition_id", pa.string()),
        ("input_fingerprint", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("skip_counts", pa.string()),   # JSON {reason: count}
        ("wall_ms", pa.int64()),
    ]
)

# Lookup table replacing the reference's Redis hash (process.py:477-505).
LOOKUPS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spam_rank", pa.int64()),
        ("page_rank", pa.float64()),
    ]
)

# ---------------------------------------------------------------------------
# Index contract (reference conf/data_index.py).
#
# The reference's data index declares 26 per-language analyzers plus dynamic
# ``*_lang_xx`` field templates (conf/data_index.py:68-377) and excludes
# ``warc_target_query_string`` / ``full_body_*`` / ``headings_*`` from
# ``_source`` (conf/data_index.py:2-9) — stored for search, not returned on
# read.  The Arrow analog (SURVEY.md §1.3) collapses the dynamic per-language
# fields into fixed columns + a ``lang`` column; the two contract facts that
# would otherwise be lost are recorded here and emitted into the
# ``index-setup`` artifact (_schema.json):
#
# - REFERENCE_ANALYZER_LANGS: the language set the reference's index mapping
#   provisions analyzers for (what a consumer may see in ``lang`` when fed
#   by a full-fidelity language model).
# - SUPPORTED_LANGS: what THIS engine's built-in fast detector can emit
#   today (engine/lang.py LANGS; detect_fast always returns one of these).
# - SOURCE_EXCLUDED_COLUMNS: the ``_source``-exclusion analog — columns a
#   default reader should leave out of ``read_parquet(columns=...)`` unless
#   explicitly requested (they are the large search-only payloads).
REFERENCE_ANALYZER_LANGS = (
    "ar", "bg", "ca", "cs", "da", "de", "el", "en", "es", "fa", "fi", "fr",
    "hu", "it", "ja", "ko", "lt", "nl", "no", "pl", "pt", "ro", "ru", "sv",
    "th", "tr", "zh", "unknown",
)
SOURCE_EXCLUDED_COLUMNS = ("warc_target_query_string", "full_body", "headings")


def index_contract() -> dict:
    """The machine-readable index contract for the index-setup artifact."""
    from engine.lang import LANGS as _SUPPORTED

    return {
        "reference_analyzer_langs": list(REFERENCE_ANALYZER_LANGS),
        "supported_langs": list(_SUPPORTED),
        "source_excluded_columns": list(SOURCE_EXCLUDED_COLUMNS),
        "data_default_read_columns": [
            f.name for f in DATA if f.name not in SOURCE_EXCLUDED_COLUMNS
        ],
    }


SKIP_REASONS = [
    "not_http_response",   # process.py:152-156 (non-application/http record)
    "wrong_content_type",  # process.py:166-168
    "too_big",             # process.py:170-171
    "too_short",           # process.py:173-174
    "not_text",            # process.py:247-250 (MIME sniff)
    "no_body",             # process.py:257-258
    "empty",               # process.py:260-262
    "replacement_chars",   # process.py:264-266
    "main_too_short",      # process.py:272-275
    "parse_error",         # blanket per-row error policy (process.py:182-187)
]
