"""Per-page extraction: the reference's ProcessRecord re-expressed for Ray Data.

``extract_page`` is the single-threaded oracle (one page -> meta/data fields
or a skip reason), mirroring ProcessRecord.process + create_payload
(/root/reference/warc_indexer/indexer/process.py:131-306).  ``ExtractPages``
wraps it as a map_batches callable class (actor pool) whose ``__init__`` does
the once-per-actor work: loading the broadcast rank-lookup table (the
reference's Redis join, process.py:178-180) and pinning config.

Error policy (process.py:182-196 analog): a row never fails the task; any
exception nulls the payload columns and sets ``skip_reason='parse_error'``.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, List, Optional
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

from engine import html_extract as hx
from engine import lang as langmod
from engine.ids import clip_warc_date, index_uuid, webis_uuid


def extract_page(
    url: str,
    html_bytes: Optional[bytes],
    *,
    trust_content_type: bool = False,
    max_content_length: int = hx.MAX_DOCUMENT_SIZE,
) -> Dict[str, Any]:
    """Oracle extraction of one page.  Returns payload fields + skip_reason.

    Skip-rule order follows the reference: size gates
    (process.py:170-174), MIME sniff (:247-250), no-body (:257-258), empty
    full text (:260-262), replacement-char ratio (:264-268), main-content
    length (:272-275).  The reference's HTTP-header content-type whitelist
    (:166-168) has no analog for a Parquet pages source and collapses into
    the MIME sniff (documented deviation, SURVEY.md §2.2 M2).
    """
    out: Dict[str, Any] = {
        "skip_reason": None,
        "content_length": len(html_bytes) if html_bytes is not None else 0,
        "content_encoding": None,
        "http_content_type": None,
        "title": None,
        "meta_keywords": None,
        "meta_desc": None,
        "body": None,
        "full_body": None,
        "headings": None,
        "lang": None,
        "body_length": None,
    }

    def skip(reason: str) -> Dict[str, Any]:
        out["skip_reason"] = reason
        return out

    try:
        if html_bytes is None:
            return skip("parse_error")
        n = len(html_bytes)
        if n > max_content_length:
            return skip("too_big")
        if n < hx.MIN_DOCUMENT_SIZE:
            return skip("too_short")

        mime = hx.detect_mime(html_bytes)
        out["http_content_type"] = mime
        if not trust_content_type and mime not in hx.TEXT_MIME_TYPES:
            return skip("not_text")

        encoding = hx.declared_charset(html_bytes) or hx.detect_encoding(html_bytes)
        out["content_encoding"] = encoding
        content_str = hx.bytes_to_str(html_bytes, encoding)

        tree = hx.HTMLTree.parse(content_str)
        if tree.body is None:
            return skip("no_body")

        content_full = hx.extract_plain_text(
            tree, alt_texts=True, preserve_formatting=False
        )
        if not content_full:
            return skip("empty")

        repl = content_full.count("�")
        if repl / len(content_full) > hx.MAX_REPLACEMENT_RATIO:
            return skip("replacement_chars")
        if repl > 0:
            content_full = hx.MULTI_SPACE_REGEX.sub(
                " ", content_full.replace("�", "")
            ).strip()

        lang, _score = langmod.detect_fast(content_full)

        # NB: main content is gated and stored RAW — the reference never
        # strips replacement chars from it (only from content_full,
        # process.py:264-268 vs :272-275).
        main_content = hx.extract_plain_text(
            tree,
            main_content=True,
            alt_texts=True,
            preserve_formatting=True,
            list_bullets=False,
        )
        if len(main_content) < hx.MIN_MAIN_CONTENT:
            return skip("main_too_short")

        out.update(
            {
                # title is NOT truncated — the reference truncates only
                # meta_keywords/meta_desc (process.py:291-298)
                "title": hx.get_document_title(tree) or None,
                "meta_keywords": hx.get_document_meta_keywords(tree) or None,
                "meta_desc": hx.get_document_meta_desc(tree)[:8192] or None,
                "body": main_content,
                "full_body": content_full,
                "headings": hx.get_document_headings(tree, 3) or None,
                "lang": lang,
                "body_length": len(content_str),
            }
        )
        return out
    except Exception:
        return skip("parse_error")


class ExtractPages:
    """Actor-pool map_batches stage: pages batch -> meta+data columns.

    One output row per input row; ``skip_reason`` is null for kept docs.
    Pipelines split the stream into the meta/data tables with filtered
    writes (the reference's beam.Partition, process.py:91-92).

    ``lookup_ref`` is a ``ray.put`` handle to a ``{doc_uuid: (spam_rank,
    page_rank)}`` dict — fetched ONCE per actor here, not per batch
    (broadcast join replacing Redis, SURVEY.md §2.5 J1).
    """

    def __init__(
        self,
        doc_id_prefix: str = "cc",
        source_file: str = "pages.parquet",
        always_index_meta: bool = False,
        trust_content_type: bool = False,
        max_content_length: int = hx.MAX_DOCUMENT_SIZE,
        lookup_ref: Any = None,
    ):
        self.prefix = doc_id_prefix
        self.source_file = source_file
        self.always_index_meta = always_index_meta
        self.trust_content_type = trust_content_type
        self.max_content_length = max_content_length
        self.lookup: Dict[str, tuple] = {}
        if lookup_ref is not None:
            import ray

            self.lookup = ray.get(lookup_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        ts = batch.column("warc_ts").cast(pa.timestamp("us")).to_pylist()
        src_files = (
            batch.column("source_file").to_pylist()
            if "source_file" in batch.column_names
            else [self.source_file] * len(urls)
        )
        offsets = (
            batch.column("source_offset").to_pylist()
            if "source_offset" in batch.column_names
            else [0] * len(urls)
        )

        rows: List[Dict[str, Any]] = []
        for url, html, t, sf, off in zip(urls, htmls, ts, src_files, offsets):
            doc_id = webis_uuid(self.prefix, url)
            t = t or _dt.datetime(1970, 1, 1)
            warc_date = clip_warc_date(t.isoformat())
            unix_ms = int(t.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
            idx_id = index_uuid(unix_ms, off or 0, sf, doc_id)

            r = extract_page(
                url,
                html,
                trust_content_type=self.trust_content_type,
                max_content_length=self.max_content_length,
            )
            try:
                parts = urlsplit(url)
                hostname, path, query = parts.hostname, parts.path, parts.query
            except ValueError:
                hostname = path = query = None
            ranks = self.lookup.get(doc_id, (None, None))
            r.update(
                {
                    "uuid": doc_id,
                    "idx_id": idx_id,
                    "source_file": sf,
                    "source_offset": off or 0,
                    "warc_date": warc_date,
                    "date": warc_date,
                    "warc_target_uri": url,
                    "warc_target_hostname": hostname,
                    "warc_target_path": path,
                    "warc_target_query_string": query,
                    "content_type": r["http_content_type"],
                    "spam_rank": ranks[0],
                    "page_rank": ranks[1],
                }
            )
            rows.append(r)

        return _rows_to_table(rows)


_TASK_EXTRACTORS: Dict[tuple, "ExtractPages"] = {}


def extract_pages_task(batch: pa.Table, **kwargs) -> pa.Table:
    """Task-function variant of ExtractPages for short per-wave executions.

    Per the repo rule (CLAUDE.md / PERF.md): a map_batches stage that runs
    once per crawl wave must be a task FUNCTION, not an actor class — actor
    pool spin-up dominates short executions, and Ray task workers persist
    across waves so the per-process extractor cache below gives the same
    once-per-process setup an actor ``__init__`` would.

    ``kwargs`` are ExtractPages constructor args (hashable; lookup_ref is
    an ObjectRef, which hashes fine).
    """
    key = tuple(sorted(kwargs.items()))
    ex = _TASK_EXTRACTORS.get(key)
    if ex is None:
        # Only one kwargs config is live at a time, but keys can embed
        # per-run ObjectRefs (lookup_ref) — an unbounded dict would leak
        # one extractor per pipeline invocation in a long-lived session
        # (ADVICE r2).  Keep a tiny LRU: evict the oldest beyond 4.
        while len(_TASK_EXTRACTORS) >= 4:
            _TASK_EXTRACTORS.pop(next(iter(_TASK_EXTRACTORS)))
        ex = _TASK_EXTRACTORS[key] = ExtractPages(**kwargs)
    else:
        _TASK_EXTRACTORS[key] = _TASK_EXTRACTORS.pop(key)  # LRU touch
    return ex(batch)


_OUT_SCHEMA = pa.schema(
    [
        ("uuid", pa.string()),
        ("idx_id", pa.string()),
        ("source_file", pa.string()),
        ("source_offset", pa.int64()),
        ("warc_date", pa.string()),
        ("date", pa.string()),
        ("warc_target_uri", pa.string()),
        ("warc_target_hostname", pa.string()),
        ("warc_target_path", pa.string()),
        ("warc_target_query_string", pa.string()),
        ("content_type", pa.string()),
        ("content_length", pa.int64()),
        ("content_encoding", pa.string()),
        ("http_content_type", pa.string()),
        ("title", pa.string()),
        ("meta_keywords", pa.list_(pa.string())),
        ("meta_desc", pa.string()),
        ("body", pa.string()),
        ("full_body", pa.string()),
        ("headings", pa.list_(pa.string())),
        ("lang", pa.string()),
        ("body_length", pa.int64()),
        ("spam_rank", pa.int64()),
        ("page_rank", pa.float64()),
        ("skip_reason", pa.string()),
    ]
)


def _rows_to_table(rows: List[Dict[str, Any]]) -> pa.Table:
    cols = {
        f.name: pa.array([r.get(f.name) for r in rows], type=f.type)
        for f in _OUT_SCHEMA
    }
    # Sort each output block by idx_id — the reference sorts its sink buffer
    # by _id before bulk-indexing for shard-routing locality (es_sink.py:155);
    # here it gives time-clustered row groups (idx_id is time-sortable).
    return pa.table(cols, schema=_OUT_SCHEMA).sort_by("idx_id")
