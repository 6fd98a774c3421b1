"""Anchor-text aggregation — describe a TARGET page by the text of the
links pointing at it.

The classic web-search enrichment (Brin & Page 1998 §2.2; anchor text is
indexed against the linked-to document because it is often a better
description than the page's own content — the reference's Elasticsearch
index is exactly the kind of consumer).  Output: the top-k anchor terms
per target URL with their in-link term counts.

Scale shape:
1. One parse pass over the pages (the same HTMLTree + canonicalization
   stack the crawl uses): per batch, every ``<a href>`` occurrence is
   tokenized and pre-aggregated into a Counter, so the shuffle carries
   (target_url, token, cnt) partial rows — never html, never text.
   Relative hrefs resolve against the page URL; non-canonicalizable
   targets drop (same policy as crawl link discovery).
2. ONE groupby (target_url, token) Sum merges the partials.
3. ``topk.grouped_topk`` ranks terms per target — per-block candidates,
   <= k x targets x blocks candidate rows, no all-to-all sort.

Self-links (a page linking to itself) count like any in-link; pages with
no in-links simply have no rows (anchor text is evidence from elsewhere,
absence of evidence is the correct output).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from engine.canonicalize import canonicalize_url
from engine.stages.text import _TOKEN


def _anchor_partials(t: pa.Table) -> pa.Table:
    from urllib.parse import urljoin

    from engine.html_extract import (
        HTMLTree,
        bytes_to_str,
        declared_charset,
        detect_encoding,
        get_anchors,
    )

    c: Counter = Counter()
    for page_url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        if not html:
            continue
        try:
            enc = declared_charset(html) or detect_encoding(html)
            tree = HTMLTree.parse(bytes_to_str(html, enc))
        except Exception:
            continue
        for href, text in get_anchors(tree):
            try:
                absu = urljoin(page_url, href)
            except ValueError:
                continue
            target = canonicalize_url(absu)
            if target is None:
                continue
            for tok in _TOKEN.findall(text):
                c[(target, tok)] += 1
    items = list(c.items())
    return pa.table(
        {
            "url": pa.array([u for (u, _), _ in items], pa.string()),
            "token": pa.array([tok for (_, tok), _ in items], pa.string()),
            "cnt": pa.array([n for _, n in items], pa.int64()),
        }
    )


def anchor_terms(pages: ray.data.Dataset, *, k: int = 5) -> ray.data.Dataset:
    """Top-k anchor terms per target URL: ``(url, token, anchor_count,
    term_rank)``; ranking order (count desc, token asc) — a total order,
    so the result is partitioning-independent."""
    from engine.stages.topk import grouped_topk

    counts = (
        pages.map_batches(
            _anchor_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["url", "token"])
        .aggregate(Sum("cnt", alias_name="anchor_count"))
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t.column("url"),
                    "token": t.column("token"),
                    "anchor_count": t.column("anchor_count").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return grouped_topk(
        counts,
        group_col="url",
        order_cols=["anchor_count", "token"],
        descending=[True, False],
        k=k,
        rank_col="term_rank",
    )
