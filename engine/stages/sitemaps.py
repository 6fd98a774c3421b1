"""Sitemap parsing → seed/frontier URL rows (sitemaps.org protocol).

Completes the discovery leg of the crawl north star: robots.py yields the
politeness rules, this module yields the publisher-declared URL inventory
(the highest-quality seed source a crawler has).  One stateless
``flat``-shaped ``map_batches`` over a (host, sitemap_xml) corpus — each
sitemap expands to its <url> entries; <sitemapindex> children are emitted
as rows with ``from_index=1`` so the caller can loop fetches until no
index rows remain (the standard two-level sitemap walk).

Parsing is a regex subset of the protocol (RE-based, like the engine's
HTML link discovery): <url>/<sitemap> blocks, <loc>, <lastmod>,
<priority>; XML entities unescaped (&amp; in query strings is the norm);
CDATA sections unwrapped LITERALLY (entity processing is suppressed
inside CDATA per XML); whitespace inside tags trimmed.  ``priority``
is emitted as floor-ppm int64 (-1 when absent) — fixed-point, SQL-exact.
"""

from __future__ import annotations

import re
from html import unescape
from typing import List

import pyarrow as pa
import ray.data

_URL_BLOCK = re.compile(r"<url\s*>(.*?)</url\s*>", re.DOTALL | re.IGNORECASE)
_SM_BLOCK = re.compile(r"<sitemap\s*>(.*?)</sitemap\s*>", re.DOTALL | re.IGNORECASE)
_LOC = re.compile(r"<loc\s*>(.*?)</loc\s*>", re.DOTALL | re.IGNORECASE)
_LASTMOD = re.compile(r"<lastmod\s*>(.*?)</lastmod\s*>", re.DOTALL | re.IGNORECASE)
_PRIORITY = re.compile(r"<priority\s*>(.*?)</priority\s*>", re.DOTALL | re.IGNORECASE)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)


def _text(block: str, pat: re.Pattern) -> str:
    m = pat.search(block)
    if not m:
        return ""
    v = m.group(1)
    cm = _CDATA.search(v)
    if cm:
        # CDATA suppresses entity processing: the content is LITERAL
        return cm.group(1).strip()
    return unescape(v.strip())


def parse_sitemap(xml: str) -> List[dict]:
    """Rows: {url, lastmod, priority_ppm, from_index} — see module doc."""
    out: List[dict] = []
    for block in _URL_BLOCK.findall(xml or ""):
        loc = _text(block, _LOC)
        if not loc:
            continue
        pr = _text(block, _PRIORITY)
        try:
            ppm = int(float(pr) * 1_000_000) if pr else -1
        except ValueError:
            ppm = -1
        out.append(
            {
                "url": loc,
                "lastmod": _text(block, _LASTMOD),
                "priority_ppm": ppm,
                "from_index": 0,
            }
        )
    for block in _SM_BLOCK.findall(xml or ""):
        loc = _text(block, _LOC)
        if loc:
            out.append(
                {"url": loc, "lastmod": _text(block, _LASTMOD), "priority_ppm": -1, "from_index": 1}
            )
    return out


def sitemap_urls(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    body_col: str = "sitemap_xml",
) -> "ray.data.Dataset":
    """(host, url, lastmod, priority_ppm, from_index) per sitemap entry."""

    def expand(t: pa.Table) -> pa.Table:
        hosts, urls, mods, ppms, idx = [], [], [], [], []
        for h, xml in zip(
            t.column(host_col).to_pylist(), t.column(body_col).to_pylist()
        ):
            for row in parse_sitemap(xml or ""):
                hosts.append(h)
                urls.append(row["url"])
                mods.append(row["lastmod"])
                ppms.append(row["priority_ppm"])
                idx.append(row["from_index"])
        return pa.table(
            {
                host_col: pa.array(hosts, pa.string()),
                "url": pa.array(urls, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
                "priority_ppm": pa.array(ppms, pa.int64()),
                "from_index": pa.array(idx, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
