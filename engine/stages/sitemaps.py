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


_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()


def _iso_day(s: str) -> int:
    """YYYY-MM-DD (or a prefix of W3C datetime) -> days since epoch;
    -1 when absent/unparsable."""
    import datetime as _dt

    if not s:
        return -1
    try:
        return _dt.date.fromisoformat(s[:10]).toordinal() - _EPOCH_ORD
    except ValueError:
        return -1


def stale_pages(
    sitemap_ds: "ray.data.Dataset",
    captures_ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
    xml_col: str = "xml",
    url_col: str = "url",
    capture_col: str = "capture_day",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Recrawl prioritization: sitemap ``lastmod`` vs the crawler's last
    capture — a page is STALE (fetch it again) when the origin declares
    a modification after our newest capture, or we never captured it.
    The classic sitemap-driven recrawl loop (sitemaps.org protocol;
    the reference's resume cache answers "did we process it", this
    answers "must we process it AGAIN").

    Inputs: the sitemap corpus (host, xml) parsed with the REAL
    ``parse_sitemap``; the capture log (url, capture_day).  Output one
    row per sitemap URL entry (index members excluded):
    ``(url, lastmod_day, capture_day, stale)`` — days since epoch,
    -1 for absent, ``capture_day`` the NEWEST capture.

    Shape: parse pass -> (url, lastmod_day) rows; union+groupby
    semi-join with the capture log (CLAUDE.md device — both sides are
    corpus-sized, so no broadcast): rows tagged by side, bucketed by a
    coarse fnv1a(url) hash, resolved vectorized in-bucket (pandas
    groupby max per side).  XML never shuffles.
    """
    import numpy as np

    from engine.stages.text import fnv1a_batch

    def _bucket(urls) -> np.ndarray:
        return (
            fnv1a_batch([u.encode() for u in urls]).astype(np.int64)
            & ((1 << 63) - 1)
        ) % n_buckets

    def sm_rows(t: pa.Table) -> pa.Table:
        urls, days = [], []
        for xml in t.column(xml_col).to_pylist():
            for row in parse_sitemap(xml or ""):
                if row["from_index"]:
                    continue
                urls.append(row["url"])
                days.append(_iso_day(row["lastmod"]))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "day": pa.array(days, pa.int64()),
                "side": pa.array([0] * len(urls), pa.int64()),
                "bucket": pa.array(_bucket(urls), pa.int64()),
            }
        )

    def cap_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = pc.cast(t.column(url_col), pa.string()).to_pylist()
        days = t.column(capture_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "day": pa.array(days, pa.int64()),
                "side": pa.array([1] * len(urls), pa.int64()),
                "bucket": pa.array(_bucket(urls), pa.int64()),
            }
        )

    def resolve(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "url": pd.Series([], dtype="object"),
                    "lastmod_day": pd.Series([], dtype="int64"),
                    "capture_day": pd.Series([], dtype="int64"),
                    "stale": pd.Series([], dtype="int64"),
                }
            )
        g = df.groupby(["url", "side"])["day"].max().unstack("side")
        if 0 not in g.columns:
            g[0] = np.nan
        if 1 not in g.columns:
            g[1] = np.nan
        g = g[g[0].notna()]  # only urls the sitemap declares
        lastmod = g[0].astype("int64")
        captured = g[1].fillna(-1).astype("int64")
        stale = ((captured < 0) | (lastmod > captured)).astype("int64")
        return pd.DataFrame(
            {
                "url": g.index.to_numpy(),
                "lastmod_day": lastmod.to_numpy(),
                "capture_day": captured.to_numpy(),
                "stale": stale.to_numpy(),
            }
        )

    sm = sitemap_ds.map_batches(
        sm_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    cap = captures_ds.map_batches(
        cap_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return sm.union(cap).groupby("bucket").map_groups(
        resolve, batch_format="pandas"
    )


_RSS_ITEM = re.compile(r"<item\b[^>]*>(.*?)</item>", re.S | re.I)
_ATOM_ENTRY = re.compile(r"<entry\b[^>]*>(.*?)</entry>", re.S | re.I)
_RSS_LINK = re.compile(r"<link[^>]*>\s*([^<\s][^<]*?)\s*</link>", re.S | re.I)
_ATOM_LINK = re.compile(r'<link\b[^>]*\bhref="([^"]+)"', re.I)
_PUBDATE = re.compile(
    r"<(?:pubDate|updated|published)[^>]*>\s*([^<]+?)\s*</", re.S | re.I
)


def parse_feed(xml: str) -> List[dict]:
    """RSS 2.0 / Atom feed -> seed rows {url, published, is_atom} — the
    feed-based URL discovery channel next to sitemaps (blogs/news expose
    feeds long before sitemaps).  RSS items carry ``<link>text</link>``;
    Atom entries carry ``<link href="..."/>`` — both regex-extracted the
    sitemap way (the feeds in the wild are too broken for strict XML).
    ``published`` is the raw date string of the first
    pubDate/updated/published element (normalization is the caller's
    ``clip_warc_date`` problem); entries without a link are dropped."""
    out: List[dict] = []
    for block in _RSS_ITEM.findall(xml or ""):
        m = _RSS_LINK.search(block)
        if not m:
            continue
        d = _PUBDATE.search(block)
        out.append(
            {
                "url": m.group(1).strip(),
                "published": d.group(1).strip() if d else "",
                "is_atom": 0,
            }
        )
    for block in _ATOM_ENTRY.findall(xml or ""):
        m = _ATOM_LINK.search(block)
        if not m:
            continue
        d = _PUBDATE.search(block)
        out.append(
            {
                "url": m.group(1).strip(),
                "published": d.group(1).strip() if d else "",
                "is_atom": 1,
            }
        )
    return out


def feed_urls(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    xml_col: str = "xml",
) -> "ray.data.Dataset":
    """Flatten feed documents into ``(feed_id, url, published, is_atom)``
    seed rows via ``parse_feed`` — one stateless map_batches, no
    shuffle; plugs into the crawl's seed ingestion like sitemap_urls."""
    import pyarrow as pa

    empty = pa.table(
        {
            "feed_id": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "published": pa.array([], pa.string()),
            "is_atom": pa.array([], pa.int64()),
        }
    )

    def flat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        fid, url, pub, atom = [], [], [], []
        for d, xml in zip(
            t.column(id_col).to_pylist(), t.column(xml_col).to_pylist()
        ):
            for row in parse_feed(xml):
                fid.append(d)
                url.append(row["url"])
                pub.append(row["published"])
                atom.append(row["is_atom"])
        return pa.table(
            {
                "feed_id": pa.array(fid, pa.int64()),
                "url": pa.array(url, pa.string()),
                "published": pa.array(pub, pa.string()),
                "is_atom": pa.array(atom, pa.int64()),
            }
        )

    return ds.map_batches(flat, batch_format="pyarrow", zero_copy_batch=True)
