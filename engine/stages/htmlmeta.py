"""Head-metadata directives — meta-robots flags and hreflang alternates.

Two page-level signals a web-scale indexer must extract before the sink:

* **meta robots** (``<meta name="robots" content="noindex, nofollow">``)
  — the in-page analog of robots.txt.  The reference indexes every
  processed record unconditionally
  (`/root/reference/warc_indexer/indexer/process.py:215-260` has no
  robots-meta check); a production deployment of the same pipeline must
  drop ``noindex`` pages before the ES bulk sink and stop propagating
  links from ``nofollow`` pages in the crawl frontier.  Directive
  resolution (multiple tags union, most-restrictive wins, ``none`` =
  noindex+nofollow) lives in ``html_extract.get_meta_robots``.

* **hreflang alternates** (``<link rel="alternate" hreflang="de"
  href=...>``) — the multilingual-cluster annotation; flattened to one
  (doc, lang, href) row per alternate so downstream joins can build
  language clusters or validate reciprocity.

Scale shape: ONE stateless ``map_batches`` parse pass each (the same
HTMLTree stack the extraction pipeline uses — parsing per document IS
the work, like `extract.py`); no shuffle, html never leaves its block,
outputs are narrow typed tables.  At 100 TB both run as pure streaming
map stages.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

_ROBOTS_COLS = ("noindex", "nofollow", "noarchive", "nosnippet")


def _parse(html):
    from engine.html_extract import HTMLTree

    try:
        return HTMLTree.parse(html if isinstance(html, str) else html.decode("utf-8", "replace"))
    except Exception:
        return None


def meta_robots(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, noindex, nofollow, noarchive, nosnippet) 0/1 int64 flags
    per page; see module docstring for semantics."""

    def per_batch(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_meta_robots

        ids, flags = [], {c: [] for c in _ROBOTS_COLS}
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = _parse(html or "")
            f = (
                get_meta_robots(tree)
                if tree is not None
                else {c: False for c in _ROBOTS_COLS}
            )
            ids.append(int(d))
            for c in _ROBOTS_COLS:
                flags[c].append(int(f[c]))
        cols = {id_col: pa.array(ids, pa.int64())}
        cols.update(
            {c: pa.array(flags[c], pa.int64()) for c in _ROBOTS_COLS}
        )
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def hreflang_map(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Flattened (doc_id, hreflang, href) rows, one per alternate link in
    document order; pages with no alternates contribute no rows."""

    def per_batch(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_hreflang_alternates

        ids, langs, hrefs = [], [], []
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = _parse(html or "")
            if tree is None:
                continue
            for lang, href in get_hreflang_alternates(tree):
                ids.append(int(d))
                langs.append(lang)
                hrefs.append(href)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "hreflang": pa.array(langs, pa.string()),
                "href": pa.array(hrefs, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def hreflang_reciprocal(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: str = "url",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Hreflang reciprocity validation: an alternate annotation only
    counts (Google's documented rule) when the TARGET page annotates
    back — non-reciprocal links are ignored by search engines and are
    the #1 hreflang deployment bug.  Output: one row per alternate edge
    ``(doc_id, hreflang, href, reciprocal)`` with reciprocal=1 iff the
    reverse (href -> page url) edge exists anywhere in the corpus.

    Shape: the parse pass emits (src_url, dst_url) edges (self-links
    drop); reciprocity is a semi-join of the edge set against its own
    reverse, done union+groupby style per CLAUDE.md — pair key (lo, hi)
    = sorted url pair, bucketed by a COARSE uniform fnv1a hash so the
    map_groups python overhead is per-bucket, and each bucket resolves
    vectorized (pandas groupby nunique over directions).  Text/html
    never shuffles; edge rows are narrow strings.
    """
    import numpy as np

    def edges(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_hreflang_alternates
        from engine.stages.text import fnv1a_batch

        ids, langs, srcs, dsts = [], [], [], []
        for d, u, html in zip(
            t.column(id_col).to_pylist(),
            t.column(url_col).to_pylist(),
            t.column(html_col).to_pylist(),
        ):
            tree = _parse(html or "")
            if tree is None:
                continue
            for lang, href in get_hreflang_alternates(tree):
                if href == u:
                    continue
                ids.append(int(d))
                langs.append(lang)
                srcs.append(u or "")
                dsts.append(href)
        lo = [min(a, b) for a, b in zip(srcs, dsts)]
        hi = [max(a, b) for a, b in zip(srcs, dsts)]
        bkt = (
            fnv1a_batch([f"{a}|{b}".encode() for a, b in zip(lo, hi)])
            .astype(np.int64) & ((1 << 63) - 1)
        ) % n_buckets
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "hreflang": pa.array(langs, pa.string()),
                "src": pa.array(srcs, pa.string()),
                "href": pa.array(dsts, pa.string()),
                "lo": pa.array(lo, pa.string()),
                "hi": pa.array(hi, pa.string()),
                "bucket": pa.array(bkt, pa.int64()),
            }
        )

    def resolve(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "hreflang": pd.Series([], dtype="object"),
                    "href": pd.Series([], dtype="object"),
                    "reciprocal": pd.Series([], dtype="int64"),
                }
            )
        fwd = df["src"] == df["lo"]
        dirs = np.where(fwd, 0, 1).astype(np.int64)
        key = df["lo"] + "\x00" + df["hi"]
        both = (
            pd.DataFrame({"k": key, "d": dirs})
            .groupby("k")["d"].transform("nunique") == 2
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "hreflang": df["hreflang"],
                "href": df["href"],
                "reciprocal": both.astype("int64").values,
            }
        )

    edge_ds = ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True)
    return edge_ds.groupby("bucket").map_groups(resolve, batch_format="pandas")


def robots_directives(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    header_col: str = "x_robots_tag",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """EFFECTIVE robots directives: union of the ``X-Robots-Tag`` HTTP
    response header and all in-page ``<meta name=robots>`` tags —
    Google's documented resolution (both channels apply; most
    restrictive wins; ``none`` expands).  Header grammar: directives
    comma-separated; a ``ua:`` scope prefix restricts to that agent —
    scoped groups are IGNORED here (unscoped subset, documented), so
    ``googlebot: noindex`` does not bind a generic crawler while
    ``noindex, nofollow`` does.

    Output: (doc_id, noindex, nofollow, noarchive, nosnippet, from_header,
    from_meta) — the two 0/1 provenance flags say which channel
    contributed at least one restriction.  One stateless parse pass, no
    shuffle."""
    import re

    scoped_rx = re.compile(r"^\s*[a-zA-Z0-9_-]+\s*:")

    def header_flags(hdr: str) -> dict:
        flags = {d: False for d in _ROBOTS_COLS}
        if not hdr:
            return flags
        # multiple header values may be comma-joined; a scope prefix
        # applies to the rest of ITS value — conservatively, a scoped
        # prefix voids the remainder of the string (subset semantics)
        if scoped_rx.match(hdr):
            return flags
        toks = {t.strip().lower() for t in hdr.split(",")}
        if "none" in toks:
            flags["noindex"] = flags["nofollow"] = True
        for d in _ROBOTS_COLS:
            if d in toks:
                flags[d] = True
        return flags

    def per_batch(t: pa.Table) -> pa.Table:
        from engine.html_extract import get_meta_robots

        n = t.num_rows
        ids, out = [], {c: [] for c in _ROBOTS_COLS}
        fh, fm = [], []
        hdrs = (
            t.column(header_col).to_pylist()
            if header_col in t.column_names
            else [None] * n
        )
        for d, html, hdr in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist(), hdrs
        ):
            tree = _parse(html or "")
            meta = (
                get_meta_robots(tree)
                if tree is not None
                else {c: False for c in _ROBOTS_COLS}
            )
            head = header_flags(hdr or "")
            ids.append(int(d))
            for c in _ROBOTS_COLS:
                out[c].append(int(meta[c] or head[c]))
            fh.append(int(any(head.values())))
            fm.append(int(any(meta.values())))
        cols = {id_col: pa.array(ids, pa.int64())}
        cols.update({c: pa.array(out[c], pa.int64()) for c in _ROBOTS_COLS})
        cols["from_header"] = pa.array(fh, pa.int64())
        cols["from_meta"] = pa.array(fm, pa.int64())
        return pa.table(cols)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def link_rel_stats(
    ds: ray.data.Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-page outlink classification — the SEO/spam link signals:
    ``(doc_id, n_links, n_internal, n_external, n_nofollow)`` where
    internal = same registrable domain as the page (eTLD+1 via
    ``domains.registrable_domain``), nofollow = ``rel`` contains the
    nofollow token (rel is token-matched: ``rel="ugc nofollow"``
    counts).  Relative hrefs resolve against the page URL and count as
    internal.  A high external+nofollow-free ratio is the classic link
    -farm indicator; the crawl frontier also needs nofollow to stop
    propagation (meta nofollow is page-wide, this is per-link).

    One stateless parse pass (HTMLTree, like the extraction pipeline);
    no shuffle."""

    def per_batch(t: pa.Table) -> pa.Table:
        from urllib.parse import urljoin, urlsplit

        from engine.html_extract import get_anchor_rels
        from engine.stages.domains import registrable_domain

        ids = []
        n_links, n_int, n_ext, n_nof = [], [], [], []
        for d, u, html in zip(
            t.column(id_col).to_pylist(),
            t.column(url_col).to_pylist(),
            t.column(html_col).to_pylist(),
        ):
            tree = _parse(html or "")
            pairs = get_anchor_rels(tree) if tree is not None else []
            page_dom = registrable_domain(urlsplit(u or "").hostname or "")
            nl = ni = ne = nn = 0
            for href, rel in pairs:
                try:
                    tgt = urljoin(u or "", href)
                    host = urlsplit(tgt).hostname or ""
                except ValueError:
                    continue
                nl += 1
                if registrable_domain(host) == page_dom:
                    ni += 1
                else:
                    ne += 1
                if "nofollow" in rel.split():
                    nn += 1
            ids.append(int(d))
            n_links.append(nl)
            n_int.append(ni)
            n_ext.append(ne)
            n_nof.append(nn)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_links": pa.array(n_links, pa.int64()),
                "n_internal": pa.array(n_int, pa.int64()),
                "n_external": pa.array(n_ext, pa.int64()),
                "n_nofollow": pa.array(n_nof, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def jsonld_types(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """schema.org structured-data extraction: per document, parse every
    ``application/ld+json`` script block through the REAL HTML parser
    (html_extract.get_jsonld_blocks — raw-text script handling, type
    attr case/whitespace tolerant) and ``json.loads``, emitting
    ``(id, ld_type, n_keys, position)`` per VALID block: @type (first
    element when a list), top-level key count, and the ``position``
    value (proves real JSON parsing, not a regex).  Malformed JSON and
    non-ld+json scripts are dropped silently — exactly what a crawler
    must do with the open web's broken markup.

    One stateless map_batches pass (parse per row — the same per-row
    cost class as the extraction flagship), no shuffle."""
    import json

    import pyarrow as pa

    from engine.html_extract import HTMLTree, get_jsonld_blocks

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "ld_type": pa.array([], pa.string()),
            "n_keys": pa.array([], pa.int64()),
            "position": pa.array([], pa.int64()),
        }
    )

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        ids, types, keys, poss = [], [], [], []
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = HTMLTree.parse(html or "")
            for blob in get_jsonld_blocks(tree):
                try:
                    obj = json.loads(blob)
                except (ValueError, TypeError):
                    continue
                if not isinstance(obj, dict):
                    continue
                lt = obj.get("@type")
                if isinstance(lt, list):
                    lt = lt[0] if lt else None
                if not isinstance(lt, str):
                    continue
                pos = obj.get("position")
                ids.append(d)
                types.append(lt)
                keys.append(len(obj))
                poss.append(int(pos) if isinstance(pos, (int, bool)) else -1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "ld_type": pa.array(types, pa.string()),
                "n_keys": pa.array(keys, pa.int64()),
                "position": pa.array(poss, pa.int64()),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def image_srcset(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """Media-URL discovery for the multimodal crawl: per document, every
    image candidate from ``<img>`` ``src`` plus all ``srcset`` variants
    (HTML spec srcset syntax: comma-separated ``url [wN|xN]``
    descriptors), emitting ``(id, img_url, width)`` — width from the
    ``NNNw`` descriptor, -1 when absent (x-density and bare candidates).
    This is the discovery stage feeding ``multimodal``'s decode/resize
    actors; crawlers fetch the largest-width variant per image.

    Real parser (find_all img), one stateless map_batches, no shuffle.
    Duplicate candidates per page dedup (src repeated in srcset is one
    row, keeping the descriptor's width when both appear)."""
    import pyarrow as pa

    from engine.html_extract import HTMLTree

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "img_url": pa.array([], pa.string()),
            "width": pa.array([], pa.int64()),
        }
    )

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        ids, urls, widths = [], [], []
        for d, html in zip(
            t.column(id_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            tree = HTMLTree.parse(html or "")
            if tree.body is None:
                continue
            cand: dict = {}
            for img in tree.body.find_all(("img",)):
                src = img.attrs.get("src", "").strip()
                if src and src not in cand:
                    cand[src] = -1
                for part in img.attrs.get("srcset", "").split(","):
                    part = part.strip()
                    if not part:
                        continue
                    bits = part.split()
                    url = bits[0]
                    w = -1
                    if len(bits) > 1 and bits[1].endswith("w"):
                        try:
                            w = int(bits[1][:-1])
                        except ValueError:
                            w = -1
                    if url not in cand or w > cand[url]:
                        cand[url] = w
            for url in sorted(cand):
                ids.append(d)
                urls.append(url)
                widths.append(cand[url])
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "img_url": pa.array(urls, pa.string()),
                "width": pa.array(widths, pa.int64()),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
