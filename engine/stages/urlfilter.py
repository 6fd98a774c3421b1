"""Frontier URL hygiene: vectorized pre-enqueue URL filtering.

The reference scheduler only ``urlparse``-s target URIs
(/root/reference/warc_indexer/indexer/process.py:254); a real crawl
frontier at 10^10-URL scale needs a cheap, stateless hygiene gate BEFORE
URLs ever reach the seen-set / politeness machinery (every dropped URL
here saves a cuckoo-shard RPC and a groupby(host) row downstream).  The
rule set is the standard crawler one (scheme allow-list, host blocklist,
length / path-depth caps, session-id query params, query-parameter
blowup — the classic crawler-trap signals).

Shape: ONE stateless ``map_batches(batch_format="pyarrow",
zero_copy_batch=True)`` — every rule is an Arrow RE2 / string kernel,
zero per-row Python.  The blocklist is a broadcast value set
(``pc.is_in`` over a ``ray.put``-shipped Arrow array in the real
pipeline; passed by value here since rule configs are driver-sized),
NOT a join — UT1-style blocklists are a few million hosts, far below
any shuffle-worthy size.

First-match-wins rule order (mirrors extract.py's error-policy
enumeration so the status column is deterministic):
  scheme -> blocked_host -> too_long -> too_deep -> session_id ->
  param_blowup -> ok.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SESSION_RE = r"[?&](sid|sessionid|phpsessid|jsessionid|cfid|cftoken)="
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"
_SCHEME_RE = r"^https?://"


def url_filter(
    ds: "ray.data.Dataset",
    *,
    url_col: str = "url",
    blocked_hosts: Optional[Iterable[str]] = None,
    max_len: int = 256,
    max_depth: int = 8,
    max_params: int = 4,
) -> "ray.data.Dataset":
    """Append a ``status`` column: ``'ok'`` or the first failing rule.

    Rows are NOT dropped — emitting the verdict keeps the operator
    SQL-verifiable end-to-end and lets callers choose
    ``filter(status == 'ok')`` (map-side, no shuffle) or route rejects
    to a lineage sink.  ``too_deep`` counts path segments as
    ``count('/') - 2`` (scheme ``://`` contributes two), exact for
    fragment-free canonical URLs (canonicalize.py strips fragments).
    """
    blocked = pa.array(sorted(set(blocked_hosts or ())), pa.string())

    def verdict(t: pa.Table) -> pa.Table:
        urls = t.column(url_col)
        if urls.num_chunks != 1:
            urls = urls.combine_chunks()
        host = pc.struct_field(pc.extract_regex(urls, pattern=_HOST_RE), "host")

        def _b(mask):
            # null url -> null kernel results; a null URL fails 'scheme'
            # (first rule), so null masks resolve to False everywhere else
            return pc.fill_null(mask, False)

        # extract_regex yields null on non-match; is_in(null)=false, fine.
        bad_scheme = pc.fill_null(
            pc.invert(pc.match_substring_regex(urls, pattern=_SCHEME_RE)), True
        )
        bad_host = _b(pc.is_in(host, value_set=blocked))
        too_long = _b(pc.greater(pc.utf8_length(urls), max_len))
        too_deep = _b(
            pc.greater(pc.count_substring(urls, pattern="/"), max_depth + 2)
        )
        session = _b(
            pc.match_substring_regex(urls, pattern=_SESSION_RE, ignore_case=True)
        )
        blowup = _b(pc.greater(pc.count_substring(urls, pattern="="), max_params))

        status = pa.array(["ok"] * len(urls), pa.string())
        # reverse order so earlier rules overwrite later ones (first wins)
        for mask, name in (
            (blowup, "param_blowup"),
            (session, "session_id"),
            (too_deep, "too_deep"),
            (too_long, "too_long"),
            (bad_host, "blocked_host"),
            (bad_scheme, "scheme"),
        ):
            status = pc.if_else(mask, pa.scalar(name, pa.string()), status)
        return t.append_column("status", status)

    return ds.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)


def url_templates(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    k: int = 20,
) -> ray.data.Dataset:
    """Top-k URL path templates by frequency: digit runs folded to ``N``
    and the query string stripped — the standard crawl-trap / site-section
    analytic (calendar traps, paginators and id-enumerated sections
    collapse onto one template while organic pages spread out).

    Shuffle shape: one vectorized RE2 pass emits per-batch
    (template, host) partial counts; a pair groupby makes pairs globally
    unique; a second per-block partial + template groupby yields
    (n_urls, distinct-host count); the final top-k is per-block
    candidates -> resolve (global_topk), never an all-to-all sort.
    Returns (template, n_urls, n_hosts) — the rank column is dropped so
    the SQL oracle can mirror with a plain GROUP BY/ORDER BY/LIMIT.
    """
    from ray.data.aggregate import Sum

    from engine.stages.topk import global_topk

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column(url_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = pc.cast(u, pa.string())
        stripped = pc.replace_substring_regex(u, pattern=r"\?.*$", replacement="")
        tmpl = pc.replace_substring_regex(stripped, pattern="[0-9]+", replacement="N")
        # host from the PRE-fold url: digit-folding would collapse
        # numbered hosts and understate n_hosts
        host = pc.struct_field(
            pc.extract_regex(stripped, r"^[a-z]+://(?P<h>[^/]+)"), "h"
        )
        tt = pa.table({"template": tmpl, "host": pc.fill_null(host, "")})
        g = tt.group_by(["template", "host"]).aggregate([("host", "count")])
        return g.select(["template", "host", "host_count"]).rename_columns(
            ["template", "host", "n"]
        )

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    uniq_pairs = pair_ds.groupby(["template", "host"]).aggregate(
        Sum("n", alias_name="n")
    )

    def per_template(t: pa.Table) -> pa.Table:
        g = t.group_by("template").aggregate([("n", "sum"), ("host", "count")])
        return g.select(["template", "n_sum", "host_count"]).rename_columns(
            ["template", "n_urls", "n_hosts"]
        )

    totals = (
        uniq_pairs.map_batches(
            per_template, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("template")
        .aggregate(Sum("n_urls", alias_name="n_urls"), Sum("n_hosts", alias_name="n_hosts"))
    )
    top = global_topk(
        totals, order_cols=["n_urls", "template"], descending=[True, False], k=k
    )
    return top.map_batches(
        lambda t: t.select(["template", "n_urls", "n_hosts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pagination_chains(
    ds: ray.data.Dataset,
    *,
    url_col: str = "url",
    min_len: int = 2,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Detect paginated URL chains: URLs of the form ``<prefix>/page/<N>``
    group into one chain per prefix, ordered by the page number — the
    standard crawl-scheduling signal for list/archive sections (a chain is
    fetched breadth-limited, its gaps hint at deleted pages, and its
    length separates paginators from article URLs).  The reference has no
    URL-structure analytics at all (its scheduler only urlparse-s,
    process.py:254); this is a first-class frontier analytic.

    Returns one row per chain with >= ``min_len`` DISTINCT page numbers:
    (chain, n_pages, min_page, max_page, n_gaps) where
    ``n_gaps = max - min + 1 - n_pages`` (missing numbers inside the
    observed span; duplicates of a (chain, page) pair count once).

    Shuffle shape: a vectorized RE2 pass extracts (chain, page) and
    dedups per batch; ONE groupby over a coarse fnv1a(chain) bucket
    (CLAUDE.md #37: chains are corpus-sized at ~n_urls/chain_len, so a
    per-key Aggregate pays Ray's per-group overhead per chain — the
    in-bucket reduce is a single vectorized pyarrow group_by instead);
    the chain text shuffles once, pages ship as int64.
    """

    def extract(t: pa.Table) -> pa.Table:
        from engine.stages.text import fnv1a_batch

        u = t.column(url_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = pc.cast(u, pa.string())
        m = pc.extract_regex(u, r"^(?P<chain>.*/page/)(?P<num>[0-9]+)$")
        ok = pc.is_valid(m)
        m = m.filter(ok)
        chain = pc.struct_field(m, "chain")
        page = pc.cast(pc.struct_field(m, "num"), pa.int64())
        # per-batch dedup: repeated (chain, page) captures collapse here
        # so only unique pairs shuffle
        pairs = (
            pa.table({"chain": chain, "page": page})
            .group_by(["chain", "page"])
            .aggregate([])
        )
        kb = (
            fnv1a_batch([c.encode() for c in pairs.column("chain").to_pylist()])
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pairs.append_column("kb", pa.array(kb, pa.int64()))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        # in-bucket: global dedup of (chain, page), then per-chain stats —
        # all chains of this bucket resolve in two vectorized group_bys
        uniq = t.group_by(["chain", "page"]).aggregate([])
        g = uniq.group_by("chain").aggregate(
            [("page", "count"), ("page", "min"), ("page", "max")]
        )
        n = pc.cast(g.column("page_count"), pa.int64())
        mn = g.column("page_min")
        mx = g.column("page_max")
        out = pa.table(
            {
                "chain": g.column("chain"),
                "n_pages": n,
                "min_page": mn,
                "max_page": mx,
                "n_gaps": pc.subtract(
                    pc.add(pc.subtract(mx, mn), pa.scalar(1, pa.int64())), n
                ),
            }
        )
        return out.filter(pc.greater_equal(out.column("n_pages"), min_len))

    pairs = ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
    return pairs.groupby("kb").map_groups(
        reduce_bucket, batch_format="pyarrow"
    )


# Cyrillic/Greek -> Latin homoglyph skeleton map (UTS #39 confusables,
# the high-frequency subset that covers practical IDN host spoofing; a
# production deployment loads the full confusables.txt table the same way)
_HOMOGLYPHS = {
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "х": "x",
    "у": "y", "і": "i", "ѕ": "s", "ԁ": "d", "ɡ": "g", "ո": "n",
    "ο": "o", "α": "a", "ν": "v", "τ": "t",
}
_HG_FROM = "".join(_HOMOGLYPHS)
_HG_TO = "".join(_HOMOGLYPHS.values())
_HG_TABLE = str.maketrans(_HOMOGLYPHS)


def homoglyph_hosts(
    ds: "ray.data.Dataset",
    *,
    host_col: str = "host",
) -> "ray.data.Dataset":
    """IDN-spoofing detection (Unicode UTS #39 confusable skeletons):
    hosts that LOOK identical after mapping non-Latin homoglyphs to
    their Latin skeletons but differ as raw strings — the phishing /
    crawl-poisoning signal (``раypal.com`` with a Cyrillic ``р`` vs the
    real ``paypal.com``).  Output one row per host in a confusable
    group: ``(skeleton, host, n_hosts, is_ascii)`` with ``n_hosts`` the
    group's distinct-host count (> 1 = spoof cluster) and ``is_ascii``
    marking the presumed-legitimate member.

    Shapes: skeleton map-side (ASCII fast path via binary_length ==
    utf8_length, non-ASCII rows through one C-level str.translate —
    the masked-splice device); ONE groupby(skeleton, host) dedup + ONE
    groupby(skeleton) count, reassembled with a union+groupby (no
    join).  SQL mirrors with translate()."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    def skel(t: pa.Table) -> pa.Table:
        h = t.column(host_col)
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
            if isinstance(h, pa.ChunkedArray):
                h = h.chunk(0) if h.num_chunks else pa.array([], pa.string())
        h = pc.fill_null(h, "")
        nonascii = pc.not_equal(pc.binary_length(h), pc.utf8_length(h))
        out = h
        if pc.any(nonascii).as_py():
            idx = np.flatnonzero(nonascii.to_numpy(zero_copy_only=False))
            repl = pa.array(
                [h[int(i)].as_py().translate(_HG_TABLE) for i in idx],
                pa.string(),
            )
            out = pc.replace_with_mask(h, nonascii, repl)
        return pa.table(
            {
                "skeleton": out,
                "host": h,
                "is_ascii": pc.cast(pc.invert(nonascii), pa.int64()),
            }
        )

    distinct = (
        ds.map_batches(skel, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["skeleton", "host"])
        .aggregate(Max("is_ascii", alias_name="is_ascii"))
    )
    # group sizes via a COARSE skeleton-hash bucket (PERF.md #31 —
    # skeletons are host-cardinality; per-group Python would pay ~1 ms
    # per host), resolved vectorized with a pandas transform
    import pandas as pd

    from engine.stages.common import as_arrow
    from engine.stages.text import fnv1a_batch

    NB = 256
    MASK = np.uint64((1 << 63) - 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        sk = t.column("skeleton").to_pylist()
        h = (fnv1a_batch([s.encode("utf-8") for s in sk]) & MASK).astype(
            np.int64
        )
        return pa.table(
            {
                "skeleton": t.column("skeleton"),
                "host": t.column("host"),
                "is_ascii": t.column("is_ascii").cast(pa.int64()),
                "sb": pa.array(h & np.int64(NB - 1), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "skeleton": pd.Series([], dtype="string"),
                    "host": pd.Series([], dtype="string"),
                    "n_hosts": np.asarray([], np.int64),
                    "is_ascii": np.asarray([], np.int64),
                }
            )
        sizes = df.groupby("skeleton")["host"].transform("size")
        keep = sizes.to_numpy() >= 2  # singletons are not confusable
        df = df[keep]
        return pd.DataFrame(
            {
                "skeleton": df["skeleton"].astype("string"),
                "host": df["host"].astype("string"),
                "n_hosts": sizes.to_numpy(np.int64)[keep],
                "is_ascii": df["is_ascii"].to_numpy(np.int64),
            }
        )

    return as_arrow(
        distinct.map_batches(
            add_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("sb")
        .map_groups(
            lambda df: per_bucket(df.drop(columns=["sb"])),
            batch_format="pandas",
        )
    )
