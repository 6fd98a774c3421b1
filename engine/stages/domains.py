"""Registrable-domain (eTLD+1) extraction over host columns.

Crawlers enforce politeness, budgets and dedup at the REGISTRABLE-domain
boundary, not the raw-host boundary (``news.bbc.co.uk`` and
``www.bbc.co.uk`` are one owner; ``a.blogspot.com`` and ``b.blogspot.com``
are two sites on one host suffix).  The reference indexer never needs
this (it consumes per-record WARC metadata), but the north-star crawl
frontier does: per-host groupbys under-throttle mega-owners that spread
load across subdomains.

Algorithm: the Public Suffix List match rule (longest matching suffix
wins; registrable = suffix + one preceding label), evaluated against a
built-in DETERMINISTIC subset of the PSL's ICANN section — the common
two-label country suffixes.  Deviations from the full PSL, documented:

* the suffix table is a frozen subset (no network, no data files): all
  single-label TLDs via the PSL default rule, plus ``_SUFFIX2`` for
  two-label suffixes; no wildcard (``*.ck``) or exception (``!www.ck``)
  rules, no private section;
* a host that IS a public suffix (``co.uk``) or a single label
  (``localhost``) has no registrable domain per the PSL; we return the
  host unchanged instead of NULL so downstream groupbys never see nulls.

The kernel is pure Arrow compute (two anchored ``extract_regex`` calls +
``is_in`` + ``if_else``) — zero per-row Python, usable in the crawl hot
path.
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Frozen two-label public-suffix subset (PSL ICANN section, most-used
# ccTLD second-level registries).  Order-free: matching is exact set
# membership on the host's last two labels.
_SUFFIX2 = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ac.jp", "ne.jp", "or.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "co.nz", "net.nz", "org.nz",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.tr", "org.tr", "com.sg", "com.hk", "com.tw",
)

# anchored last-2- and last-3-label extractors (no dots inside a label)
_RE_LAST2 = r"(?P<l>[^.]+\.[^.]+)$"
_RE_LAST3 = r"(?P<l>[^.]+\.[^.]+\.[^.]+)$"


def _extract_tail(hosts: pa.Array, pattern: str) -> pa.Array:
    """Last-k-label substring of each host, null where fewer labels."""
    st = pc.extract_regex(hosts, pattern)
    return pc.struct_field(st, "l")


def registrable_domain_batch(hosts: pa.Array) -> Dict[str, pa.Array]:
    """Vectorized eTLD+1: returns ``domain`` and ``suffix`` arrays.

    domain: registrable domain (host itself when too short — see module
    docstring); suffix: the matched public suffix ("uk" vs "co.uk").

    Hosts repeat heavily inside a frontier block, so the regex kernel
    runs over the DICTIONARY of distinct hosts and fans back out with a
    take — measured 33 ms -> 10 ms warm on a 200k-row frontier with ~1k
    distinct hosts (~50 ns/row); skipped when the block has few repeats
    (the dictionary must be at most half the rows, which also terminates
    the recursion).
    """
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    hosts = pc.cast(hosts, pa.string())
    if len(hosts) > 256:
        enc = pc.dictionary_encode(hosts)
        if len(enc.dictionary) * 2 <= len(hosts):  # repeats actually help
            uniq = registrable_domain_batch(enc.dictionary)
            return {
                "domain": pc.take(uniq["domain"], enc.indices),
                "suffix": pc.take(uniq["suffix"], enc.indices),
            }
    last1 = _extract_tail(hosts, r"(?P<l>[^.]+)$")
    last2 = _extract_tail(hosts, _RE_LAST2)
    last3 = _extract_tail(hosts, _RE_LAST3)
    suffix2_set = pa.array(list(_SUFFIX2), pa.string())
    is2 = pc.fill_null(pc.is_in(last2, value_set=suffix2_set), False)
    # two-label suffix matched: registrable = last 3 labels (falling back
    # to the host itself when the host IS the suffix); else default PSL
    # rule: suffix = last label, registrable = last 2 (or the bare host).
    domain = pc.if_else(
        is2,
        pc.coalesce(last3, hosts),
        pc.coalesce(last2, hosts),
    )
    suffix = pc.if_else(is2, last2, last1)
    return {"domain": domain, "suffix": pc.coalesce(suffix, hosts)}


_SUFFIX2_SET = frozenset(_SUFFIX2)


def registrable_domain(host: str) -> str:
    """Scalar eTLD+1 — the per-row mirror of ``registrable_domain_batch``
    for driver-side loops and the single-threaded crawl oracle.  Parity
    with the batch kernel is test-pinned (tests/test_domains.py)."""
    labels = host.split(".")
    if len(labels) >= 2 and ".".join(labels[-2:]) in _SUFFIX2_SET:
        return ".".join(labels[-3:]) if len(labels) >= 3 else host
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def domain_agg(
    pages: ray.data.Dataset,
    host_col: str = "host",
) -> pa.Table:
    """Per-registrable-domain crawl aggregate: page count + distinct-host
    count + matched suffix.

    Shuffle shape: the registrable-domain key space is owner-sized
    (driver-small next to the corpus), so a Ray ``groupby`` would spin up
    aggregator actors to move a handful of rows (CLAUDE.md / PERF.md
    #24): instead each batch pre-aggregates to (domain, suffix, host,
    n_pages) — already ~distinct-host sized — and the driver does the
    final distinct-host/count reduce on the collected partials.  At
    10^10-URL scale the partials stay bounded by the distinct-host count
    per block, not the row count.
    """
    from engine.stages.common import collect_arrow_blocks

    def partial(t: pa.Table) -> pa.Table:
        cols = registrable_domain_batch(t.column(host_col))
        tt = pa.table(
            {
                "domain": cols["domain"],
                "suffix": cols["suffix"],
                "host": pc.cast(t.column(host_col), pa.string()),
            }
        )
        g = tt.group_by(["domain", "suffix", "host"]).aggregate(
            [("host", "count")]
        )
        # select by NAME: the key/aggregate column order after group_by
        # differs across pyarrow majors (ADVICE round-4)
        return g.select(["domain", "suffix", "host", "host_count"]).rename_columns(
            ["domain", "suffix", "host", "n_pages"]
        )

    parts = pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    blocks = collect_arrow_blocks(parts, required_col="n_pages")
    if not blocks:
        return pa.table(
            {
                "domain": pa.array([], pa.string()),
                "suffix": pa.array([], pa.string()),
                "n_pages": pa.array([], pa.int64()),
                "n_hosts": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(blocks, promote_options="default")
    # per (domain, suffix, host): total pages across blocks
    per_host = merged.group_by(["domain", "suffix", "host"]).aggregate(
        [("n_pages", "sum")]
    )
    out = per_host.group_by(["domain", "suffix"]).aggregate(
        [("n_pages_sum", "sum"), ("host", "count_distinct")]
    )
    out = out.select(
        ["domain", "suffix", "n_pages_sum_sum", "host_count_distinct"]
    ).rename_columns(["domain", "suffix", "n_pages", "n_hosts"])
    return out.set_column(
        2, "n_pages", pc.cast(out.column("n_pages"), pa.int64())
    ).set_column(3, "n_hosts", pc.cast(out.column("n_hosts"), pa.int64()))
