"""Registrable-domain (eTLD+1) kernel + aggregate tests.

The kernel must match the PSL longest-suffix-wins rule over the frozen
built-in suffix subset, with the documented deviations (host-is-suffix
and single-label hosts return the host, nulls propagate).
"""

import pyarrow as pa
import pytest

from engine.stages.domains import _SUFFIX2, domain_agg, registrable_domain_batch

VECTORS = [
    ("www.bbc.co.uk", "bbc.co.uk", "co.uk"),
    ("news.bbc.co.uk", "bbc.co.uk", "co.uk"),
    ("foo.com", "foo.com", "com"),
    ("a.b.c.com.au", "c.com.au", "com.au"),
    ("cdn.eu.site3.gov.uk", "site3.gov.uk", "gov.uk"),
    ("x.y.de", "y.de", "de"),
    # documented deviations: host-is-suffix / single label -> host itself
    ("co.uk", "co.uk", "co.uk"),
    ("localhost", "localhost", "localhost"),
]


def test_registrable_domain_vectors():
    hosts = pa.array([h for h, _, _ in VECTORS])
    out = registrable_domain_batch(hosts)
    assert out["domain"].to_pylist() == [d for _, d, _ in VECTORS]
    assert out["suffix"].to_pylist() == [s for _, _, s in VECTORS]


def test_registrable_domain_oracle():
    """Kernel matches an independent per-row PSL-rule oracle over every
    suffix in the frozen table x several label layouts."""

    def oracle(host):
        labels = host.split(".")
        if len(labels) >= 2 and ".".join(labels[-2:]) in _SUFFIX2:
            dom = ".".join(labels[-3:]) if len(labels) >= 3 else host
            return dom, ".".join(labels[-2:])
        dom = ".".join(labels[-2:]) if len(labels) >= 2 else host
        return dom, labels[-1]

    hosts = []
    for suf in _SUFFIX2:
        hosts += [suf, f"one.{suf}", f"two.one.{suf}", f"www.two.one.{suf}"]
    hosts += ["example.org", "a.example.org", "tld", "x.co.uk.evil.com"]
    out = registrable_domain_batch(pa.array(hosts))
    expect = [oracle(h) for h in hosts]
    assert out["domain"].to_pylist() == [d for d, _ in expect]
    assert out["suffix"].to_pylist() == [s for _, s in expect]


def test_registrable_domain_nulls():
    out = registrable_domain_batch(pa.array([None, "foo.com"], pa.string()))
    assert out["domain"].to_pylist() == [None, "foo.com"]


def test_domain_agg(ray_session):
    import ray.data

    rows = [
        {"host": "www.bbc.co.uk"},
        {"host": "news.bbc.co.uk"},
        {"host": "news.bbc.co.uk"},
        {"host": "foo.com"},
    ]
    out = domain_agg(ray.data.from_items(rows))
    got = {
        r["domain"]: (r["n_pages"], r["n_hosts"], r["suffix"])
        for r in out.to_pylist()
    }
    assert got == {
        "bbc.co.uk": (3, 2, "co.uk"),
        "foo.com": (1, 1, "com"),
    }
    # n_pages/n_hosts must stay int64 (join/groupby key discipline)
    assert out.schema.field("n_pages").type == pa.int64()
    assert out.schema.field("n_hosts").type == pa.int64()


def test_domain_agg_empty(ray_session):
    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"host": pa.array([], pa.string())})
    )
    out = domain_agg(empty)
    assert out.num_rows == 0
    assert out.column_names == ["domain", "suffix", "n_pages", "n_hosts"]
