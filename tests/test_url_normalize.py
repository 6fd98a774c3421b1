"""Unit tests: frontier URL hygiene (stages.urlfilter) and Unicode/ws
normalization (clean.normalize_text) — rule precedence, each rule firing
alone, NFC recomposition, idempotence, empty/degenerate inputs."""

import pyarrow as pa
import pytest
import ray.data

from engine.stages.clean import normalize_text
from engine.stages.urlfilter import url_filter


def _run_filter(urls, **kw):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(urls)), pa.int64()),
                "url": pa.array(urls, pa.string()),
            }
        )
    )
    out = url_filter(ds, **kw).to_pandas()
    if out.empty:  # zero-row blocks bypass map_batches (CLAUDE.md)
        return []
    return out.sort_values("doc_id")["status"].tolist()


def test_url_filter_each_rule(ray_session):
    statuses = _run_filter(
        [
            "https://ok.example.com/a/b.html",                      # ok
            "ftp://ok.example.com/a.html",                          # scheme
            "https://bad.example.com/a.html",                       # blocked_host
            "https://ok.example.com/" + "x" * 300,                  # too_long
            "https://ok.example.com" + "/d" * 9 + "/p.html",        # too_deep
            "https://ok.example.com/p?JSESSIONID=42",               # session_id
            "https://ok.example.com/p?a=1&b=2&c=3&d=4&e=5",         # param_blowup
        ],
        blocked_hosts=("bad.example.com",),
        max_len=256,
        max_depth=8,
        max_params=4,
    )
    assert statuses == [
        "ok", "scheme", "blocked_host", "too_long",
        "too_deep", "session_id", "param_blowup",
    ]


def test_url_filter_first_match_wins(ray_session):
    # scheme beats blocked_host beats too_long beats session_id
    statuses = _run_filter(
        [
            "ftp://bad.example.com/" + "x" * 300 + "?sid=1",
            "https://bad.example.com/" + "x" * 300 + "?sid=1",
            "https://ok.example.com/" + "x" * 300 + "?sid=1",
            "https://ok.example.com/p?sid=1&a=1&b=2&c=3&d=4&e=5",
        ],
        blocked_hosts=("bad.example.com",),
        max_len=256,
        max_depth=8,
        max_params=4,
    )
    assert statuses == ["scheme", "blocked_host", "too_long", "session_id"]


def test_url_filter_host_with_port_and_empty(ray_session):
    # host extraction keeps the port (distinct origin) and an empty
    # blocklist never matches; empty input survives
    assert _run_filter(
        ["https://bad.example.com:8080/x.html"],
        blocked_hosts=("bad.example.com",),
    ) == ["ok"]
    assert _run_filter([], blocked_hosts=("b",)) == []


def test_normalize_text_kernels(ray_session):
    rows = {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(
            [
                "plain ascii text",
                "cafe\u0301 au lait",  # decomposed e + U+0301
                "a\x07b\tc\nd  e",              # control chars + runs
                "  padded  ",
            ],
            pa.string(),
        ),
    }
    out = (
        normalize_text(ray.data.from_arrow(pa.table(rows)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["norm_text"].tolist() == [
        "plain ascii text",
        "caf\u00e9 au lait",  # recomposed
        "a b c d e",
        "padded",
    ]
    assert out["changed"].tolist() == [0, 1, 1, 1]
    assert out["n_chars"].tolist() == [16, 12, 9, 6]


def test_normalize_text_idempotent(ray_session):
    src = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["  x \x1f y ", "étude"], pa.string()),
            }
        )
    )
    once = normalize_text(src).to_pandas().sort_values("doc_id")
    again = (
        normalize_text(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(once["doc_id"].tolist(), pa.int64()),
                        "text": pa.array(once["norm_text"].tolist(), pa.string()),
                    }
                )
            )
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert again["norm_text"].tolist() == once["norm_text"].tolist()
    assert again["changed"].tolist() == [0, 0]


def test_ngram_novelty_semantics(ray_session):
    from engine.stages.clean import ngram_novelty

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e",          # shares 'a b c'/'b c d' with doc1
                    "a b c d x",          # shares with doc0
                    "totally fresh unique words here",  # all novel
                    "tiny doc",           # < 3 tokens -> 0 grams
                ],
                pa.string(),
            ),
        }
    )
    for blocks in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        out = (
            ngram_novelty(ds, n=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_grams"].tolist() == [3, 3, 3, 0]
        # doc0: 'a b c','b c d' shared; 'c d e' unique -> 1/3
        assert out["uniq_grams"].tolist() == [1, 1, 3, 0]
        assert out["novelty_ppm"].tolist() == [333333, 333333, 1000000, 0]


def test_minhash_incremental_semantics(ray_session):
    from engine.stages.dedup import minhash_incremental

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sleepy badgers carefully audit forty two ancient parquet "
            "files beneath the humming data center floor every night")
    near = base.replace("night", "morning")
    indexed = pa.table(
        {
            "doc_id": pa.array([0, 2], pa.int64()),
            "text": pa.array([base, "completely different indexed corpus text "
                              "about sailing ships and navigation charts"], pa.string()),
        }
    )
    incoming = pa.table(
        {
            "doc_id": pa.array([1, 3, 5, 7], pa.int64()),
            "text": pa.array(
                [
                    near,  # near-dup of indexed doc 0 -> flagged
                    "fresh unrelated incoming document regarding culinary "
                    "techniques and pastry lamination schedules",
                    # 5 and 7 are near-dups of EACH OTHER but not of the
                    # index -> must NOT be flagged (index membership only)
                    "twin incoming document alpha beta gamma delta epsilon "
                    "zeta eta theta iota kappa",
                    "twin incoming document alpha beta gamma delta epsilon "
                    "zeta eta theta iota kappa!",
                ],
                pa.string(),
            ),
        }
    )
    for blocks in (1, 3):
        out = (
            minhash_incremental(
                ray.data.from_arrow(indexed).repartition(blocks),
                ray.data.from_arrow(incoming).repartition(blocks),
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 3, 5, 7]
        assert out["is_dup"].tolist() == [1, 0, 0, 0], out
        assert out.loc[0, "n_hit_bands"] >= 1


def test_url_filter_matches_python_oracle(ray_session):
    """Property test: the Arrow-kernel rule chain equals an independent
    per-row Python reimplementation on adversarial URL-ish strings."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    BLOCKED = {"bad.example.com", "evil.test"}
    SESSION = re.compile(
        r"[?&](sid|sessionid|phpsessid|jsessionid|cfid|cftoken)=", re.IGNORECASE
    )

    def oracle(u: str) -> str:
        if not re.match(r"^https?://", u):
            return "scheme"
        m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", u)
        if m and m.group(1) in BLOCKED:
            return "blocked_host"
        if len(u) > 64:
            return "too_long"
        if u.count("/") > 4 + 2:
            return "too_deep"
        if SESSION.search(u):
            return "session_id"
        if u.count("=") > 2:
            return "param_blowup"
        return "ok"

    frag = st.sampled_from(
        ["https://", "http://", "ftp://", "ok.site/", "bad.example.com/",
         "evil.test", "a/b/c/d/e/f/g", "?sid=1", "?a=1&b=2&c=3", "p" * 40,
         "?PHPSESSID=9", "#x", ":8080/", "//", "="]
    )
    urls_strategy = st.lists(
        st.lists(frag, min_size=1, max_size=6).map("".join), min_size=1, max_size=24
    )

    @settings(max_examples=25, deadline=None)
    @given(urls_strategy)
    def check(urls):
        got = _run_filter(
            urls, blocked_hosts=BLOCKED, max_len=64, max_depth=4, max_params=2
        )
        # _run_filter sorts by doc_id == input order
        assert got == [oracle(u) for u in urls]

    check()
