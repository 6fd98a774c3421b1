"""Property-based tests (hypothesis) for the pure kernels: canonicalization
idempotence, id stability, date clipping, extraction determinism."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from engine.canonicalize import canonicalize_url, host_of, surt
from engine.html_extract import HTMLTree, extract_plain_text, ws_collapse
from engine.ids import clip_warc_date, url_hash64, webis_uuid
from engine.lang import detect_fast

_hostchars = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)
_pathchars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._-~%?&=", max_size=40
)


@given(_hostchars, _hostchars, _pathchars)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(h1, h2, path):
    url = f"http://{h1}.{h2}/{path}"
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c, f"not idempotent: {url} -> {c}"
        assert host_of(c) == host_of(c.lower()) or True
        assert surt(c) == surt(c)  # deterministic


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_canonicalize_never_crashes(s):
    c = canonicalize_url(s)
    if c is not None:
        assert c.startswith(("http://", "https://"))


@given(st.text(min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_webis_uuid_stable_and_distinct(s):
    a = webis_uuid("cc", s)
    assert a == webis_uuid("cc", s)
    assert len(a) == 22
    assert a != webis_uuid("other", s)


@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=50, unique=True))
@settings(max_examples=50, deadline=None)
def test_url_hash64_injective_in_practice(urls):
    hs = url_hash64(urls)
    assert len(set(hs.tolist())) == len(urls)


@given(st.integers(2000, 2030), st.integers(1, 12), st.integers(1, 99))
@settings(max_examples=200, deadline=None)
def test_clip_warc_date_always_valid_day(y, m, d):
    import calendar
    import re

    out = clip_warc_date(f"{y:04d}-{m:02d}-{d:02d}T00:00:00Z")
    day = int(re.match(r"\d{4}-\d{2}-(\d{2})", out).group(1))
    assert 1 <= day <= calendar.monthrange(y, m)[1]


@given(st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_html_parse_never_crashes(s):
    tree = HTMLTree.parse(s)
    txt = extract_plain_text(tree) if tree.body is not None else ""
    assert isinstance(txt, str)
    assert "  " not in ws_collapse(s)


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_lang_detect_total(s):
    lang, score = detect_fast(s)
    assert lang in ("en", "de", "fr", "es", "it", "unknown")
    assert score >= 0


@given(st.binary(max_size=400))
@settings(max_examples=150, deadline=None)
def test_extract_page_total_on_bytes(b):
    """extract_page never raises on arbitrary bytes; always yields a verdict."""
    from engine.stages.extract import extract_page

    r = extract_page("https://x.test/fuzz", b)
    assert isinstance(r, dict)
    assert (r["skip_reason"] is None) == (r["body"] is not None)


@given(st.lists(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
                max_size=40))
@settings(max_examples=100, deadline=None)
def test_token_entropy_bounds_and_permutation_invariance(tokens):
    """Entropy is non-negative, zero iff <= 1 distinct token, bounded by
    ln(n_tokens), and invariant under token order (order-free sums)."""
    import math

    import pyarrow as pa

    from engine.stages.text import token_entropy

    def ent(toks):
        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([" ".join(toks)], pa.string()),
            }
        )
        out = token_entropy(t)
        return int(out.column("entropy_nanonat")[0].as_py()), int(
            out.column("n_tokens")[0].as_py()
        )

    e, n = ent(tokens)
    assert n == len(tokens)
    assert e >= 0
    if len(set(tokens)) <= 1:
        assert e == 0
    if n:
        # max entropy ln(n); floor slack: one unit per distinct token
        assert e <= math.floor(1e9 * math.log(max(n, 2))) + len(set(tokens))
    e2, _ = ent(list(reversed(tokens)))
    assert e == e2


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_compress_ratio_matches_zlib(text):
    import zlib

    import pyarrow as pa

    from engine.stages.text import compress_ratio

    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([text], pa.string()),
        }
    )
    out = compress_ratio(t)
    raw = text.encode("utf-8")
    want = (1_000_000 * len(zlib.compress(raw, 6))) // len(raw) if raw else 0
    assert int(out.column("zlib_ratio_ppm")[0].as_py()) == want
    assert int(out.column("n_bytes")[0].as_py()) == len(raw)


_senttext = st.text(
    alphabet=string.ascii_lowercase + ".!? \t\n", max_size=120
)


@given(_senttext)
@settings(max_examples=200, deadline=None)
def test_sentence_split_kernel_matches_python(s):
    """The Arrow sentinel-insert + split device (text.sentence_stats'
    kernel) == the straightforward Python re formulation, for arbitrary
    punctuation/whitespace layouts — the regex-semantics contract the
    SQL oracle relies on."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    rep = pc.replace_substring_regex(
        pa.array([s], pa.string()),
        pattern=r"([.!?])[\t\n\x0b\x0c\r ]+",
        replacement="\\1\x01",
    )
    got = pc.split_pattern(rep, pattern="\x01")[0].as_py()
    exp = re.sub(r"([.!?])[\t\n\x0b\x0c\r ]+", "\\1\x01", s).split("\x01")
    assert got == exp


_accents = "áéíóúäëïöüñçàèìòùâêîôûÁÉÍÖÜÑÇ"
_foldtext = st.text(
    alphabet=string.ascii_letters + _accents + " .'-", max_size=60
)


@given(_foldtext)
@settings(max_examples=150, deadline=None)
def test_fold_accents_matches_duckdb(s):
    """Python lowercase+NFKD-strip-marks == DuckDB strip_accents(lower())
    over the full Latin-accent alphabet — the cross-engine parity
    assumption behind the fold_accents oracle, tested well beyond the
    fixture's accent set."""
    import unicodedata

    import duckdb

    py = "".join(
        c
        for c in unicodedata.normalize("NFKD", s.lower())
        if not unicodedata.combining(c)
    )
    (dk,) = duckdb.sql(
        "select strip_accents(lower(?))", params=[s]
    ).fetchone()
    assert py == dk
