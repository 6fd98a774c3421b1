"""Unit tests for language detection and URL canonicalization/SURT."""

import pytest

from engine.canonicalize import canonicalize_url, host_of, surt, canonicalize_batch
from engine.lang import detect_fast


# ---- language id ----------------------------------------------------------

@pytest.mark.parametrize(
    "text,lang",
    [
        ("the quick brown fox is on the hill and it was fine for all of them", "en"),
        ("der hund und die katze sind nicht mit dem auto zu der stadt gefahren", "de"),
        ("le chat est dans la maison et il ne veut pas sortir avec les autres", "fr"),
        ("el perro y el gato son los animales más queridos en la casa del pueblo", "es"),
        ("il cane e il gatto sono gli animali che non vogliono stare nella casa", "it"),
    ],
)
def test_detect_known_languages(text, lang):
    assert detect_fast(text)[0] == lang


def test_detect_unknown_short_or_nonsense():
    assert detect_fast("xy")[0] == "unknown"
    assert detect_fast("zzz qqq xxx vvv kkk jjj www ppp mmm nnn bbb ccc")[0] == "unknown"
    assert detect_fast("")[0] == "unknown"
    assert detect_fast(None)[0] == "unknown"


def test_detect_deterministic():
    t = "the cat le chat der hund " * 5
    assert detect_fast(t) == detect_fast(t)


# ---- canonicalization -----------------------------------------------------

@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/a/b.html", "http://example.com/a/b.html"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/a/../b/./c.html", "https://example.com/b/c.html"),
        ("https://example.com//a///b", "https://example.com/a/b"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("https://example.com/a?", "https://example.com/a"),
        ("https://example.com/%7Euser/%3a", "https://example.com/~user/%3A"),
        ("https://example.com:8080/x", "https://example.com:8080/x"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"),  # query order kept
    ],
)
def test_canonicalize(raw, canon):
    assert canonicalize_url(raw) == canon


@pytest.mark.parametrize("bad", ["", "ftp://x.com/a", "mailto:a@b.c", "javascript:void(0)", "nota url"])
def test_canonicalize_rejects(bad):
    assert canonicalize_url(bad) is None


def test_surt():
    assert surt("https://www.example.com/a/b?x=1") == "com,example)/a/b?x=1"
    assert surt("http://sub.host.example.org/") == "org,example,host,sub)/"


def test_host_of():
    assert host_of("https://Sub.Example.com:8080/x") == "sub.example.com"


def test_canonicalize_batch_drops_bad():
    out = canonicalize_batch(["https://A.com/x", "ftp://bad", "https://b.org"])
    assert list(out["url"]) == ["https://a.com/x", "", "https://b.org/"]
    assert list(out["host"]) == ["a.com", "", "b.org"]
    assert out["url_hash"].dtype.name == "uint64"
