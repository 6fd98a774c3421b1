"""Unit tests for the HTML extraction oracle: one test per reference skip
rule and field-extractor branch (FIXTURES.md table; reference
/root/reference/warc_indexer/indexer/process.py:131-306,400-474)."""

import pytest

from engine import html_extract as hx
from engine.stages.extract import extract_page

FILLER = ("the and of to in is that it for with as was on are this word " * 20).strip()


def page(body: str, head: str = "<title>T</title>") -> bytes:
    return f"<html><head>{head}</head><body>{body}</body></html>".encode()


# ---- skip rules -----------------------------------------------------------

def test_skip_too_short():
    assert extract_page("u", b"<html><body>x</body></html>")["skip_reason"] == "too_short"


def test_skip_too_big():
    big = page("<p>" + "x" * (1024 * 1024 + 10) + "</p>")
    assert extract_page("u", big)["skip_reason"] == "too_big"


def test_skip_not_text():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 300
    assert extract_page("u", png)["skip_reason"] == "not_text"
    # trust_content_type bypasses the sniff (reference --trust-http-content-type)
    r = extract_page("u", png, trust_content_type=True)
    assert r["skip_reason"] != "not_text"


def test_skip_no_body():
    html = ("<html><head><title>T</title>" + "<!-- " + "pad " * 60 + "-->"
            "</head></html>").encode()
    assert extract_page("u", html)["skip_reason"] == "no_body"


def test_skip_replacement_chars():
    raw = ("<html><body><p>" + "a�b " * 80 + "</p></body></html>").encode(
        "utf-8").replace("�".encode(), b"\x81")
    assert extract_page("u", raw)["skip_reason"] == "replacement_chars"


def test_small_replacement_ratio_stripped():
    raw = ("<html><body><p>" + FILLER + " x�x</p></body></html>").encode(
        "utf-8").replace("�".encode(), b"\x81")
    r = extract_page("u", raw)
    assert r["skip_reason"] is None
    assert "�" not in r["full_body"]
    assert "  " not in r["full_body"]


def test_skip_main_too_short():
    html = page(f"<nav>{FILLER}</nav><main><p>tiny.</p></main>")
    assert extract_page("u", html)["skip_reason"] == "main_too_short"


def test_plain_text_passes():
    txt = (FILLER + " " + FILLER).encode()
    r = extract_page("u", txt)
    assert r["skip_reason"] is None
    assert r["http_content_type"] == "text/plain"
    assert r["lang"] == "en"


# ---- field extractors -----------------------------------------------------

def test_title_direct_and_ws_collapse():
    r = extract_page("u", page(f"<p>{FILLER}</p>", head="<title>  A\n  B  </title>"))
    assert r["title"] == "A B"


def test_title_fallback_chain():
    assert extract_page("u", page(f"<h1>H1 title</h1><p>{FILLER}</p>", head=""))["title"] == "H1 title"
    assert extract_page("u", page(f"<h2>H2 title</h2><p>{FILLER}</p>", head=""))["title"] == "H2 title"
    assert (
        extract_page("u", page(f'<div class="title">Cls title</div><p>{FILLER}</p>', head=""))["title"]
        == "Cls title"
    )


def test_meta_keywords_dedup_truncate_limit():
    kw = ", ".join(f"KeyWord {i % 10}" for i in range(40)) + ", " + "z" * 100
    head = f'<title>T</title><meta name="keywords" content="{kw}">'
    r = extract_page("u", page(f"<p>{FILLER}</p>", head=head))
    kws = r["meta_keywords"]
    assert len(kws) <= 30
    assert len(set(kws)) == len(kws)           # deduped
    assert all(k == k.lower() for k in kws)     # lowercased
    assert all(len(k) <= 80 for k in kws)       # truncated
    assert kws[0] == "keyword 0"                # order-preserving (deviation doc'd)


def test_meta_desc_truncated():
    head = '<title>T</title><meta name="description" content="' + "d " * 6000 + '">'
    r = extract_page("u", page(f"<p>{FILLER}</p>", head=head))
    assert len(r["meta_desc"]) <= 8192


def test_headings_from_body():
    html = page(f"<h1>One</h1><h2>Two</h2><h3>Three</h3><h4>Four</h4><p>{FILLER}</p>")
    r = extract_page("u", html)
    # h1..h3 only, document order, from <body> (reference .head quirk fixed)
    assert r["headings"] == ["One", "Two", "Three"]


def test_alt_texts_included():
    html = page(f'<p>{FILLER}</p><img src="x" alt="ALTTEXT">')
    r = extract_page("u", html)
    assert "ALTTEXT" in r["full_body"]


def test_main_content_prefers_main_tag():
    html = page(f"<nav>NAVWORD {FILLER}</nav><main><p>MAINWORD {FILLER}</p></main>")
    r = extract_page("u", html)
    assert "MAINWORD" in r["body"] and "NAVWORD" not in r["body"]
    assert "NAVWORD" in r["full_body"]  # full text keeps boilerplate


def test_main_content_excludes_boilerplate_without_main():
    html = page(f"<header>HEADW</header><p>BODYW {FILLER}</p><footer>FOOTW</footer>")
    r = extract_page("u", html)
    assert "BODYW" in r["body"]
    assert "HEADW" not in r["body"] and "FOOTW" not in r["body"]


def test_preserve_formatting_newlines():
    html = page(f"<h1>Top</h1><p>{FILLER}</p><p>second para {FILLER}</p>")
    r = extract_page("u", html)
    lines = r["body"].split("\n")
    assert lines[0] == "Top"
    assert len(lines) == 3
    assert "\n" not in r["full_body"]  # full text is collapsed single-line


def test_declared_charset_wins():
    raw = ('<html><head><meta charset="iso-8859-1"><title>T</title></head>'
           "<body><p>" + FILLER + " caf\xe9</p></body></html>").encode("latin-1")
    r = extract_page("u", raw)
    assert r["skip_reason"] is None
    assert "café" in r["full_body"]
    assert r["content_encoding"] == "iso-8859-1"


def test_encoding_detection_fallback():
    raw = ("<html><body><p>" + FILLER + " caf\xe9</p></body></html>").encode("latin-1")
    r = extract_page("u", raw)
    assert r["skip_reason"] is None
    assert "café" in r["full_body"]


def test_script_style_excluded():
    html = page(f"<script>var SCRIPTWORD=1;</script><style>.STYLEWORD{{}}</style><p>{FILLER}</p>")
    r = extract_page("u", html)
    assert "SCRIPTWORD" not in r["full_body"]
    assert "STYLEWORD" not in r["full_body"]


def test_links_extraction():
    html = page(f'<a href="/a.html">a</a><a href="https://x.com/b">b</a>'
                f'<a href="/a.html">dup</a><p>{FILLER}</p>')
    tree = hx.HTMLTree.parse(html.decode())
    assert hx.get_links(tree) == ["/a.html", "https://x.com/b"]


def test_oracle_determinism():
    html = page(f"<h1>T</h1><p>{FILLER}</p>")
    a = extract_page("https://e.com/x", html)
    b = extract_page("https://e.com/x", html)
    assert a == b


def test_inline_tags_do_not_split_words():
    """'auto<b>mat</b>ion' must extract as 'automation' (no injected space)."""
    html = page(f"<p>auto<b>mat</b>ion {FILLER}</p>")
    r = extract_page("u", html)
    assert "automation" in r["full_body"]
    assert "auto mat ion" not in r["full_body"]


def test_unclosed_head_element_does_not_swallow_body():
    html = (f"<html><head><title>Foo</head><body><p>{FILLER}</p></body></html>").encode()
    r = extract_page("u", html)
    assert r["skip_reason"] is None
    assert "the and of" in r["full_body"]
    assert r["title"] == "Foo"


def test_whitespace_only_heading_falls_through():
    html = page(f"<h1>  </h1><h2>Actual</h2><p>{FILLER}</p>", head="")
    assert extract_page("u", html)["title"] == "Actual"


def test_body_keeps_replacement_chars_like_reference():
    """Reference gates/stores main content RAW (process.py:272-275): U+FFFD
    is stripped from full text only."""
    raw = ("<html><body><main><p>" + FILLER + " x�x</p></main></body></html>").encode(
        "utf-8").replace("�".encode(), b"\x81")
    r = extract_page("u", raw)
    assert r["skip_reason"] is None
    assert "�" in r["body"]
    assert "�" not in r["full_body"]


def test_fast_tokenizer_matches_stdlib(fixture_dir):
    """The fast regex tokenizer must build the IDENTICAL tree to stdlib
    html.parser on every fixture page and the synthetic corpus — these are
    the corpora that define extraction conformance."""
    import os

    import pyarrow.parquet as pq

    import engine.html_extract as hx
    from engine.pipelines.testdata_pages import build_link_maps, synth_pages_batch

    def tree_sig(tree):
        def node_sig(n):
            return (n.tag, tuple(sorted(n.attrs.items())), n.text,
                    tuple(node_sig(c) for c in n.children))
        return (node_sig(tree.head) if tree.head else None,
                node_sig(tree.body) if tree.body else None)

    def parse_with(s, fast):
        b = hx._TreeBuilder()
        try:
            if fast:
                hx._fast_feed(s, b)
            else:
                b.feed(s)
                b.close()
        except Exception:
            pass
        return b.tree()

    t = pq.read_table(
        os.path.join(fixture_dir, "pages.parquet"), columns=["html"]
    )
    htmls = [h for h in t.column("html").to_pylist() if h]
    d = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    lm, i2s = build_link_maps("/root/testdata/sf0.001")
    htmls += synth_pages_batch(d, lm, i2s).column("html").to_pylist()

    assert len(htmls) > 1000
    for h in htmls:
        enc = hx.declared_charset(h) or hx.detect_encoding(h)
        s = hx.bytes_to_str(h, enc)
        assert tree_sig(parse_with(s, True)) == tree_sig(parse_with(s, False))


def test_fast_tokenizer_marked_section_edges():
    """Marked-section edge cases (ADVICE r2): ']]>' close skipping an inner
    ']>', MS-Office ']>' close for if/endif, truncated sections, unknown
    keywords — fast tree must equal the stdlib tree on each."""
    import engine.html_extract as hx

    def tree_sig(tree):
        def node_sig(n):
            return (n.tag, tuple(sorted(n.attrs.items())), n.text,
                    tuple(node_sig(c) for c in n.children))
        return (node_sig(tree.head) if tree.head else None,
                node_sig(tree.body) if tree.body else None)

    def parse_with(s, fast):
        b = hx._TreeBuilder()
        try:
            if fast:
                hx._fast_feed(s, b)
            else:
                b.feed(s)
                b.close()
        except Exception:
            pass
        return b.tree()

    cases = [
        "<body><p>a<![CDATA[x]>skipped]]>b</p></body>",
        "<body><p><![if !IE]>x<![endif]>done</p></body>",
        "<body><p><![cdata[low]]>tail</p></body>",
        "<body><p><![CDATA[a]] >b</p></body>",
        "<body><p><![if gt]  >z</p></body>",
        "<body><p>t<![CDATA[unterminated <b>x</p></body>",
        "<body><p>t<![unknownkw]>rest</p></body>",
        "<body><p>t<![ bogus]>rest</p></body>",
        "<body><p>t<![</p></body>",
        "<body><p>t<![CDATA</p></body>",
    ]
    for s in cases:
        assert tree_sig(parse_with(s, True)) == tree_sig(parse_with(s, False)), s


def test_get_document_canonical_edges():
    """rel token matching, first-wins, trimming, absent-head fallback."""
    from engine.html_extract import HTMLTree, get_document_canonical

    t = HTMLTree.parse(
        '<html><head><link rel="stylesheet" href="/s.css">'
        '<link rel="CANONICAL alternate" href="  https://a.com/x  ">'
        '<link rel="canonical" href="https://a.com/second">'
        "</head><body></body></html>"
    )
    assert get_document_canonical(t) == "https://a.com/x"  # first + tokens
    assert get_document_canonical(HTMLTree.parse("<p>no head</p>")) == ""
    assert (
        get_document_canonical(
            HTMLTree.parse('<head><link rel="alternate" href="/y"></head>')
        )
        == ""
    )


def test_get_meta_robots_resolution():
    """Multiple tags union (most-restrictive wins), 'none' expansion,
    case/whitespace tolerance, grant tokens restrict nothing."""
    from engine.html_extract import HTMLTree, get_meta_robots

    t = HTMLTree.parse(
        '<html><head><meta name="ROBOTS" content=" NoIndex , follow ">'
        '<meta name="robots" content="noarchive">'
        '<meta name="description" content="nofollow"></head><body></body></html>'
    )
    f = get_meta_robots(t)
    assert f == {
        "noindex": True, "nofollow": False, "noarchive": True,
        "nosnippet": False,
    }
    f = get_meta_robots(
        HTMLTree.parse('<head><meta name="robots" content="NONE"></head>')
    )
    assert f["noindex"] and f["nofollow"]
    assert not f["noarchive"] and not f["nosnippet"]
    f = get_meta_robots(
        HTMLTree.parse(
            '<head><meta name="robots" content="all, index, follow"></head>'
        )
    )
    assert not any(f.values())
    assert not any(get_meta_robots(HTMLTree.parse("<p>no head</p>")).values())


def test_get_hreflang_alternates_edges():
    """rel token matching, lang lowercasing, missing-attr drops, order."""
    from engine.html_extract import HTMLTree, get_hreflang_alternates

    t = HTMLTree.parse(
        '<html><head>'
        '<link rel="ALTERNATE stylesheet" hreflang="EN-GB" href=" /en ">'
        '<link rel="alternate" hreflang="de" href="https://a.com/de">'
        '<link rel="stylesheet" hreflang="fr" href="/decoy.css">'
        '<link rel="alternate" href="/no-lang">'
        '<link rel="alternate" hreflang="es">'
        "</head><body></body></html>"
    )
    assert get_hreflang_alternates(t) == [
        ("en-gb", "/en"), ("de", "https://a.com/de"),
    ]
    assert get_hreflang_alternates(HTMLTree.parse("<p>x</p>")) == []
