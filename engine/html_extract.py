"""Deterministic pure-Python HTML -> text extraction: the engine's oracle.

The reference delegates to Resiliparse C extensions (HTMLTree.parse,
extract_plain_text, detect_encoding, detect_mime --
/root/reference/warc_indexer/indexer/process.py:237-306).  Those libraries are
not available here, so this module reimplements the *semantics* the pipeline
needs on stdlib ``html.parser``:

- a DOM-lite tree with head/body resolution;
- ``extract_plain_text`` with the two flag combinations the reference uses:
  full text (alt_texts=True, preserve_formatting=False, process.py:260) and
  main content (main_content=True, alt_texts=True, preserve_formatting=True,
  list_bullets=False, process.py:272-273);
- title / meta-description / meta-keywords / headings field extractors
  (process.py:400-474);
- MIME sniffing and encoding detection stand-ins (process.py:211,247-252).

This single-threaded implementation IS the specification: fixture ``text``
columns are generated with it, and the distributed pipeline must reproduce it
byte-for-byte per URL (BASELINE.json input_hint).  It therefore avoids any
ambient state, hash ordering, or locale dependence.

Parsing runs on a fast regex tokenizer (``_fast_feed``) that drives the
same tree-builder callbacks ~2x faster than stdlib html.parser; verified
tree-equivalent on every fixture page and the synthetic corpus
(tests/test_extract.py::test_fast_tokenizer_matches_stdlib).  On TRUNCATED
markup it follows the HTML5 rules where stdlib has quirks: an unterminated
comment spans to EOF (stdlib leaks the raw ``<!--…`` prefix into body
text), and an unterminated <script> keeps its raw text inside the script
node (invisible to extraction — script is non-content either way).  Set
RAYCRAWL_STDLIB_PARSER=1 to A/B against the stdlib path.

Documented deviations from the reference (SURVEY.md §7.3):
- keyword dedup is order-preserving (``dict.fromkeys``), where the reference's
  ``set()`` is nondeterministic (process.py:459);
- headings are extracted from <body>, fixing the reference quirk of querying
  ``tree.head`` (process.py:473) which virtually always yields [];
- "main content" is a deterministic structural heuristic (first
  <main>/<article>, else body minus nav/header/footer/aside/form/script-ish
  subtrees) standing in for Resiliparse's ML-ish heuristics.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, Iterable, List, Optional, Tuple

WS_REGEX = re.compile(r"\s+")
MULTI_SPACE_REGEX = re.compile(r"\s{2,}")

MAX_DOCUMENT_SIZE = 1024 * 1024  # reference index.py:113-114 / process.py:46
MIN_DOCUMENT_SIZE = 200          # reference process.py:173-174
MIN_MAIN_CONTENT = 200           # codepoints, reference process.py:274-275
MAX_REPLACEMENT_RATIO = 0.1      # reference process.py:264-266

TEXT_MIME_TYPES = ("text/html", "application/xhtml+xml", "text/plain")

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Subtrees that never contribute text.
NON_CONTENT = frozenset(
    "script style noscript template iframe svg object head title".split()
)
# Subtrees additionally excluded in main-content mode.
BOILERPLATE = frozenset("nav header footer aside form".split())
HEAD_ONLY = frozenset("title meta link style base".split())
BLOCK_ELEMENTS = frozenset(
    (
        "address article aside blockquote details dialog dd div dl dt fieldset "
        "figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr li "
        "main nav ol p pre section table tbody td th thead tr ul br caption"
    ).split()
)


def ws_collapse(text: str) -> str:
    """Collapse whitespace runs to one space and trim (process.py:392-397)."""
    return WS_REGEX.sub(" ", text).strip()


# --------------------------------------------------------------------------
# MIME sniffing / encoding detection (stand-ins for resiliparse.parse)
# --------------------------------------------------------------------------

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"OggS", "application/ogg"),
    (b"RIFF", "audio/wave"),
    (b"\x00\x00\x00", "application/octet-stream"),  # mp4-ish / binary
]

_HTML_HINT = re.compile(
    rb"^\s*(?:<!doctype\s+html|<html|<head|<body|<!--|<\?xml|<title|<meta|<div|<p[\s>]|<h1)",
    re.IGNORECASE,
)


def detect_mime(content: bytes) -> str:
    """Magic-byte MIME sniff (stand-in for resiliparse detect_mime).

    Only needs to separate text-ish payloads from binary ones for the
    whitelist check at process.py:247-250.
    """
    head = content[:1024]
    for magic, mime in _MAGIC:
        if head.startswith(magic):
            return mime
    if _HTML_HINT.match(head):
        return "text/html"
    sample = head[:512]
    if not sample:
        return "application/octet-stream"
    # Printable-ratio heuristic for plain text.
    printable = sum(1 for b in sample if 32 <= b < 127 or b in (9, 10, 13))
    if b"\x00" in sample or printable / len(sample) < 0.8:
        return "application/octet-stream"
    if b"<" in sample and b">" in sample:
        return "text/html"
    return "text/plain"


def detect_encoding(content: bytes) -> str:
    """BOM / UTF-8-validity heuristic (stand-in for resiliparse detect_encoding)."""
    if content.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if content.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    try:
        content.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)


def declared_charset(content: bytes) -> Optional[str]:
    """Charset from a <meta charset=...> tag, if any (http_charset analog)."""
    m = _META_CHARSET.search(content[:4096])
    if m:
        try:
            cs = m.group(1).decode("ascii").lower()
            "".encode(cs)  # validate codec exists
            return cs
        except (LookupError, UnicodeDecodeError):
            return None
    return None


def bytes_to_str(content: bytes, encoding: str) -> str:
    """Decode with replacement, like resiliparse bytes_to_str (lossy-safe)."""
    try:
        return content.decode(encoding, errors="replace")
    except LookupError:
        return content.decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# DOM-lite
# --------------------------------------------------------------------------


class Node:
    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag: str, attrs: Optional[Dict[str, str]] = None):
        self.tag = tag
        self.attrs: Dict[str, str] = attrs or {}
        self.children: List["Node"] = []
        self.text: Optional[str] = None  # set only for text nodes (tag == "#text")

    # -- queries ------------------------------------------------------------
    def iter(self) -> Iterable["Node"]:
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed(n.children))

    def find_first(self, tags: frozenset | set | Tuple[str, ...]) -> Optional["Node"]:
        for n in self.iter():
            if n.tag in tags:
                return n
        return None

    def find_all(self, tags) -> List["Node"]:
        return [n for n in self.iter() if n.tag in tags]

    def find_class(self, cls: str) -> Optional["Node"]:
        for n in self.iter():
            if cls in n.attrs.get("class", "").split():
                return n
        return None

    def find_meta(self, name: str) -> Optional["Node"]:
        for n in self.iter():
            if n.tag == "meta" and n.attrs.get("name", "").lower() == name:
                return n
        return None

    def text_content(self) -> str:
        parts: List[str] = []
        for n in self.iter():
            if n.tag == "#text" and n.text:
                parts.append(n.text)
        return "".join(parts)


class HTMLTree:
    """Parsed document with resolved head/body (resiliparse HTMLTree analog)."""

    def __init__(self, head: Optional[Node], body: Optional[Node]):
        self.head = head
        self.body = body

    @property
    def title(self) -> str:
        if self.head is None:
            return ""
        t = self.head.find_first(("title",))
        return t.text_content() if t is not None else ""

    @staticmethod
    def parse(html: str) -> "HTMLTree":
        parser = _TreeBuilder()
        try:
            if _USE_STDLIB_PARSER:
                parser.feed(html)
                parser.close()
            else:
                _fast_feed(html, parser)
        except Exception:
            pass  # tolerate any parser hiccup; keep what was built
        return parser.tree()


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder with implicit head/body placement.

    Head-only tags seen before body content go to the synthetic <head>;
    everything else goes to <body>.  Explicit <head>/<body> tags switch
    context.  Stray close tags and unclosed elements are tolerated (stack
    unwinds to the nearest matching open element, else the tag is ignored).
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.head = Node("head")
        self.body = Node("body")
        self._saw_body_tag = False
        self._saw_body_content = False
        self._in_head_elem = False
        self._stack: List[Node] = []  # open element stack (content nodes)

    # -- helpers -------------------------------------------------------------
    def _target(self) -> Node:
        if self._stack:
            return self._stack[-1]
        return self.head if self._in_head_elem else self.body

    def _append(self, node: Node, head_ok: bool) -> None:
        if self._stack:
            self._stack[-1].children.append(node)
        elif self._in_head_elem or (
            head_ok and not self._saw_body_content and not self._saw_body_tag
        ):
            self.head.children.append(node)
        else:
            self.body.children.append(node)
            if node.tag != "#text" or (node.text or "").strip():
                self._saw_body_content = True

    # -- HTMLParser hooks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            return
        if tag == "head":
            self._in_head_elem = True
            return
        if tag == "body":
            self._saw_body_tag = True
            self._in_head_elem = False
            return
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        if tag in VOID_ELEMENTS:
            self._append(node, head_ok=tag in HEAD_ONLY)
            return
        self._append(node, head_ok=tag in HEAD_ONLY)
        self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if tag in ("html", "head", "body"):
            return
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._append(node, head_ok=tag in HEAD_ONLY)

    def handle_endtag(self, tag):
        if tag in ("head", "html", "body"):
            # structural close implicitly closes any still-open elements —
            # otherwise an unclosed head element (e.g. <title> without
            # </title>) would swallow the entire body as its text
            self._stack.clear()
            self._in_head_elem = False
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray close tag: ignore

    def handle_data(self, data):
        if not data:
            return
        node = Node("#text")
        node.text = data
        if self._stack:
            self._stack[-1].children.append(node)
        elif self._in_head_elem:
            self.head.children.append(node)
        else:
            if data.strip():
                self._saw_body_content = True
                self.body.children.append(node)

    def tree(self) -> HTMLTree:
        body: Optional[Node] = self.body
        if not self._saw_body_tag and not self._saw_body_content:
            body = None  # "no <body>" skip, process.py:257-258
        return HTMLTree(self.head, body)


# --------------------------------------------------------------------------
# Fast tokenizer
# --------------------------------------------------------------------------
#
# stdlib html.parser spends ~60% of extraction wall time in per-character
# bookkeeping (goahead/updatepos/interesting-regex scanning).  This regex
# tokenizer drives the SAME _TreeBuilder callbacks ~2-3x faster and mirrors
# html.parser's tolerant behavior for the corpus classes the engine sees
# (verified tree-equivalent on every fixture page and the synthetic corpus
# by tests/test_extract.py::test_fast_tokenizer_matches_stdlib).  The
# stdlib path is kept behind RAYCRAWL_STDLIB_PARSER=1 for A/B checks.

import os as _os

_USE_STDLIB_PARSER = _os.environ.get("RAYCRAWL_STDLIB_PARSER", "") == "1"

# one tag: optional '/', name, quote-aware attr blob, '>'
# marked-section scanning, mirroring _markupbase: keyword per _scan_name's
# declname pattern; two close forms (']]>' standard, ']>' for MS if/else/endif)
_MS_KEYWORD = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*")
_MS_CLOSE_LONG = re.compile(r"]\s*]\s*>")
_MS_CLOSE_SHORT = re.compile(r"]\s*>")

from html import unescape as _unescape

_FAST_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>"
)
_FAST_ATTR = re.compile(
    r"([^\s/=>]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?"
)
_AMP = "&"


def _fast_attrs(blob: str) -> Tuple[Dict[str, str], bool]:
    """Parse an attr blob; returns (attrs, self_closing).

    Self-closing mirrors html.parser: the tag is self-closing iff a ``/``
    remains AFTER attribute consumption — a trailing ``/`` of an unquoted
    attribute VALUE (``href=http://x.com/``) is part of the value, while a
    ``/`` after a bare attribute name or quoted value (``disabled/``,
    ``src="x"/``) closes the tag (attr names cannot contain ``/``).
    """
    attrs: Dict[str, str] = {}
    last_end = 0
    for m in _FAST_ATTR.finditer(blob):
        last_end = m.end()
        name = m.group(1).lower()
        v = m.group(2)
        if v is None:
            val = ""
        else:
            if v[:1] in ("'", '"'):
                v = v[1:-1]
            val = _unescape(v) if _AMP in v else v
        # last occurrence wins — matches what the builder's dict() over
        # html.parser's attr list produces for duplicate attributes
        attrs[name] = val
    self_closing = blob[last_end:].strip() == "/"
    return attrs, self_closing


def _fast_feed(html: str, b: "_TreeBuilder") -> None:
    """Tokenize ``html`` and drive the builder's handle_* callbacks.

    Mirrors html.parser with convert_charrefs=True: text nodes are
    entity-unescaped, script/style content is raw text until the matching
    close tag, comments/doctypes/PIs are skipped, a '<' that opens nothing
    recognizable is literal text.
    """
    n = len(html)
    pos = 0
    find = html.find
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                text = html[pos:]
                b.handle_data(_unescape(text) if _AMP in text else text)
            break
        if lt > pos:
            text = html[pos:lt]
            b.handle_data(_unescape(text) if _AMP in text else text)
        # at '<'
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            elif html.startswith("<![", lt):
                # marked section: mirror _markupbase.parse_marked_section —
                # cdata/rcdata/ignore/include/temp close at ']\s*]\s*>' (so
                # '<![CDATA[a]>b]]>' skips past 'b]]>'), the MS-Office
                # if/else/endif keywords close at ']\s*>', an unknown
                # keyword aborts the parse (stdlib raises through error();
                # parse() swallows it, keeping the tree built so far), and
                # an unterminated/truncated section emits RAW data up to
                # and including the next '>' (goahead's end-of-feed path).
                mkw = _MS_KEYWORD.match(html, lt + 3)
                close = None
                if mkw is not None and mkw.end() < n:
                    kw = mkw.group(0).lower()
                    if kw in ("if", "else", "endif"):
                        close = _MS_CLOSE_SHORT.search(html, lt + 3)
                    elif kw in ("temp", "cdata", "ignore", "include", "rcdata"):
                        close = _MS_CLOSE_LONG.search(html, lt + 3)
                    else:
                        raise ValueError(
                            f"unknown status keyword {kw!r} in marked section"
                        )
                elif mkw is None and lt + 3 < n:
                    # garbage after '<![' that can never become a keyword
                    raise ValueError("malformed marked section")
                if close is not None:
                    pos = close.end()
                else:
                    k = find(">", lt + 1)
                    if k < 0:
                        k = find("<", lt + 1)
                        if k < 0:
                            k = lt + 1
                    else:
                        k += 1
                    b.handle_data(html[lt:k])
                    pos = k
            else:
                end = find(">", lt + 2)  # doctype: skip
                pos = n if end < 0 else end + 1
            continue
        if nxt == "?":
            end = find(">", lt + 2)
            pos = n if end < 0 else end + 1
            continue
        m = _FAST_TAG.match(html, lt)
        if m is None:
            # '<' not opening a recognizable construct: literal text
            b.handle_data("<")
            pos = lt + 1
            continue
        closing, name, blob = m.group(1), m.group(2).lower(), m.group(3)
        pos = m.end()
        if closing:
            b.handle_endtag(name)
            continue
        if blob.strip(" /"):
            attrs, self_closing = _fast_attrs(blob)
            attrs_list = list(attrs.items())
        else:
            attrs_list = []
            self_closing = blob.strip().endswith("/")
        if self_closing:
            b.handle_startendtag(name, attrs_list)
            continue
        b.handle_starttag(name, attrs_list)
        if name in ("script", "style"):
            # raw-text mode until the close tag; like html.parser's cdata
            # regex (r'</\s*script'), whitespace after '/' and junk before
            # the final '>' are tolerated
            close = re.compile(rf"</\s*{name}", re.IGNORECASE)
            cm = close.search(html, pos)
            if cm is None:
                if pos < n:
                    b.handle_data(html[pos:])
                pos = n
            else:
                if cm.start() > pos:
                    b.handle_data(html[pos : cm.start()])
                b.handle_endtag(name)
                gt = find(">", cm.end())
                pos = n if gt < 0 else gt + 1


# --------------------------------------------------------------------------
# Plain-text extraction
# --------------------------------------------------------------------------


def _main_root(body: Node) -> Node:
    n = body.find_first(("main", "article"))
    return n if n is not None else body


def extract_plain_text(
    tree: HTMLTree,
    main_content: bool = False,
    alt_texts: bool = True,
    preserve_formatting: bool = False,
    list_bullets: bool = True,
) -> str:
    """Deterministic plain-text rendering of the document body.

    Mirrors the two call sites of resiliparse ``extract_plain_text`` in the
    reference (process.py:260 and :272-273); see module docstring for the
    exact flag semantics implemented here.
    """
    if tree.body is None:
        return ""
    root = _main_root(tree.body) if main_content else tree.body
    skip = NON_CONTENT | BOILERPLATE if main_content else NON_CONTENT

    lines: List[str] = []
    cur: List[str] = []

    def flush():
        if cur:
            # concatenate WITHOUT injected separators: inline elements must
            # not split words ('auto<b>mat</b>ion' -> 'automation'); word
            # boundaries come from the source text's own whitespace
            line = ws_collapse("".join(cur))
            if line:
                lines.append(line)
            cur.clear()

    def walk(node: Node, in_li: bool):
        for child in node.children:
            tag = child.tag
            if tag == "#text":
                if child.text and child.text.strip():
                    cur.append(child.text)
                continue
            if tag in skip:
                continue
            if alt_texts and tag in ("img", "area"):
                alt = child.attrs.get("alt", "").strip()
                if alt:
                    cur.append(" " + alt + " ")  # alt text is its own token
                continue
            if tag in BLOCK_ELEMENTS:
                flush()
                if tag == "li" and list_bullets:
                    cur.append("• ")
                walk(child, in_li or tag == "li")
                flush()
            else:
                walk(child, in_li)

    walk(root, False)
    flush()

    if preserve_formatting:
        return "\n".join(lines).strip()
    return ws_collapse(" ".join(lines))


# --------------------------------------------------------------------------
# Field extractors (reference process.py:400-474)
# --------------------------------------------------------------------------


def get_document_title(tree: HTMLTree) -> str:
    title = tree.title.strip()
    if title:
        return ws_collapse(title)
    if tree.body is None:
        return ""
    for tag in ("h1", "h2"):
        h = tree.body.find_first((tag,))
        if h is not None:
            txt = ws_collapse(h.text_content())
            if txt:  # whitespace-only headings must NOT mask later fallbacks
                return txt
    cls = tree.body.find_class("title")
    if cls is not None:
        return ws_collapse(cls.text_content())
    return ""


def get_document_meta_desc(tree: HTMLTree) -> str:
    if tree.head is None:
        return ""
    desc = tree.head.find_meta("description")
    if desc is None:
        return ""
    return ws_collapse(desc.attrs.get("content", ""))


def get_document_meta_keywords(tree: HTMLTree, max_len: int = 80, limit: int = 30) -> List[str]:
    if tree.head is None:
        return []
    kw = tree.head.find_meta("keywords")
    if kw is None:
        return []
    items = (ws_collapse(k)[:max_len].lower() for k in kw.attrs.get("content", "").split(","))
    return list(dict.fromkeys(items))[:limit]  # order-preserving dedup (deviation, see module doc)


def get_document_headings(tree: HTMLTree, max_level: int = 3) -> List[str]:
    if tree.body is None:
        return []
    tags = tuple(f"h{i}" for i in range(1, max_level + 1))
    return [ws_collapse(h.text_content()) for h in tree.body.find_all(tags)]


def get_document_canonical(tree: HTMLTree) -> str:
    """``<link rel="canonical" href=...>`` from head — the canonical-URL
    consolidation signal search engines honor for duplicate pages (new:
    no reference analog; the reference's ES mapping carries no canonical
    field).  First canonical link wins (browser/Google behavior); ``rel``
    matching is case-insensitive and TOKEN-based, so
    ``rel="canonical alternate"`` counts and ``rel="stylesheet"`` never
    does.  Raw href (trimmed); callers resolve relative references
    against the page URL.  Empty string when absent."""
    if tree.head is None:
        return ""
    for n in tree.head.find_all(("link",)):
        if "canonical" in n.attrs.get("rel", "").lower().split():
            return n.attrs.get("href", "").strip()
    return ""


_ROBOTS_DIRECTIVES = ("noindex", "nofollow", "noarchive", "nosnippet")


def get_meta_robots(tree: HTMLTree) -> dict:
    """Union of ``<meta name="robots">`` directives, most-restrictive
    wins across MULTIPLE tags (the documented Google/Bing resolution when
    a page carries several robots metas); ``none`` expands to
    noindex+nofollow; ``all``/``index``/``follow`` grant nothing (flags
    only restrict).  Directive tokens are comma-separated,
    case-insensitive, whitespace-trimmed.  New: no reference analog —
    the reference indexes every processed record unconditionally
    (`/root/reference/warc_indexer/indexer/process.py`); a polite
    indexer must honor these before the ES sink."""
    flags = {d: False for d in _ROBOTS_DIRECTIVES}
    if tree.head is None:
        return flags
    for n in tree.head.find_all(("meta",)):
        if n.attrs.get("name", "").strip().lower() != "robots":
            continue
        toks = {
            t.strip().lower() for t in n.attrs.get("content", "").split(",")
        }
        if "none" in toks:
            flags["noindex"] = flags["nofollow"] = True
        for d in _ROBOTS_DIRECTIVES:
            if d in toks:
                flags[d] = True
    return flags


def get_hreflang_alternates(tree: HTMLTree) -> List[tuple]:
    """(hreflang, href) pairs from ``<link rel="alternate" hreflang=...>``
    in document order — the multilingual-cluster signal (RFC 8288 link
    relation + Google's hreflang annotation).  ``rel`` is token-matched
    case-insensitively (``rel="alternate stylesheet"`` counts,
    ``rel="stylesheet"`` never does); entries missing either attribute
    drop; language codes lowercase (BCP 47 is case-insensitive), hrefs
    raw-trimmed for the caller to resolve."""
    if tree.head is None:
        return []
    out = []
    for n in tree.head.find_all(("link",)):
        if "alternate" not in n.attrs.get("rel", "").lower().split():
            continue
        lang = n.attrs.get("hreflang", "").strip().lower()
        href = n.attrs.get("href", "").strip()
        if lang and href:
            out.append((lang, href))
    return out


def get_anchor_rels(tree: HTMLTree) -> List[tuple]:
    """All (href, rel) pairs for ``<a href>`` in document order — link
    classification support (``rel`` lowercased raw token string, ""
    when absent).  Every occurrence counts, like ``get_anchors``."""
    if tree.body is None:
        return []
    return [
        (a.attrs["href"].strip(), a.attrs.get("rel", "").strip().lower())
        for a in tree.body.find_all(("a",))
        if a.attrs.get("href", "").strip()
    ]


def get_links(tree: HTMLTree) -> List[str]:
    """All <a href> values in document order (new: crawl link discovery).

    Raw hrefs; callers resolve relative references against the page URL and
    canonicalize.  Deduplicated order-preserving within the page.
    """
    if tree.body is None:
        return []
    hrefs = [
        a.attrs["href"].strip()
        for a in tree.body.find_all(("a",))
        if a.attrs.get("href", "").strip()
    ]
    return list(dict.fromkeys(hrefs))


def get_anchors(tree: HTMLTree) -> List[tuple]:
    """All (href, anchor_text) pairs in document order (anchor-text
    aggregation support; ``get_links`` keeps its dedup-href contract for
    crawl discovery).  Every occurrence counts — duplicate anchors are
    the signal, not noise — so no dedup here; text is ws_collapsed."""
    if tree.body is None:
        return []
    return [
        (a.attrs["href"].strip(), ws_collapse(a.text_content()))
        for a in tree.body.find_all(("a",))
        if a.attrs.get("href", "").strip()
    ]


def get_jsonld_blocks(tree: HTMLTree) -> List[str]:
    """Raw text of every ``<script type="application/ld+json">`` block
    (head or body; the parser keeps script bodies as #text children via
    raw-text mode) — the schema.org structured-data payload.  Type
    attribute matched case-insensitively and trimmed; other script types
    (javascript, importmap) are never returned.  New: no reference
    analog (the reference extracts no structured data)."""
    out: List[str] = []
    for root in (tree.head, tree.body):
        if root is None:
            continue
        for n in root.find_all(("script",)):
            if n.attrs.get("type", "").strip().lower() != "application/ld+json":
                continue
            txt = n.text_content().strip()
            if txt:
                out.append(txt)
    return out
