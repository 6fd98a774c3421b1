"""Deterministic synthetic conformance corpus (see FIXTURES.md).

The reference repo ships no tests (SURVEY.md §5), so this generator defines
the corpus: a Common-Crawl-style ``pages`` table (input_hint schema) with a
Zipf host distribution, an embedded link graph for frontier tests, one page
per reference skip rule / extractor branch, plus ``seeds``, ``politeness``
and ``lookups`` side tables.  The expected ``text``/``lang`` columns are
produced by the same single-threaded oracle the pipeline uses
(engine.stages.extract.extract_page), satisfying the byte-identical per-URL
invariant from BASELINE.json.

Everything is seeded (default 42); no wall clock, no network, no hash-order
dependence.  Generation is cached: a marker file records (n_pages, seed) and
matching directories are reused.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from engine.ids import webis_uuid
from engine.lang import _STOPWORDS  # deterministic word pools
from engine.stages.extract import extract_page

DOC_ID_PREFIX = "cc"
BASE_TS = dt.datetime(2023, 1, 1, 0, 0, 0)

_NOUNS = {
    "en": ["crawler", "engine", "dataset", "article", "research", "pipeline",
           "market", "science", "history", "network", "library", "garden"],
    "de": ["Rechner", "Maschine", "Datensatz", "Artikel", "Forschung",
           "Geschichte", "Netzwerk", "Bibliothek", "Garten", "Stadt"],
    "fr": ["moteur", "données", "article", "recherche", "histoire",
           "réseau", "bibliothèque", "jardin", "ville", "marché"],
    "es": ["motor", "datos", "artículo", "investigación", "historia",
           "red", "biblioteca", "jardín", "ciudad", "mercado"],
    "it": ["motore", "dati", "articolo", "ricerca", "storia",
           "rete", "biblioteca", "giardino", "città", "mercato"],
}
_LANGS = list(_NOUNS.keys())


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    pool = list(_STOPWORDS[lang]) * 2 + _NOUNS[lang]
    words = [rng.choice(pool) for _ in range(n_words)]
    return " ".join(words).capitalize() + "."


def _paragraphs(rng: random.Random, lang: str, n_para: int) -> List[str]:
    return [
        " ".join(_sentence(rng, lang, rng.randint(8, 18)) for _ in range(rng.randint(2, 5)))
        for _ in range(n_para)
    ]


def _hosts(n_hosts: int) -> List[str]:
    hosts = ["mega.example.com"]
    tlds = ["com", "org", "net", "io", "de"]
    for i in range(1, n_hosts):
        hosts.append(f"host{i:03d}.example.{tlds[i % len(tlds)]}")
    return hosts


def _page_html(
    rng: random.Random,
    lang: str,
    title: str,
    links: List[str],
    n_para: int = 4,
    keywords: Optional[str] = None,
    desc: Optional[str] = None,
    extra_head: str = "",
    extra_body: str = "",
) -> str:
    paras = _paragraphs(rng, lang, n_para)
    kw = keywords if keywords is not None else ", ".join(
        rng.sample(_NOUNS[lang], k=min(4, len(_NOUNS[lang])))
    )
    de = desc if desc is not None else _sentence(rng, lang, 12)
    nav = "".join(f'<a href="{u}">link</a> ' for u in links)
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    h2 = _sentence(rng, lang, 4).rstrip(".")
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{de}">'
        f'<meta name="keywords" content="{kw}">'
        f"{extra_head}"
        "</head><body>"
        f"<nav>{nav}</nav>"
        f"<article><h1>{title}</h1><h2>{h2}</h2>{body_paras}{extra_body}</article>"
        "<footer>© example corp</footer>"
        "</body></html>"
    )


def _edge_case_pages(rng: random.Random, host: str) -> List[Tuple[str, bytes]]:
    """One (url, html_bytes) per reference skip rule / extractor branch."""
    base = f"https://{host}"
    en = "en"
    filler = " ".join(_paragraphs(rng, en, 4))
    pages: List[Tuple[str, bytes]] = []

    pages.append((f"{base}/edge/too-short.html",
                  b"<html><body><p>tiny</p></body></html>"))
    pages.append((f"{base}/edge/too-big.html",
                  b"<html><body><p>" + b"x" * (1024 * 1024 + 64) + b"</p></body></html>"))
    pages.append((f"{base}/edge/not-text.png",
                  b"\x89PNG\r\n\x1a\n" + bytes(rng.getrandbits(8) for _ in range(512))))
    pages.append((f"{base}/edge/plain.txt",
                  (filler + " " + filler).encode("utf-8")))
    pages.append((f"{base}/edge/no-body.html",
                  ("<html><head><title>Nothing here</title>"
                   + '<meta name="description" content="' + "pad " * 64 + '">'
                   + "</head></html>").encode()))
    # >10% replacement chars: bytes undefined in cp1252 (0x81) decode to U+FFFD.
    bad = ("<html><body><p>" + "ab�XY " * 60 + "</p></body></html>").encode(
        "utf-8").replace("�".encode(), b"\x81")
    pages.append((f"{base}/edge/mojibake.html", bad))
    # small replacement ratio: mostly clean text, a few bad bytes.
    mostly = ("<html><body><p>" + filler + " Q�Q</p></body></html>").encode(
        "utf-8").replace("�".encode(), b"\x81")
    pages.append((f"{base}/edge/few-bad-bytes.html", mostly))
    pages.append((
        f"{base}/edge/main-too-short.html",
        ("<html><body><nav>" + filler + "</nav>"
         "<main><p>short main.</p></main></body></html>").encode(),
    ))
    pages.append((
        f"{base}/edge/title-from-h1.html",
        ("<html><head></head><body><h1>Heading One Title</h1><p>"
         + filler + "</p></body></html>").encode(),
    ))
    pages.append((
        f"{base}/edge/title-from-h2.html",
        ("<html><head></head><body><h2>Heading Two Title</h2><p>"
         + filler + "</p></body></html>").encode(),
    ))
    pages.append((
        f"{base}/edge/title-from-class.html",
        ('<html><head></head><body><div class="title">Classy Title</div><p>'
         + filler + "</p></body></html>").encode(),
    ))
    many_kw = ", ".join(f"Keyword {i % 17}" for i in range(45)) + ", " + "k" * 120
    pages.append((
        f"{base}/edge/many-keywords.html",
        _page_html(rng, en, "Keyword stress", [], keywords=many_kw).encode(),
    ))
    pages.append((
        f"{base}/edge/long-desc.html",
        _page_html(rng, en, "Long description", [], desc="d " * 6000).encode(),
    ))
    pages.append((
        f"{base}/edge/query.html?b=2&a=1",
        _page_html(rng, en, "Query string page", []).encode(),
    ))
    latin = _page_html(rng, "fr", "Café français — résumé", [],
                       extra_body="<p>déjà vu, garçon, crème brûlée, très élégant.</p>")
    pages.append((f"{base}/edge/latin1.html", latin.encode("latin-1", errors="ignore")))
    decl = ('<html><head><meta charset="iso-8859-1"><title>Declared charset</title>'
            "</head><body><p>" + filler + " café résumé</p></body></html>")
    pages.append((f"{base}/edge/declared-charset.html",
                  decl.encode("latin-1", errors="ignore")))
    pages.append((
        f"{base}/edge/alt-text.html",
        ("<html><body><p>" + filler + '</p><img src="x.png" alt="an informative alt text">'
         "</body></html>").encode(),
    ))
    pages.append((
        f"{base}/edge/lists.html",
        ("<html><body><main><ul><li>first item</li><li>second item</li></ul><p>"
         + filler + "</p></main></body></html>").encode(),
    ))
    return pages


def _oracle_fingerprint() -> str:
    """Hash of the oracle source files: expected text/lang columns go stale
    whenever extraction/lang semantics change, so the cache key must change
    with them (no manual version bump to forget)."""
    import hashlib

    import engine.html_extract as _hx
    import engine.lang as _lg
    import engine.stages.extract as _ex

    h = hashlib.blake2b(digest_size=8)
    for mod in (_hx, _lg, _ex):
        h.update(open(mod.__file__, "rb").read())
    return h.hexdigest()


def generate(
    out_dir: str,
    n_pages: int = 1000,
    seed: int = 42,
    n_hosts: int = 30,
) -> str:
    """Generate the corpus into ``out_dir``; cached on (params, oracle hash).

    Concurrency-safe: an exclusive flock guards check+regenerate, and the
    validity marker is removed BEFORE any file is rewritten (an interrupted
    regeneration must not leave a stale marker over mixed-generation data).
    """
    import fcntl

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_FIXTURE_OK.json")
    params = {
        "n_pages": n_pages,
        "seed": seed,
        "n_hosts": n_hosts,
        "oracle": _oracle_fingerprint(),
    }
    lock = open(os.path.join(out_dir, ".lock"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX)
    try:
        if os.path.exists(marker):
            try:
                if json.load(open(marker)) == params:
                    return out_dir
            except Exception:
                pass
            os.remove(marker)
        return _generate_locked(out_dir, marker, params, n_pages, seed, n_hosts)
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()


def _generate_locked(out_dir, marker, params, n_pages, seed, n_hosts) -> str:
    rng = random.Random(seed)
    hosts = _hosts(n_hosts)

    # Zipf-ish host assignment: host rank r gets weight 1/(r+1).
    weights = [1.0 / (r + 1) for r in range(len(hosts))]

    # --- regular page URLs --------------------------------------------------
    urls: List[str] = []
    page_host: List[str] = []
    page_lang: List[str] = []
    for i in range(n_pages):
        h = rng.choices(hosts, weights=weights, k=1)[0]
        lang = rng.choices(_LANGS, weights=[5, 2, 2, 2, 1], k=1)[0]
        path = f"/{lang}/p{i:05d}.html"
        if rng.random() < 0.05:
            path += f"?id={i}&ref={rng.randint(0, 9)}"
        if rng.random() < 0.03:
            path = f"/private/p{i:05d}.html"  # robots-disallowed on some hosts
        urls.append(f"https://{h}{path}")
        page_host.append(h)
        page_lang.append(lang)

    # --- link graph ---------------------------------------------------------
    host_pages: Dict[str, List[int]] = {}
    for i, h in enumerate(page_host):
        host_pages.setdefault(h, []).append(i)

    links_of: List[List[str]] = []
    for i in range(n_pages):
        n_links = rng.randint(3, 8)
        cands: List[str] = []
        same = host_pages[page_host[i]]
        for _ in range(n_links):
            if rng.random() < 0.7 and len(same) > 1:
                j = same[rng.randrange(len(same))]
            else:
                j = rng.randrange(n_pages)
            if j != i:
                cands.append(urls[j])
        if rng.random() < 0.1:
            cands.append(f"/relative/r{i % 50}.html")       # relative link
        if rng.random() < 0.05:
            cands.append(f"https://offsite{i % 7}.example.xyz/x.html")  # dead link
        links_of.append(list(dict.fromkeys(cands)))

    # --- HTML + oracle ------------------------------------------------------
    rows: List[Dict] = []
    for i in range(n_pages):
        lang = page_lang[i]
        title = _sentence(rng, lang, 5).rstrip(".")
        html = _page_html(rng, lang, title, links_of[i],
                          n_para=rng.randint(3, 7)).encode("utf-8")
        rows.append({"url": urls[i], "html": html})

    for url, html in _edge_case_pages(rng, hosts[1]):
        rows.append({"url": url, "html": html})
    # duplicate URL row (first occurrence wins in frontier semantics)
    rows.append({"url": urls[0], "html": rows[0]["html"]})

    for i, r in enumerate(rows):
        r["warc_ts"] = BASE_TS + dt.timedelta(seconds=i * 7)
        o = extract_page(r["url"], r["html"])
        r["text"] = o["body"]
        r["lang"] = o["lang"]

    table = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "pages.parquet"))

    # --- seeds: index page of the busiest hosts ----------------------------
    seed_urls = []
    for h in hosts[: min(10, len(hosts))]:
        if host_pages.get(h):
            seed_urls.append(urls[host_pages[h][0]])
    pq.write_table(
        pa.table({"url": pa.array(seed_urls, pa.string())}),
        os.path.join(out_dir, "seeds.parquet"),
    )

    # --- politeness ---------------------------------------------------------
    pol_rows = []
    for r, h in enumerate(hosts):
        pol_rows.append(
            {
                "host": h,
                "crawl_delay": round(rng.choice([1.0, 2.0, 5.0, 10.0]), 2),
                "max_pages": 10_000 if h == "mega.example.com" else rng.choice([20, 50, 200]),
                "disallow": "/private" if r % 3 == 0 else None,
            }
        )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([p["host"] for p in pol_rows], pa.string()),
                "crawl_delay": pa.array([p["crawl_delay"] for p in pol_rows], pa.float64()),
                "max_pages": pa.array([p["max_pages"] for p in pol_rows], pa.int64()),
                "disallow": pa.array([p["disallow"] for p in pol_rows], pa.string()),
            }
        ),
        os.path.join(out_dir, "politeness.parquet"),
    )

    # --- lookups (spam/page ranks keyed by webis uuid of the url) ----------
    lk_ids, lk_spam, lk_page = [], [], []
    for i in range(0, n_pages, 3):
        lk_ids.append(webis_uuid(DOC_ID_PREFIX, urls[i]))
        lk_spam.append(rng.randint(0, 99) if rng.random() < 0.8 else None)
        lk_page.append(round(rng.random(), 6) if rng.random() < 0.8 else None)
    lk_ids.append(webis_uuid(DOC_ID_PREFIX, "https://nowhere.example.com/orphan"))
    lk_spam.append(50)
    lk_page.append(0.5)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(lk_ids, pa.string()),
                "spam_rank": pa.array(lk_spam, pa.int64()),
                "page_rank": pa.array(lk_page, pa.float64()),
            }
        ),
        os.path.join(out_dir, "lookups.parquet"),
    )

    with open(marker, "w") as f:
        json.dump(params, f)
    return out_dir


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fixtures/smoke"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    generate(out, n_pages=n)
    print(out)
