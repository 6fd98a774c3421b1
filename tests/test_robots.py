"""robots.txt parser semantics (RFC 9309 subset) + the bridge into the
crawl pipeline's politeness table."""

import pyarrow as pa
import ray.data

from engine.pipelines.crawl_common import CrawlConfig, host_rules, load_politeness
from engine.stages.robots import (
    parse_robots_txt,
    robots_politeness,
    write_politeness_parquet,
)


def test_longest_agent_token_wins_and_star_fallback():
    body = (
        "User-agent: *\nDisallow: /star\nCrawl-delay: 9\n\n"
        "User-agent: ray\nDisallow: /short\n\n"
        "User-agent: raycrawler\nDisallow: /long\nCrawl-delay: 3\n"
    )
    assert parse_robots_txt(body, "raycrawler") == (3000, ("/long",))
    # 'ray' is the longest prefix of 'raybot'; no delay in that group
    assert parse_robots_txt(body, "raybot") == (-1, ("/short",))
    assert parse_robots_txt(body, "googlebot") == (9000, ("/star",))
    # 'raycrawlerx' as a TOKEN does not match agent 'raycrawler'... but
    # 'raycrawler' token matches agent 'raycrawlerxl' (prefix rule)
    assert parse_robots_txt(body, "raycrawlerxl") == (3000, ("/long",))


def test_group_merging_and_shared_header():
    # two groups with the same winning token merge; a group may list
    # several user-agent lines before its body
    body = (
        "User-agent: a\nUser-agent: raycrawler\nDisallow: /one\n\n"
        "User-agent: raycrawler\nDisallow: /two\nCrawl-delay: 1\n"
    )
    assert parse_robots_txt(body, "raycrawler") == (1000, ("/one", "/two"))


def test_grammar_edges():
    # directive before any group ignored; unknown keys don't end a group;
    # empty Disallow contributes nothing; unparsable delay ignored;
    # comments and blank/garbage lines skipped
    body = (
        "Disallow: /orphan\n"
        "User-agent: *\n"
        "Sitemap: https://x.example.com/s.xml\n"
        "Disallow:\n"
        "Crawl-delay: soon\n"
        "# full comment\n"
        "not a directive\n"
        "Disallow: /kept # trailing\n"
    )
    assert parse_robots_txt(body, "anybot") == (-1, ("/kept",))
    assert parse_robots_txt("", "anybot") == (-1, ())
    assert parse_robots_txt(None, "anybot") == (-1, ())
    # overflow / inf / nan / negative delays are unparsable, never a crash
    for bad in ("1e400", "inf", "nan", "-5"):
        assert parse_robots_txt(
            f"User-agent: *\nCrawl-delay: {bad}\nDisallow: /x\n", "anybot"
        ) == (-1, ("/x",))


def test_politeness_bridge(ray_session, tmp_path):
    parsed = robots_politeness(
        ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array(["a.com", "b.com"], pa.string()),
                    "robots_txt": pa.array(
                        [
                            "User-agent: *\nCrawl-delay: 2\nDisallow: /p\nDisallow: /q\n",
                            "User-agent: otherbot\nDisallow: /\n",
                        ],
                        pa.string(),
                    ),
                }
            )
        )
    )
    path = str(tmp_path / "politeness.parquet")
    write_politeness_parquet(parsed, path, default_crawl_delay=5.0, default_max_pages=7)
    cfg = CrawlConfig()
    rules = load_politeness(path, cfg)
    ra = host_rules(rules, "a.com", cfg)
    rb = host_rules(rules, "b.com", cfg)
    assert ra.crawl_delay == 2.0 and ra.disallow == ("/p", "/q") and ra.max_pages == 7
    assert rb.crawl_delay == 5.0 and rb.disallow == ()


def test_sitemap_parser_edges():
    from engine.stages.sitemaps import parse_sitemap

    # missing loc skipped; bad priority -> -1; CDATA + entities unescaped;
    # whitespace trimmed; case-insensitive tags; malformed tail ignored
    xml = (
        "<urlset>"
        "<url><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://a.com/x?q=1&amp;r=2</loc><priority>soon</priority></url>"
        "<URL><LOC><![CDATA[ https://a.com/cdata ]]></LOC></URL>"
        "<url><loc>  https://a.com/ws  </loc><priority>0.5</priority></url>"
        "<url><loc>https://a.com/open"
    )
    rows = parse_sitemap(xml)
    assert [r["url"] for r in rows] == [
        "https://a.com/x?q=1&r=2",
        "https://a.com/cdata",
        "https://a.com/ws",
    ]
    assert [r["priority_ppm"] for r in rows] == [-1, -1, 500000]
    assert parse_sitemap("") == [] and parse_sitemap(None) == []


def test_sitemap_index_rows():
    from engine.stages.sitemaps import parse_sitemap

    rows = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"
    )
    assert rows == [
        {
            "url": "https://a.com/s1.xml",
            "lastmod": "2026-02-01",
            "priority_ppm": -1,
            "from_index": 1,
        }
    ]


def test_crawl_from_parsed_robots_matches_direct_politeness(ray_session, tmp_path):
    """End-to-end integration: robots.txt bodies ENCODING the fixture's
    politeness rules, parsed via stages.robots into a politeness parquet,
    must drive run_crawl to the BIT-IDENTICAL order + seen set as the
    fixture's own politeness table (max_pages carried via the writer
    default, identical across hosts in the fixture slice we rebuild)."""
    import pyarrow.parquet as pq

    from engine.pipelines.crawl import run_crawl
    from engine.pipelines.crawl_common import CrawlConfig
    from fixtures.generate import generate

    fx = "/tmp/fixtures/robots_itest"
    generate(fx, n_pages=400, seed=11)
    pol = pq.read_table(f"{fx}/politeness.parquet")
    # single max_pages so the bridge default reproduces it exactly
    mp = pol.column("max_pages").to_pylist()
    mp_common = max(set(mp), key=mp.count)
    keep = [i for i, v in enumerate(mp) if v == mp_common]
    pol = pol.take(keep)
    direct = str(tmp_path / "direct.parquet")
    pq.write_table(pol, direct)

    bodies = []
    for h, d, dis in zip(
        pol.column("host").to_pylist(),
        pol.column("crawl_delay").to_pylist(),
        pol.column("disallow").to_pylist(),
    ):
        lines = ["User-agent: *", f"Crawl-delay: {d}"]
        for p in (dis or "").split(","):
            if p.strip():
                lines.append(f"Disallow: {p.strip()}")
        bodies.append("\n".join(lines) + "\n")
    robots_tbl = pa.table(
        {
            "host": pol.column("host"),
            "robots_txt": pa.array(bodies, pa.string()),
        }
    )
    parsed = robots_politeness(ray.data.from_arrow(robots_tbl))
    bridged = str(tmp_path / "bridged.parquet")
    write_politeness_parquet(
        parsed, bridged, default_max_pages=int(mp_common)
    )

    cfg = CrawlConfig(max_waves=3)
    o1, s1 = run_crawl(
        f"{fx}/pages.parquet", f"{fx}/seeds.parquet", direct,
        str(tmp_path / "wd1"), cfg,
    )
    o2, s2 = run_crawl(
        f"{fx}/pages.parquet", f"{fx}/seeds.parquet", bridged,
        str(tmp_path / "wd2"), cfg,
    )
    assert o1.equals(o2)

    def _urls(s):
        if isinstance(s, pa.Table):
            return sorted(s.column(0).to_pylist())
        return sorted(s)

    assert _urls(s1) == _urls(s2)


def test_parse_robots_sitemaps():
    from engine.stages.robots import parse_robots_sitemaps

    body = (
        "Sitemap: https://a.com/one.xml\n"          # before any group
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://a.com/two.xml # note\n"    # case + comment
        "Sitemap: https://a.com/one.xml\n"           # duplicate -> dropped
        "Sitemap:\n"                                 # empty value -> dropped
        "NotSitemap: https://a.com/no.xml\n"
    )
    assert parse_robots_sitemaps(body) == (
        "https://a.com/one.xml",
        "https://a.com/two.xml",
    )
    assert parse_robots_sitemaps("") == ()
    assert parse_robots_sitemaps(None) == ()


def test_rfc9309_decision_precedence():
    """Most-specific-match resolution (RFC 9309 §2.2.2): longest pattern
    wins, Allow wins exact-length ties, no match -> allowed."""
    from engine.stages.robots import parse_robots_rules, rfc9309_decision

    rules = parse_robots_rules(
        "User-agent: *\nAllow: /public*\nDisallow: /\n"
    )
    assert rules == ((True, "/public*"), (False, "/"))
    assert rfc9309_decision(rules, "/public/a.html") == (True, 8)
    assert rfc9309_decision(rules, "/private/x") == (False, 1)

    # $-anchored Allow (15) out-ranks the wildcard Disallow (10)
    r2 = parse_robots_rules(
        "User-agent: raycrawler\nDisallow: /private/*\nAllow: /private/stats$\n"
    )
    assert rfc9309_decision(r2, "/private/stats") == (True, 15)
    assert rfc9309_decision(r2, "/private/stats2") == (False, 10)  # anchor!
    assert rfc9309_decision(r2, "/other") == (True, 0)

    # exact-length tie: Allow wins, in either rule order
    tie_a = ((True, "/a/b"), (False, "/a/*"))
    tie_b = ((False, "/a/*"), (True, "/a/b"))
    assert rfc9309_decision(tie_a, "/a/b")[0] is True
    assert rfc9309_decision(tie_b, "/a/b")[0] is True

    # wildcard + anchor; literal regex chars in the path are escaped
    r3 = parse_robots_rules("User-agent: *\nDisallow: /*.pdf$\n")
    assert rfc9309_decision(r3, "/docs/file.pdf") == (False, 7)
    assert rfc9309_decision(r3, "/docs/file.pdfx") == (True, 0)
    assert rfc9309_decision(r3, "/docs/fileXpdf") == (True, 0)  # '.' escaped

    # group for a different agent: no rules -> allowed
    assert parse_robots_rules("User-agent: otherbot\nDisallow: /\n") == ()


def test_rfc9309_match_distributed(ray_session):
    """The dictionary-grouped vectorized kernel == the scalar reference
    on a mixed batch, under repartitioning."""
    from engine.stages.robots import (
        parse_robots_rules,
        rfc9309_decision,
        rfc9309_match,
    )

    bodies = [
        "User-agent: *\nAllow: /public*\nDisallow: /\n",
        "User-agent: raycrawler\nDisallow: /private/*\nAllow: /private/stats$\n",
        "User-agent: *\nDisallow: /*.pdf$\n",
        "",
    ]
    paths = ["/public/a.html", "/private/x", "/private/stats",
             "/docs/file.pdf", "/index.html"]
    rows = [(i, bodies[i % 4], paths[i % 5]) for i in range(40)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "robots_txt": pa.array([r[1] for r in rows], pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = (
        rfc9309_match(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, body, path in rows:
        exp_allowed, exp_len = rfc9309_decision(
            parse_robots_rules(body), path
        )
        assert got.loc[i, "allowed"] == int(exp_allowed), (i, body, path)
        assert got.loc[i, "rule_len"] == exp_len, (i, body, path)
