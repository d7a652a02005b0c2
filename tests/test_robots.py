"""Unit tests for the RFC 9309 robots.txt evaluator on handcrafted
files — cases the planted fixture corpus does not produce."""

from pyspark.sql import Row

from pdf_ocr_spark.operators.robots import (
    _rule_regex,
    parse_robots,
    robots_decisions,
    robots_rules_table,
)


def test_group_selection_ignores_other_agents():
    txt = """
User-agent: googlebot
Disallow: /g/

User-agent: *
Disallow: /a/
Allow: /a/b
"""
    assert parse_robots(txt) == [("disallow", "/a/"), ("allow", "/a/b")]
    assert parse_robots(txt, agent="googlebot") == [("disallow", "/g/")]


def test_multi_agent_group_and_comments():
    txt = """# header comment
User-agent: alpha
User-agent: *
Disallow: /x  # trailing comment
User-agent: beta
Disallow: /y
"""
    assert parse_robots(txt) == [("disallow", "/x")]
    assert parse_robots(txt, agent="beta") == [("disallow", "/y")]


def test_empty_disallow_is_noop():
    assert parse_robots("User-agent: *\nDisallow:\n") == []


def test_rule_regex_wildcards_and_anchor():
    import re

    assert re.match(_rule_regex("/a/*/c"), "/a/bbb/c/d")
    assert not re.match(_rule_regex("/a/*/c"), "/a/bbb/d")
    assert re.match(_rule_regex("/x.pdf$"), "/x.pdf")
    assert not re.match(_rule_regex("/x.pdf$"), "/x.pdfz")
    # regex metacharacters in paths are literal
    assert not re.match(_rule_regex("/x.pdf$"), "/xapdf")


def _decide(spark, robots_txt, links):
    robots = spark.createDataFrame(
        [Row(host="h.example.com", robots_txt=robots_txt)]
    )
    rules = robots_rules_table(robots)
    parsed = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                offset=0,
                href=f"https://h.example.com{p}",
                host="h.example.com",
                path=p,
            )
            for i, p in enumerate(links)
        ]
    )
    out = robots_decisions(parsed, rules).collect()
    return {r["href"].split(".com")[1]: (r["allowed"], r["matched_rule"]) for r in out}

def test_longest_match_and_allow_tie_break(spark):
    txt = """User-agent: *
Disallow: /p/
Allow: /p/ok
Disallow: /q
Allow: /q
"""
    got = _decide(spark, txt, ["/p/ok/1", "/p/no", "/q/anything", "/elsewhere"])
    assert got["/p/ok/1"] == (True, "allow /p/ok")  # longer allow wins
    assert got["/p/no"] == (False, "disallow /p/")
    assert got["/q/anything"] == (True, "allow /q")  # tie -> allow wins
    assert got["/elsewhere"] == (True, None)  # no rule -> allowed


def test_wildcard_rules_apply_in_plan(spark):
    txt = """User-agent: *
Disallow: /*.pdf$
"""
    got = _decide(spark, txt, ["/a/x.pdf", "/a/x.pdfs"])
    assert got["/a/x.pdf"] == (False, "disallow /*.pdf$")
    assert got["/a/x.pdfs"][0] is True


def test_host_without_robots_defaults_to_allowed(spark):
    rules = robots_rules_table(
        spark.createDataFrame([Row(host="other.com", robots_txt="User-agent: *\nDisallow: /")])
    )
    parsed = spark.createDataFrame(
        [Row(doc_id=0, offset=0, href="https://h.com/x", host="h.com", path="/x")]
    )
    out = robots_decisions(parsed, rules).collect()[0]
    assert out["allowed"] is True and out["matched_rule"] is None
    assert out["href"] == "https://h.com/x"


def test_crawl_delay_extraction():
    from pdf_ocr_spark.operators.robots import crawl_delay

    from pdf_ocr_spark.sources.webgen import robots_for_site

    assert crawl_delay(robots_for_site(3)) == 4.0
    txt = """User-agent: fastbot
Crawl-delay: 0.5
User-agent: *
Crawl-delay: 10
"""
    assert crawl_delay(txt) == 10.0
    assert crawl_delay(txt, agent="fastbot") == 0.5
    assert crawl_delay("User-agent: *\nDisallow: /x\n") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None


def test_sitemap_discovery_lines():
    """Sitemap: lines are global (any position, any group), order-
    preserving, case-insensitive, comment-stripped; rule evaluation
    must ignore them entirely."""
    from pdf_ocr_spark.operators.robots import parse_robots, sitemap_urls

    text = (
        "SiTeMaP: https://a.example/s1.xml  # inline comment\n"
        "User-agent: *\n"
        "Disallow: /x\n"
        "sitemap: https://a.example/s2.xml\n"
    )
    assert sitemap_urls(text) == [
        "https://a.example/s1.xml",
        "https://a.example/s2.xml",
    ]
    assert parse_robots(text) == [("disallow", "/x")]
    assert sitemap_urls("") == [] and sitemap_urls(None) == []


def test_sitemap_between_user_agents_does_not_split_group():
    """RFC 9309 §2.2.1: only rule lines close a group's agent list. A
    Sitemap:/unknown line placed between two User-agent lines of ONE
    group must not split it (ADVICE r4)."""
    from pdf_ocr_spark.operators.robots import crawl_delay, parse_robots

    txt = """User-agent: alpha
Sitemap: https://h.com/sitemap.xml
Unknown-directive: whatever
User-agent: beta
Disallow: /private
Crawl-delay: 7
"""
    # both agents belong to the same group and share its rules
    assert parse_robots(txt, "alpha") == [("disallow", "/private")]
    assert parse_robots(txt, "beta") == [("disallow", "/private")]
    assert crawl_delay(txt, "alpha") == 7.0
    assert crawl_delay(txt, "beta") == 7.0
    # but a rule line DOES close the list: gamma starts a new group
    txt2 = txt + "User-agent: gamma\nAllow: /\n"
    assert parse_robots(txt2, "gamma") == [("allow", "/")]
    assert parse_robots(txt2, "beta") == [("disallow", "/private")]
    # crawl-delay is itself a group-closing rule extension
    txt3 = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nCrawl-delay: 2\n"
    assert crawl_delay(txt3, "a") == 1.0
    assert crawl_delay(txt3, "b") == 2.0
