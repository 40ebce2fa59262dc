"""robots.txt parsing/matching (RFC 9309 semantics; the crawl's
deterministic double stands in for the network, this is the parser
real cache rows come from)."""

from mhtml_to_html_spark.frontier.robots import parse_robots_txt

BODY = """
# global
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: mhtml-spark
User-agent: otherbot
Disallow: /only-for-us/
Allow: /

User-agent: greedy
Disallow: /
"""


def test_star_group_prefix_rules():
    r = parse_robots_txt(BODY, "unknown-bot/1.0")
    assert not r.allows("/private/x")
    assert r.allows("/public/x")
    assert r.crawl_delay == 2


def test_longest_match_allow_wins():
    r = parse_robots_txt(BODY, "unknown-bot/1.0")
    # Allow /private/ok is longer than Disallow /private/
    assert r.allows("/private/ok/file")


def test_specific_group_selected_by_product_token():
    r = parse_robots_txt(BODY, "mhtml-spark-crawler/2.0")
    assert not r.allows("/only-for-us/a")
    assert r.allows("/private/x"), "the * group must not leak into a specific group"


def test_multiple_agents_share_a_group():
    r = parse_robots_txt(BODY, "OtherBot")
    assert not r.allows("/only-for-us/a")


def test_disallow_everything():
    r = parse_robots_txt(BODY, "greedy-crawler")
    assert not r.allows("/")
    assert not r.allows("/anything")


def test_allow_tie_beats_disallow():
    body = "User-agent: *\nDisallow: /dir/\nAllow: /dir/$\n"
    r = parse_robots_txt(body, "x")
    # RFC 9309 2.2.2: on equal specificity allow wins; '$' anchors
    assert r.allows("/dir/")
    assert not r.allows("/dir/file")


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/\n"
    r = parse_robots_txt(body, "x")
    assert not r.allows("/docs/a.pdf")
    assert r.allows("/docs/a.pdf.html")
    assert not r.allows("/tmp123/f")
    assert r.allows("/tmpfile")  # /tmp*/ needs the slash


def test_empty_disallow_means_allow_all():
    body = "User-agent: *\nDisallow:\n"
    r = parse_robots_txt(body, "x")
    assert r.allows("/anything")


def test_malformed_lines_fail_open():
    body = "User-agent *\nDisallow /x\n<?xml?>\nUser-agent: *\nDisallow: /y/\n"
    r = parse_robots_txt(body, "x")
    assert r.allows("/x")
    assert not r.allows("/y/z")


def test_rule_after_new_agent_line_resets_group_list():
    # UA lines AFTER a rule start a fresh group (RFC 9309 grouping)
    body = (
        "User-agent: a\nDisallow: /a/\n"
        "User-agent: b\nDisallow: /b/\n"
    )
    assert parse_robots_txt(body, "a").allows("/b/x")
    assert not parse_robots_txt(body, "b").allows("/b/x")
    assert not parse_robots_txt(body, "a").allows("/a/x")
