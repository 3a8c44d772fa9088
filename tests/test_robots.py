"""RFC 9309 robots.txt semantics: group selection, longest-match
precedence, wildcards, the $ anchor, tie-breaking toward Allow."""

from pdf_parser_benchmark_spark.extract.robots import (
    parse_robots,
    robots_allowed,
)

ROBOTS = """\
# corpus crawler policy
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$

User-agent: greedybot
User-agent: scraperbot
Disallow: /

Sitemap: https://x.example/sitemap.xml
"""


def test_group_structure():
    groups = parse_robots(ROBOTS)
    assert [g.agents for g in groups] == [["*"], ["greedybot", "scraperbot"]]
    assert len(groups[0].rules) == 3
    assert [r[0] for r in groups[0].rules] == [False, True, False]


def test_longest_match_and_allow_override():
    assert robots_allowed(ROBOTS, "goodbot", "/public/a")
    assert not robots_allowed(ROBOTS, "goodbot", "/private/x")
    # Allow: /private/ok/ is longer than Disallow: /private/
    assert robots_allowed(ROBOTS, "goodbot", "/private/ok/y")


def test_wildcard_and_end_anchor():
    assert not robots_allowed(ROBOTS, "goodbot", "/doc1.pdf")
    assert not robots_allowed(ROBOTS, "goodbot", "/a/b/doc.pdf")
    # $ anchors the end: .pdfx is NOT blocked
    assert robots_allowed(ROBOTS, "goodbot", "/doc1.pdfx")


def test_specific_group_selected_by_token():
    assert not robots_allowed(ROBOTS, "GreedyBot/2.1", "/public/a")
    assert not robots_allowed(ROBOTS, "scraperbot", "/anything")
    # multi-agent group: both tokens map to the same rules
    assert not robots_allowed(ROBOTS, "ScraperBot v3", "/x")


def test_longest_token_wins_group_selection():
    txt = ("User-agent: bot\nDisallow: /a/\n\n"
           "User-agent: bigbot\nDisallow: /b/\n")
    # 'bigbot' contains both tokens; the longer token's group applies
    assert robots_allowed(txt, "bigbot", "/a/x")
    assert not robots_allowed(txt, "bigbot", "/b/x")


def test_no_group_and_empty_disallow_allow_everything():
    assert robots_allowed("", "anybot", "/x")
    assert robots_allowed("User-agent: *\nDisallow:\n", "anybot", "/x")


def test_tie_length_prefers_allow():
    txt = "User-agent: *\nDisallow: /p/a\nAllow: /p/b\n"
    # equal-length patterns on different paths; and a true tie:
    tie = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n"
    assert not robots_allowed(txt, "b", "/p/a")
    assert robots_allowed(txt, "b", "/p/b")
    assert robots_allowed(tie, "b", "/dir/x")  # 5 == 5 → Allow wins
