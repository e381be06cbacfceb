"""robots.txt tests (sparkgraft/robots.py): parser grammar, RFC 9309
matching semantics, and the gate operator end-to-end."""

from __future__ import annotations

from sparkgraft import robots as R

_ROBOTS = """\
# politeness file
User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 2

User-agent: graftbot
User-agent: otherbot
Disallow: /bot-only/
Disallow:
Allow: /bot-only/docs$
"""


def test_parse_robots_grammar():
    rules = R.parse_robots(_ROBOTS)
    # empty Disallow dropped; shared agent lines fan out; comments and
    # unknown directives (Crawl-delay) skipped
    assert ("*", False, "/private/") in rules
    assert ("*", True, "/private/public/") in rules
    assert ("graftbot", False, "/bot-only/") in rules
    assert ("otherbot", False, "/bot-only/") in rules
    assert ("graftbot", True, "/bot-only/docs$") in rules
    assert not any(pat == "" for _, _, pat in rules)
    # a second User-agent AFTER rules starts a NEW group (the '*'
    # group's rules must not leak into graftbot's)
    assert ("graftbot", False, "/private/") not in rules
    assert R.parse_robots("") == [] and R.parse_robots(None) == []


def test_pattern_to_regex_rfc_metachars():
    import re

    cases = [
        ("/private/", "/private/x", True),
        ("/private/", "/priv", False),
        ("/*.php", "/a/b/page.php", True),   # * spans path chars
        ("/*.php", "/a/b/page.html", False),
        ("/fish$", "/fish", True),            # $ anchors the end
        ("/fish$", "/fishing", False),
        ("/a+b", "/a+b", True),               # regex chars escaped
        ("/a+b", "/aab", False),
    ]
    for pattern, path, want in cases:
        rx = R.pattern_to_regex(pattern)
        assert bool(re.search(rx, path)) == want, (pattern, path, rx)


def test_robots_gate_semantics(spark):
    """The RFC matrix through the operator: group selection (exact
    beats *, * only as fallback), longest-match precedence, Allow wins
    ties, default-allow on no match / no rules / missing file."""
    robots = spark.createDataFrame(
        [
            ("a.example.com", _ROBOTS),
            ("norules.example.com", "User-agent: x\nDisallow: /all/"),
            ("nofile.example.com", None),
        ],
        "host string, content string",
    )
    rules = R.robots_rules(robots)
    urls = spark.createDataFrame(
        [
            (1, "http://a.example.com/private/x"),
            (2, "http://a.example.com/private/public/x"),
            (3, "http://a.example.com/bot-only/x"),
            (4, "http://a.example.com/bot-only/docs"),
            (5, "http://a.example.com/free"),
            (6, "http://norules.example.com/all/x"),  # group for agent x only
            (7, "http://nofile.example.com/anything"),
            (8, "http://unknown-host.example.com/y"),
        ],
        "id long, url string",
    )
    star = {
        r.id: r.robots_allowed
        for r in R.robots_gate(urls, rules, agent="randombot").collect()
    }
    # '*' group governs a.example.com for an unlisted agent
    assert star[1] is False          # /private/ disallowed
    assert star[2] is True           # longer Allow wins
    assert star[3] is True and star[4] is True  # bot-only rules not in *
    assert star[5] is True
    assert star[6] is True           # no matching group -> allowed
    assert star[7] is True and star[8] is True  # no file / no rules

    graft = {
        r.id: r.robots_allowed
        for r in R.robots_gate(urls, rules, agent="GraftBot").collect()
    }
    # exact group wins and '*' no longer applies at all
    assert graft[1] is True and graft[2] is True
    assert graft[3] is False         # /bot-only/ disallowed
    assert graft[4] is True          # Allow /bot-only/docs$ longer + anchored
    assert graft[5] is True
