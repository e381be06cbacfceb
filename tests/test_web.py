"""URL parse + gate unit tests (sparkgraft/web.py)."""

from __future__ import annotations

from sparkgraft import web as W


def test_parse_url_components(spark):
    rows = [
        (1, "https://Sub.Host.Example.COM/a/b/c?x=1&y=2#frag"),
        (2, "http://example.org"),
        (3, "not a url at all"),
        (4, "ftp://files.example.net/pub/data"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    p = W.parse_url("url")
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[v.alias(k) for k, v in p.items()]).collect()
    }
    r1 = out[1]
    assert r1.scheme == "https" and r1.host == "sub.host.example.com"
    assert r1.path == "/a/b/c" and r1.query == "x=1&y=2"
    assert r1.domain == "example.com"
    assert r1.path_depth == 3 and r1.n_params == 2
    r2 = out[2]
    assert r2.host == "example.org" and r2.path == "" and r2.path_depth == 0
    assert r2.n_params == 0
    r3 = out[3]  # malformed: empty components, never NULL
    assert r3.scheme == "" and r3.host == "" and r3.domain == ""
    assert out[4].scheme == "ftp"


def test_url_filter_each_rule_bites(spark):
    rows = [
        (1, "https://good.example.com/article/1"),
        (2, "ftp://good.example.com/article/2"),
        (3, "https://blocked.example.com/article/3"),
        (4, "https://good.example.com/ads/banner.html"),
        (5, "https://good.example.com/a/b/c/d/e/f/g"),
        (6, "https://good.example.com/p?a=1&b=2&c=3&d=4&e=5"),
        (7, "garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    g = W.url_filter("url", host_blocklist=("blocked.example.com",))
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[v.alias(k) for k, v in g.items()]).collect()
    }
    assert out[1].keep is True
    assert out[2].keep is False and out[2].r_scheme is False
    assert out[3].keep is False and out[3].r_host is False
    assert out[4].keep is False and out[4].r_path is False
    assert out[5].keep is False and out[5].r_depth is False
    assert out[6].keep is False and out[6].r_params is False
    # malformed rows dead-letter through the booleans, no NULL keep
    assert out[7].keep is False and out[7].r_host is False


def test_canonical_url_rules(spark):
    """canonical_url's documented rule set, edge by edge: case, www,
    default vs explicit ports, trailing host dot, duplicate/trailing
    slashes, tracking-parameter drop, parameter sort, fragment drop —
    and the non-rules (non-default port kept, https :80 kept)."""
    from pyspark.sql import functions as F

    from sparkgraft import web as W

    cases = [
        # three spellings of one page -> one canonical
        (1, "HTTP://www.Ex.COM:80/a//b/?utm_source=x&b=2&a=1",
         "http://ex.com/a/b?a=1&b=2"),
        (2, "http://ex.com/a/b?a=1&b=2&utm_campaign=y#frag",
         "http://ex.com/a/b?a=1&b=2"),
        (3, "https://www.ex.com.:443//a/b/?b=2&a=1&gclid=z",
         "https://ex.com/a/b?a=1&b=2"),
        # bare '/' collapses to the empty path
        (4, "https://ex.com/", "https://ex.com"),
        # NON-default port survives; ref= is tracking
        (5, "http://ex.com:8080/x?ref=abc", "http://ex.com:8080/x"),
        # :80 is only default for http — https keeps it
        (6, "https://ex.com:80/x", "https://ex.com:80/x"),
        # empty params dropped, the rest sorted
        (7, "http://ex.com/x?b=2&&a=1&fbclid=q", "http://ex.com/x?a=1&b=2"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "id int, url string"
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", W.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
