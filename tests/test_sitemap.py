"""XML sitemap tests (sparkgraft/sitemap.py): build/parse round trips,
namespace tolerance, soup, and the Arrow operator's dead-letter
contract."""

from __future__ import annotations

import pytest

from sparkgraft import sitemap as S


def test_sitemap_round_trip():
    entries = [
        ("http://e.com/a?x=1&y=2", "2024-01-01"),
        ("http://e.com/b", None),
    ]
    parsed = S.parse_sitemap(S.build_sitemap(entries))
    assert parsed["kind"] == "urlset" and parsed["entries"] == entries
    idx = S.parse_sitemap(
        S.build_sitemap_index([("http://e.com/s1.xml", "2024-02-02")])
    )
    assert idx["kind"] == "sitemapindex"
    assert idx["entries"] == [("http://e.com/s1.xml", "2024-02-02")]


def test_sitemap_namespace_and_soup_tolerance():
    # no namespace at all
    p = S.parse_sitemap(
        "<urlset><url><loc>http://e.com/x</loc></url></urlset>"
    )
    assert p["entries"] == [("http://e.com/x", None)]
    # typo'd namespace — local names still match
    p2 = S.parse_sitemap(
        '<urlset xmlns="http://wrong.example/ns">'
        "<url><loc> http://e.com/y </loc><lastmod>2020-01-01</lastmod>"
        "<priority>0.5</priority></url>"
        "<junk/></urlset>"
    )
    assert p2["entries"] == [("http://e.com/y", "2020-01-01")]
    # url without loc: skipped
    p3 = S.parse_sitemap("<urlset><url><lastmod>2020</lastmod></url></urlset>")
    assert p3["entries"] == []
    for bad in ("not xml", "<html><body>404</body></html>", ""):
        with pytest.raises(ValueError):
            S.parse_sitemap(bad)


def test_sitemap_entries_operator_dead_letters(spark):
    rows = [
        (1, S.build_sitemap([("http://e.com/a", "2024-01-01"),
                             ("http://e.com/b", None)])),
        (2, S.build_sitemap_index([("http://e.com/child.xml", None)])),
        (3, "<html>error page</html>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "site_id long, xml string")
    out = S.sitemap_entries(df).collect()
    ok = [r for r in out if r.sitemap_error is None]
    bad = {r.site_id: r for r in out if r.sitemap_error is not None}
    assert {(r.site_id, r.kind, r.loc, r.lastmod) for r in ok} == {
        (1, "urlset", "http://e.com/a", "2024-01-01"),
        (1, "urlset", "http://e.com/b", None),
        (2, "sitemapindex", "http://e.com/child.xml", None),
    }
    assert set(bad) == {3, 4} and bad[3].loc is None
