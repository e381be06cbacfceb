"""Crawl-frontier temporal tier tests (sparkgraft/frontier.py):
recrawl staleness semantics, Crawl-delay group selection, politeness
scheduling determinism, and the sitemap -> refetch -> schedule
composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft import frontier as FR


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_recrawl_frontier_reasons(spark):
    candidates = spark.createDataFrame(
        [
            ("u/new", "2026-01-10"),
            ("u/stale", "2026-01-20"),
            ("u/fresh", "2026-01-10"),
            ("u/boundary", "2026-01-15"),  # lastmod == fetched -> fresh
            ("u/unknown", None),
        ],
        "url string, lastmod string",
    )
    snapshot = spark.createDataFrame(
        [
            ("u/stale", "2026-01-15"),
            ("u/fresh", "2026-01-15"),
            ("u/boundary", "2026-01-15"),
            ("u/unknown", "2026-01-15"),
        ],
        "url string, fetched_at string",
    )
    out = FR.recrawl_frontier(candidates, snapshot)
    got = {r["url"]: (r["reason"], r["refetch"]) for r in out.collect()}
    assert got == {
        "u/new": ("new", True),
        "u/stale": ("stale", True),
        "u/fresh": ("fresh", False),
        "u/boundary": ("fresh", False),
        "u/unknown": ("unknown", False),
    }


def test_recrawl_frontier_folds_duplicate_announcements(spark):
    # several sitemaps announce one URL: the freshest lastmod governs,
    # and NULL announcements neither win nor poison the fold
    candidates = spark.createDataFrame(
        [
            ("u/p", "2026-01-10"),
            ("u/p", None),
            ("u/p", "2026-01-20"),
            ("u/q", None),
            ("u/q", None),
        ],
        "url string, lastmod string",
    )
    snapshot = spark.createDataFrame(
        [("u/p", "2026-01-15"), ("u/q", "2026-01-15")],
        "url string, fetched_at string",
    )
    out = FR.recrawl_frontier(candidates, snapshot)
    assert out.count() == 2  # one row per URL after the fold
    got = {r["url"]: (r["lastmod"], r["reason"]) for r in out.collect()}
    assert got["u/p"] == ("2026-01-20", "stale")
    assert got["u/q"] == (None, "unknown")


def test_effective_delays_group_selection(spark):
    delays = spark.createDataFrame(
        [
            ("a.com", "*", 2.0),
            ("b.com", "graftbot", 0.25),
            ("c.com", "*", 2.0),
            ("c.com", "graftbot", 0.25),  # exact beats '*'
        ],
        "host string, agent string, crawl_delay_sec double",
    )
    eff = FR.effective_delays(delays, agent="GraftBot", default_delay_sec=1.0)
    got = {r["host"]: r["crawl_delay_sec"] for r in eff.collect()}
    assert got == {"a.com": 2.0, "b.com": 0.25, "c.com": 0.25}
    # unlisted agent: only the '*' groups apply
    eff2 = FR.effective_delays(delays, agent="otherbot")
    got2 = {r["host"]: r["crawl_delay_sec"] for r in eff2.collect()}
    assert got2 == {"a.com": 2.0, "b.com": 1.0, "c.com": 2.0}


def test_fetch_schedule_slots_and_offsets(spark):
    frontier = spark.createDataFrame(
        [
            ("http://a.com/p2",),
            ("http://a.com/p1",),
            ("http://a.com:8080/p3",),  # :port strips to the same host
            ("http://b.com/q1",),
        ],
        "url string",
    )
    delays = spark.createDataFrame(
        [("a.com", "*", 2.0)],
        "host string, agent string, crawl_delay_sec double",
    )
    out = FR.fetch_schedule(frontier, delays)
    got = {
        r["url"]: (r["host"], r["fetch_slot"], r["fetch_offset_sec"])
        for r in out.collect()
    }
    # url ASC within host; the port-bearing URL joins a.com's budget
    assert got["http://a.com/p1"] == ("a.com", 0, 0.0)
    assert got["http://a.com/p2"] == ("a.com", 1, 2.0)
    assert got["http://a.com:8080/p3"] == ("a.com", 2, 4.0)
    # no delay row -> default 1.0
    assert got["http://b.com/q1"] == ("b.com", 0, 0.0)
    row = out.where(F.col("url") == "http://b.com/q1").collect()[0]
    assert row["crawl_delay_sec"] == 1.0


def test_fetch_schedule_priority_order(spark):
    frontier = spark.createDataFrame(
        [
            ("http://a.com/low", 1.0),
            ("http://a.com/high", 9.0),
            ("http://a.com/none", None),  # NULL priority sorts last
            ("http://a.com/tie2", 5.0),
            ("http://a.com/tie1", 5.0),  # ties break by url ASC
        ],
        "url string, priority double",
    )
    out = FR.fetch_schedule(frontier, priority_col="priority")
    order = [
        r["url"]
        for r in out.orderBy("fetch_slot").collect()
    ]
    assert order == [
        "http://a.com/high",
        "http://a.com/tie1",
        "http://a.com/tie2",
        "http://a.com/low",
        "http://a.com/none",
    ]


def test_frontier_composition_sitemap_to_schedule(spark):
    # the temporal loop end-to-end: announcements -> staleness verdict
    # -> refetch set -> politeness schedule
    candidates = spark.createDataFrame(
        [
            ("http://a.com/new", None),
            ("http://a.com/stale", "2026-01-20"),
            ("http://a.com/fresh", "2026-01-01"),
            ("http://b.com/new", None),
        ],
        "url string, lastmod string",
    )
    snapshot = spark.createDataFrame(
        [
            ("http://a.com/stale", "2026-01-15"),
            ("http://a.com/fresh", "2026-01-15"),
        ],
        "url string, fetched_at string",
    )
    delays = spark.createDataFrame(
        [("a.com", "*", 3.0)],
        "host string, agent string, crawl_delay_sec double",
    )
    verdicts = FR.recrawl_frontier(candidates, snapshot)
    todo = verdicts.where("refetch").select("url")
    sched = FR.fetch_schedule(todo, delays)
    got = _rows(sched, "url", "host", "fetch_slot", "fetch_offset_sec")
    assert got == {
        ("http://a.com/new", "a.com", 0, 0.0),
        ("http://a.com/stale", "a.com", 1, 3.0),
        ("http://b.com/new", "b.com", 0, 0.0),
    }
