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


def test_fetch_schedule_parallel_connections(spark):
    # connections=2: round-robin lanes, Crawl-delay honored PER
    # CONNECTION — offsets advance every `connections` slots
    frontier = spark.createDataFrame(
        [(f"http://a.com/p{i}",) for i in range(5)], "url string"
    )
    delays = spark.createDataFrame(
        [("a.com", "*", 2.0)],
        "host string, agent string, crawl_delay_sec double",
    )
    out = FR.fetch_schedule(frontier, delays, connections=2)
    got = {
        r["url"]: (r["fetch_slot"], r["fetch_connection"], r["fetch_offset_sec"])
        for r in out.collect()
    }
    assert got == {
        "http://a.com/p0": (0, 0, 0.0),
        "http://a.com/p1": (1, 1, 0.0),
        "http://a.com/p2": (2, 0, 2.0),
        "http://a.com/p3": (3, 1, 2.0),
        "http://a.com/p4": (4, 0, 4.0),
    }
    import pytest

    with pytest.raises(ValueError, match="connections"):
        FR.fetch_schedule(frontier, delays, connections=0)


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


def test_fetch_schedule_invariants_property(spark):
    """Property: for arbitrary frontiers and connection counts, the
    schedule is a politeness-legal total order — per (host,
    connection) the offsets step by exactly the host's delay, slots
    are a 0-based dense rank, lanes round-robin, and a re-run of the
    same input reproduces the identical schedule (determinism)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        paths=st.lists(
            st.tuples(st.sampled_from("abc"), st.integers(0, 30)),
            min_size=1,
            max_size=25,
            unique=True,
        ),
        conns=st.integers(1, 3),
        delay=st.sampled_from([0.5, 1.0, 2.0]),
    )
    def prop(paths, conns, delay):
        frontier = spark.createDataFrame(
            [(f"http://{h}.com/p{i}",) for h, i in paths], "url string"
        )
        delays = spark.createDataFrame(
            [(f"{h}.com", "*", delay) for h in "abc"],
            "host string, agent string, crawl_delay_sec double",
        )
        out = FR.fetch_schedule(frontier, delays, connections=conns)
        rows = out.collect()
        assert len(rows) == len(paths)
        by_host: dict[str, list] = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        for host, hr in by_host.items():
            hr.sort(key=lambda r: r["fetch_slot"])
            # dense 0-based slots in url order
            assert [r["fetch_slot"] for r in hr] == list(range(len(hr)))
            assert [r["url"] for r in hr] == sorted(r["url"] for r in hr)
            for r in hr:
                assert r["fetch_connection"] == r["fetch_slot"] % conns
                assert (
                    r["fetch_offset_sec"]
                    == (r["fetch_slot"] // conns) * delay
                )
        # determinism: same input, same schedule
        again = {
            (r["url"], r["fetch_slot"], r["fetch_connection"])
            for r in FR.fetch_schedule(
                frontier, delays, connections=conns
            ).collect()
        }
        assert again == {
            (r["url"], r["fetch_slot"], r["fetch_connection"]) for r in rows
        }

    prop()


def test_stream_recrawl_announcement_fold_matches_batch(spark, tmp_path):
    """Streaming parity for the recrawl fold: announcements replayed
    across micro-batches, folded as a streaming max(lastmod) per URL
    (complete mode — the fold is the stateful part; the verdict join
    is stateless), must equal the batch recrawl_frontier verdicts over
    the same staged rows."""
    from sparkgraft import streaming as ST

    import pyspark.sql.functions as SF

    n = 120
    rows = []
    for i in range(n):
        url = f"http://s.com/p{i % 40}"  # 3 announcements per URL
        day = (i % 27) + 1
        lastmod = None if i % 5 == 0 else f"2026-01-{day:02d}"
        rows.append((url, lastmod))
    staged = spark.createDataFrame(rows, "url string, lastmod string")
    src = str(tmp_path / "announcements.parquet")
    staged.write.mode("overwrite").parquet(src)

    snapshot = spark.createDataFrame(
        [(f"http://s.com/p{k}", "2026-01-15") for k in range(0, 40, 2)],
        "url string, fetched_at string",
    )

    stream = ST.stream_table(
        spark, str(tmp_path), "announcements", split_files=4
    )
    folded_stream = stream.groupBy("url").agg(
        SF.max("lastmod").alias("lastmod")
    )
    folded = ST.run_stream_to_memory(
        folded_stream, "q_stream_recrawl_fold", output_mode="complete"
    )
    # stateless tail on the folded stream result: identical verdict
    # expression to the batch operator (one announcement per URL now,
    # so recrawl_frontier's own fold is a no-op pass-through)
    got = {
        (r["url"], r["lastmod"], r["reason"], r["refetch"])
        for r in FR.recrawl_frontier(folded, snapshot).collect()
    }
    want = {
        (r["url"], r["lastmod"], r["reason"], r["refetch"])
        for r in FR.recrawl_frontier(
            spark.read.parquet(src), snapshot
        ).collect()
    }
    assert got == want and len(got) == 40


def test_fetch_schedule_rejects_reserved_columns(spark):
    import pytest

    frontier = spark.createDataFrame(
        [("http://a.com/p", 3)], "url string, fetch_slot int"
    )
    with pytest.raises(ValueError, match="fetch_slot"):
        FR.fetch_schedule(frontier)


def test_pagerank_prioritized_schedule_composition(spark):
    """Graph tier -> temporal tier composition: page-level PageRank
    over the resolved-link graph feeds fetch_schedule's priority, so
    the politeness queue fetches a host's most-linked pages first."""
    from sparkgraft.graph import pagerank

    urls = [f"http://a.com/p{i}" for i in range(4)]
    # p3 is the hub (everyone links to it); p3 links only to p1
    edges = spark.createDataFrame(
        [(urls[0], urls[3]), (urls[1], urls[3]), (urls[2], urls[3]),
         (urls[3], urls[1])],
        "src string, dst string",
    )
    # the p1<->p3 cycle converges geometrically (damping^k): run to
    # the fixpoint via the operator's tol early-stop
    ranks = pagerank(edges, iters=60, tol=1e-9)
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    prioritized = frontier.join(
        ranks.withColumnRenamed("node", "url"), "url", "left"
    ).withColumnRenamed("rank", "priority")
    sched = FR.fetch_schedule(prioritized, priority_col="priority")
    order = [r["url"] for r in sched.orderBy("fetch_slot").collect()]
    assert order[0] == urls[3]  # the hub fetches first
    assert order[1] == urls[1]  # then the hub's own outlink
    # politeness still holds: offsets step by the default delay
    offs = [r["fetch_offset_sec"] for r in sched.orderBy("fetch_slot").collect()]
    assert offs == [0.0, 1.0, 2.0, 3.0]


def test_w3c_sortkey_matrix(spark):
    """The W3C Datetime normalization matrix (sitemaps.org lastmod
    grammar), under a NON-UTC session zone — date-only, minute/second/
    fractional precision, Z and ±hh:mm offsets (incl. day rollover
    both ways), and the rejection classes (time without TZD, RFC 822
    dates, regex-shaped non-dates, out-of-range time fields)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        cases = [
            ("2026-01-15", "2026-01-15 00:00:00"),
            ("2026-01-15T09:30Z", "2026-01-15 09:30:00"),
            ("2026-01-15T09:30:45Z", "2026-01-15 09:30:45"),
            ("2026-01-15T09:30:45.123Z", "2026-01-15 09:30:45"),
            ("2026-01-15T09:30:00+01:00", "2026-01-15 08:30:00"),
            ("2026-01-15T22:30:00-05:30", "2026-01-16 04:00:00"),
            ("2026-01-01T00:30:00+01:00", "2025-12-31 23:30:00"),
            # a wall time inside the session zone's DST gap must NOT
            # shift (the date_format-on-ntz trap)
            ("2026-03-08T02:30:00Z", "2026-03-08 02:30:00"),
            ("2026-01-15T09:30:00", None),
            ("Wed, 15 Jan 2026 09:30:00 GMT", None),
            ("2026-13-45", None),
            ("2026-01-15T25:99:00Z", None),
            ("2026-01-15T09:30:00+24:00", None),  # TZD hour out of range
            ("2026-01-15T09:30:00-00:60", None),  # TZD minute out of range
            ("2026-01-15T09:30:00+23:59", "2026-01-14 09:31:00"),
            ("", None),
            (None, None),
        ]
        df = spark.createDataFrame([(c,) for c, _ in cases], "ts string")
        got = [
            r["k"] for r in df.select(FR.w3c_sortkey("ts").alias("k")).collect()
        ]
        assert got == [w for _, w in cases]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_recrawl_frontier_with_w3c_normalization(spark):
    # mixed-precision announcements, normalized through w3c_sortkey on
    # BOTH sides, give the verdicts lexicographic comparison alone
    # would get wrong ('2026-01-15T09:00:00Z' > '2026-01-15' as raw
    # strings, but 09:00 is BEFORE a 12:00 fetch)
    candidates = spark.createDataFrame(
        [
            ("u/a", "2026-01-15T09:00:00Z"),   # before the 12:00 fetch
            ("u/b", "2026-01-15T13:00:00Z"),   # after it
            ("u/c", "2026-01-16"),             # date-only, after
            ("u/d", "Wed, 14 Jan 2026"),       # junk -> unknown
        ],
        "url string, lastmod string",
    )
    norm = candidates.select(
        "url", FR.w3c_sortkey("lastmod").alias("lastmod")
    )
    snapshot = spark.createDataFrame(
        [(u, "2026-01-15T12:00:00Z") for u in ("u/a", "u/b", "u/c", "u/d")],
        "url string, fetched_at string",
    )
    snap_norm = snapshot.select(
        "url", FR.w3c_sortkey("fetched_at").alias("fetched_at")
    )
    out = FR.recrawl_frontier(norm, snap_norm)
    got = {r["url"]: r["reason"] for r in out.collect()}
    assert got == {
        "u/a": "fresh",
        "u/b": "stale",
        "u/c": "stale",
        "u/d": "unknown",
    }


def test_recrawl_fetch_mode_with_validators(spark):
    """Revalidation economics: a refetch whose snapshot carries a
    cache validator (etag / last_modified off warc_responses) plans a
    CONDITIONAL revalidation; one with none plans a FULL fetch;
    skipped rows get NULL fetch_mode."""
    candidates = spark.createDataFrame(
        [
            ("u/new", "2026-01-20"),       # not in snapshot -> full
            ("u/etag", "2026-01-20"),      # stale + etag -> conditional
            ("u/lm", "2026-01-20"),        # stale + last-modified only
            ("u/bare", "2026-01-20"),      # stale, no validators -> full
            ("u/fresh", "2026-01-01"),     # skip -> NULL mode
        ],
        "url string, lastmod string",
    )
    snapshot = spark.createDataFrame(
        [
            ("u/etag", "2026-01-15", '"abc123"', None),
            ("u/lm", "2026-01-15", None, "Thu, 15 Jan 2026 00:00:00 GMT"),
            ("u/bare", "2026-01-15", None, None),
            ("u/fresh", "2026-01-15", '"zzz"', None),
        ],
        "url string, fetched_at string, etag string, last_modified string",
    )
    out = FR.recrawl_frontier(
        candidates, snapshot, validator_cols=("etag", "last_modified")
    )
    got = {r["url"]: (r["reason"], r["fetch_mode"]) for r in out.collect()}
    assert got == {
        "u/new": ("new", "full"),
        "u/etag": ("stale", "conditional"),
        "u/lm": ("stale", "conditional"),
        "u/bare": ("stale", "full"),
        "u/fresh": ("fresh", None),
    }
    # validators ride through for the fetcher to echo back
    etags = {r["url"]: r["etag"] for r in out.collect()}
    assert etags["u/etag"] == '"abc123"' and etags["u/new"] is None


def test_warc_validators_feed_recrawl_snapshot(spark):
    """End-to-end validator plumbing: ETag / Last-Modified response
    headers survive the WARC crack and drive the conditional-refetch
    plan."""
    import pandas as pd

    from sparkgraft import warc as WC

    def wfile(url, extra):
        resp = WC.build_http_response(
            body=b"<html><body>x</body></html>", extra_headers=extra
        )
        return WC.build_warc_file(
            [WC.build_warc_record("response", resp, url=url)],
            gzip_members=True,
        )

    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "file_id": [1, 2, 3],
                "payload": [
                    wfile("http://v.com/a", [("ETag", '"e1"')]),
                    wfile(
                        "http://v.com/b",
                        [("Last-Modified", "Thu, 15 Jan 2026 00:00:00 GMT")],
                    ),
                    wfile("http://v.com/c", []),
                ],
            }
        )
    )
    resp = WC.warc_responses(files)
    snapshot = resp.select(
        "url",
        F.lit("2026-01-15 00:00:00").alias("fetched_at"),
        "etag",
        "last_modified",
    )
    candidates = spark.createDataFrame(
        [(u, "2026-01-20 00:00:00") for u in
         ("http://v.com/a", "http://v.com/b", "http://v.com/c")],
        "url string, lastmod string",
    )
    out = FR.recrawl_frontier(
        candidates, snapshot, validator_cols=("etag", "last_modified")
    )
    got = {r["url"]: r["fetch_mode"] for r in out.collect()}
    assert got == {
        "http://v.com/a": "conditional",
        "http://v.com/b": "conditional",
        "http://v.com/c": "full",
    }


def test_sitemap_xml_to_recrawl_composition(spark):
    """The announcement source is REAL sitemap XML: build_sitemap ->
    sitemap_entries crack -> w3c_sortkey normalization ->
    recrawl_frontier verdicts. Mixed lastmod precisions in one urlset,
    plus an entry with no lastmod at all."""
    from sparkgraft import sitemap as SM

    xml = SM.build_sitemap(
        [
            ("http://x.com/a", "2026-01-20"),
            ("http://x.com/b", "2026-01-10T09:00:00Z"),
            ("http://x.com/c", None),
            ("http://x.com/d", "2026-01-15T13:00:00+01:00"),  # 12:00 UTC
        ]
    )
    docs = spark.createDataFrame([(1, xml)], "site_id long, xml string")
    entries = SM.sitemap_entries(docs).where("sitemap_error IS NULL")
    candidates = entries.select(
        F.col("loc").alias("url"), FR.w3c_sortkey("lastmod").alias("lastmod")
    )
    snapshot = spark.createDataFrame(
        [(f"http://x.com/{p}", "2026-01-15 12:00:00") for p in "abcd"],
        "url string, fetched_at string",
    )
    out = FR.recrawl_frontier(candidates, snapshot)
    got = {r["url"]: r["reason"] for r in out.collect()}
    assert got == {
        "http://x.com/a": "stale",
        "http://x.com/b": "fresh",
        "http://x.com/c": "unknown",
        "http://x.com/d": "fresh",  # 13:00+01:00 == the 12:00 fetch
    }
