"""Crawl-frontier temporal queries (r13). The corpus has no crawl
history, so each query plants one per-document URL universe as pure
``doc_id`` residue functions — the oracle can state every verdict
(staleness reason, fetch slot, change class) directly without
reimplementing the operators. Library logic in sparkgraft/frontier.py
and relational.snapshot_diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import frontier as FR
from ..io import read_table
from ..relational import snapshot_diff, spread
from .registry import register


@register(
    "recrawl_frontier_lastmod",
    # NEW r13 retired tier: the incremental-recrawl decision —
    # sitemap <lastmod> vs the last crawl's fetch time. Plant: every
    # doc announces /p{doc_id} with lastmod day (doc_id%28)+1 (Jan
    # 2026), EXCEPT %5==0 docs whose announcement carries no lastmod;
    # %7==0 docs are announced a SECOND time with lastmod 2026-01-31
    # (the max-fold must keep the freshest claim, and it can flip a
    # fresh page stale); the snapshot holds every doc except %3==0
    # (those are 'new'), all fetched 2026-01-15. Reasons are residue
    # functions; the oracle states them.
    retired=True,
    oracle="""
    WITH base AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN doc_id % 7 = 0 THEN '2026-01-31'
                    WHEN doc_id % 5 = 0 THEN NULL
                    ELSE '2026-01-' ||
                         lpad(CAST(CAST(doc_id % 28 AS INT) + 1
                                   AS VARCHAR), 2, '0')
               END AS lastmod,
               CASE WHEN doc_id % 3 = 0 THEN NULL
                    ELSE '2026-01-15' END AS fetched_at
        FROM documents
    )
    SELECT 'http://s.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
           lastmod, fetched_at,
           CASE WHEN fetched_at IS NULL THEN 'new'
                WHEN lastmod IS NULL THEN 'unknown'
                WHEN lastmod > fetched_at THEN 'stale'
                ELSE 'fresh' END AS reason,
           (fetched_at IS NULL)
             OR (lastmod IS NOT NULL AND lastmod > fetched_at)
             AS refetch
    FROM base
    """,
)
def recrawl_frontier_lastmod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Announcements (with a planted duplicate-announcement class and
    a no-lastmod class) left-joined onto the planted snapshot via
    ``frontier.recrawl_frontier`` — one lastmod max-fold + one key
    join, verdicts row-local."""
    did = F.col("doc_id")
    url = F.concat(F.lit("http://s.example.com/p"), did.cast("string"))
    day = F.lpad(((did % 28) + 1).cast("int").cast("string"), 2, "0")
    docs = spread(read_table(spark, sf_dir, "documents"))
    primary = docs.select(
        url.alias("url"),
        F.when(did % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("2026-01-"), day))
        .alias("lastmod"),
    )
    # second announcement for the %7==0 class: a fresher claim the
    # per-URL fold must keep (and NULL-lastmod rows must not beat it)
    extra = docs.where(did % 7 == 0).select(
        url.alias("url"), F.lit("2026-01-31").alias("lastmod")
    )
    snapshot = docs.where(did % 3 != 0).select(
        url.alias("url"), F.lit("2026-01-15").alias("fetched_at")
    )
    return FR.recrawl_frontier(primary.unionByName(extra), snapshot)


@register(
    "fetch_politeness_schedule",
    # NEW r13 retired tier: per-host politeness serialization for
    # agent 'graftbot'. 7 hosts by residue; the delay table plants
    # every group-selection branch — hosts 0-3 a '*' delay of
    # (h+1)*0.5s, host 4 a graftbot-only 0.25s, host 5 BOTH ('*'=2.0
    # must lose to the exact group's 0.25), host 6 no rows at all
    # (default 1.0). Slots order by url ASC within host; the oracle
    # recomputes the window and the offset products (all values are
    # exact binary fractions, so DOUBLE equality is safe). Single-lane
    # schedule (connections=1 -> fetch_connection uniformly 0); the
    # multi-connection fan-out is unit/property-tested.
    retired=True,
    oracle="""
    WITH urls AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               'http://h' || CAST(CAST(doc_id % 7 AS INT) AS VARCHAR)
                 || '.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
               'h' || CAST(CAST(doc_id % 7 AS INT) AS VARCHAR)
                 || '.example.com' AS host,
               CAST(doc_id % 7 AS INT) AS h
        FROM documents
    )
    SELECT doc_id, url, host,
           CAST(CASE WHEN h <= 3 THEN (h + 1) * 0.5
                     WHEN h IN (4, 5) THEN 0.25
                     ELSE 1.0 END AS DOUBLE) AS crawl_delay_sec,
           CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
                AS BIGINT) AS fetch_slot,
           CAST(0 AS BIGINT) AS fetch_connection,
           CAST((row_number() OVER (PARTITION BY host ORDER BY url) - 1)
                * CASE WHEN h <= 3 THEN (h + 1) * 0.5
                       WHEN h IN (4, 5) THEN 0.25
                       ELSE 1.0 END AS DOUBLE) AS fetch_offset_sec
    FROM urls
    """,
)
def fetch_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant the 7-host frontier + the 4-branch delay table, schedule
    with ``frontier.fetch_schedule`` (broadcast delay join + ONE
    per-host window)."""
    did = F.col("doc_id")
    host = F.concat(
        F.lit("h"), (did % 7).cast("int").cast("string"),
        F.lit(".example.com"),
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    urls = docs.select(
        did.cast("bigint").alias("doc_id"),
        F.concat(
            F.lit("http://"), host, F.lit("/p"), did.cast("string")
        ).alias("url"),
    )
    hid = F.col("id").cast("int")
    hname = F.concat(
        F.lit("h"), hid.cast("string"), F.lit(".example.com")
    )
    star = (
        spark.range(4)
        .select(
            hname.alias("host"), F.lit("*").alias("agent"),
            ((hid + 1) * 0.5).cast("double").alias("crawl_delay_sec"),
        )
    )
    exact = (
        spark.range(4, 6)
        .select(
            hname.alias("host"), F.lit("graftbot").alias("agent"),
            F.lit(0.25).cast("double").alias("crawl_delay_sec"),
        )
    )
    decoy = (
        spark.range(5, 6)  # host 5's '*' row must LOSE to the exact
        .select(
            hname.alias("host"), F.lit("*").alias("agent"),
            F.lit(2.0).cast("double").alias("crawl_delay_sec"),
        )
    )
    delays = star.unionByName(exact).unionByName(decoy)
    return FR.fetch_schedule(urls, delays, agent="graftbot")


@register(
    "crawl_snapshot_delta",
    # NEW r13 retired tier: recrawl economics — which URL-keyed pages
    # changed between two crawls. COMPOSITION row: this is
    # relational.snapshot_diff (the migration/CDC-derivation diff)
    # keyed by URL with the content fingerprint as the compared
    # column; no new operator. Plant: prev holds every URL except
    # %5==0 (those are 'insert'), curr every URL except %7==0 (prev-
    # only -> 'delete'); where both exist the fingerprint differs iff
    # %3==0 ('update', else 'unchanged'). URLs in NEITHER (%35==0)
    # must not appear. The oracle states change_type by residue.
    retired=True,
    oracle="""
    SELECT 'http://c.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 5 = 0 THEN 'insert'
                WHEN doc_id % 7 = 0 THEN 'delete'
                WHEN doc_id % 3 = 0 THEN 'update'
                ELSE 'unchanged' END AS change_type
    FROM documents
    WHERE doc_id % 5 != 0 OR doc_id % 7 != 0
    """,
)
def crawl_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two planted crawl snapshots (URL + content fingerprint) diffed
    with ``snapshot_diff`` — one full outer join on the URL key, the
    compared payload reduced to a map-side hash before the shuffle."""
    did = F.col("doc_id")
    url = F.concat(F.lit("http://c.example.com/p"), did.cast("string"))
    docs = spread(read_table(spark, sf_dir, "documents"))
    prev = docs.where(did % 5 != 0).select(
        url.alias("url"),
        F.md5(F.concat(F.lit("a"), did.cast("string"))).alias("fp"),
    )
    curr = docs.where(did % 7 != 0).select(
        url.alias("url"),
        F.md5(
            F.concat(
                F.when(did % 3 == 0, F.lit("b")).otherwise(F.lit("a")),
                did.cast("string"),
            )
        ).alias("fp"),
    )
    return snapshot_diff(
        prev, curr, key_cols=["url"], include_unchanged=True
    )


@register(
    "recrawl_w3c_mixed_forms",
    # NEW r13 retired tier: the w3c_sortkey normalization tier under
    # the recrawl verdict — mixed-PRECISION W3C lastmod forms (the
    # case raw lexicographic comparison gets wrong) normalized to the
    # canonical UTC sortkey on BOTH sides. Forms by residue: %4==0
    # date-only, %4==1 'T09:30:45Z', %4==2 '+01:00' offset (subtracts
    # to 08:30), %4==3 an RFC 822 date (outside the grammar -> NULL
    # -> 'unknown' when seen). Snapshot: every doc except %3==0
    # ('new'), fetched 2026-01-15T12:00:00Z -> '2026-01-15 12:00:00'.
    # The oracle knows nothing about datetime parsing: every
    # normalized string and verdict is a stated residue function.
    retired=True,
    oracle="""
    WITH base AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               lpad(CAST(CAST(doc_id % 27 AS INT) + 1 AS VARCHAR),
                    2, '0') AS dd,
               CAST(doc_id % 4 AS INT) AS form,
               doc_id % 3 = 0 AS is_new
        FROM documents
    ), keyed AS (
        SELECT doc_id,
               CASE form
                   WHEN 0 THEN '2026-01-' || dd || ' 00:00:00'
                   WHEN 1 THEN '2026-01-' || dd || ' 09:30:45'
                   WHEN 2 THEN '2026-01-' || dd || ' 08:30:00'
                   ELSE NULL END AS lastmod,
               CASE WHEN is_new THEN NULL
                    ELSE '2026-01-15 12:00:00' END AS fetched_at,
               form, is_new, dd
        FROM base
    )
    SELECT 'http://w.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
           lastmod, fetched_at,
           CASE WHEN fetched_at IS NULL THEN 'new'
                WHEN lastmod IS NULL THEN 'unknown'
                WHEN lastmod > fetched_at THEN 'stale'
                ELSE 'fresh' END AS reason,
           (fetched_at IS NULL)
             OR (lastmod IS NOT NULL AND lastmod > fetched_at)
             AS refetch
    FROM keyed
    """,
)
def recrawl_w3c_mixed_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant one announcement per doc in a mixed W3C form, normalize
    with ``w3c_sortkey`` on both sides, verdict with
    ``recrawl_frontier`` — all row-local codegen plus the op's one
    fold + one join. Note only the NORMALIZED key makes class 1
    comparable to the 12:00 fetch: raw string order would misread
    'T09:30:45Z' day-15 announcements as after it."""
    did = F.col("doc_id")
    dd = F.lpad(((did % 27) + 1).cast("int").cast("string"), 2, "0")
    raw = (
        F.when(
            did % 4 == 0, F.concat(F.lit("2026-01-"), dd)
        )
        .when(
            did % 4 == 1,
            F.concat(F.lit("2026-01-"), dd, F.lit("T09:30:45Z")),
        )
        .when(
            did % 4 == 2,
            F.concat(F.lit("2026-01-"), dd, F.lit("T09:30:00+01:00")),
        )
        .otherwise(
            F.concat(F.lit("Wed, "), dd, F.lit(" Jan 2026 09:30:00 GMT"))
        )
    )
    url = F.concat(F.lit("http://w.example.com/p"), did.cast("string"))
    docs = spread(read_table(spark, sf_dir, "documents"))
    candidates = docs.select(
        url.alias("url"), FR.w3c_sortkey(raw).alias("lastmod")
    )
    snapshot = docs.where(did % 3 != 0).select(
        url.alias("url"),
        FR.w3c_sortkey(F.lit("2026-01-15T12:00:00Z")).alias("fetched_at"),
    )
    return FR.recrawl_frontier(candidates, snapshot)


@register(
    "recrawl_conditional_plan",
    # NEW r13 retired tier: revalidation ECONOMICS — the fetch_mode
    # verdict over planted cache validators (the etag/last_modified
    # warc_responses surfaces). Plant: all announcements lastmod
    # 2026-01-20; snapshot holds every doc except %3==0 ('new' ->
    # 'full': no snapshot, no validators), fetched 2026-01-15; etag
    # planted iff %2==0, last_modified iff %4==3 (odd -> never both);
    # stale rows plan 'conditional' iff any validator else 'full'.
    # All residue functions; the oracle states every column.
    retired=True,
    oracle="""
    SELECT 'http://r.example.com/p' || CAST(doc_id AS VARCHAR) AS url,
           '2026-01-20' AS lastmod,
           CASE WHEN doc_id % 3 = 0 THEN NULL
                ELSE '2026-01-15' END AS fetched_at,
           CASE WHEN doc_id % 3 = 0 THEN 'new'
                ELSE 'stale' END AS reason,
           TRUE AS refetch,
           CASE WHEN doc_id % 3 != 0 AND doc_id % 2 = 0
                THEN '"e' || CAST(doc_id AS VARCHAR) || '"'
                ELSE NULL END AS etag,
           CASE WHEN doc_id % 3 != 0 AND doc_id % 4 = 3
                THEN 'Thu, 08 Jan 2026 00:00:00 GMT'
                ELSE NULL END AS last_modified,
           CASE WHEN doc_id % 3 = 0 THEN 'full'
                WHEN doc_id % 2 = 0 OR doc_id % 4 = 3
                THEN 'conditional'
                ELSE 'full' END AS fetch_mode
    FROM documents
    """,
)
def recrawl_conditional_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted validator matrix through ``recrawl_frontier(
    validator_cols=...)`` — same one-fold-one-join shape, the cost
    verdict row-local."""
    did = F.col("doc_id")
    url = F.concat(F.lit("http://r.example.com/p"), did.cast("string"))
    docs = spread(read_table(spark, sf_dir, "documents"))
    candidates = docs.select(
        url.alias("url"), F.lit("2026-01-20").alias("lastmod")
    )
    snapshot = docs.where(did % 3 != 0).select(
        url.alias("url"),
        F.lit("2026-01-15").alias("fetched_at"),
        F.when(
            did % 2 == 0,
            F.concat(F.lit('"e'), did.cast("string"), F.lit('"')),
        ).alias("etag"),
        F.when(
            did % 4 == 3, F.lit("Thu, 08 Jan 2026 00:00:00 GMT")
        ).alias("last_modified"),
    )
    return FR.recrawl_frontier(
        candidates, snapshot, validator_cols=("etag", "last_modified")
    )


@register(
    "crawl_funnel_report",
    # NEW r13 retired tier: per-registrable-domain funnel ACCOUNTING —
    # the observability row a crawl operator watches: how many URLs
    # each gate dropped, the canonical dedup rate, and what the
    # diversity cap will keep. Same plant geometry as the
    # crawl_to_corpus flagship (pair-duplicated pages, 12 hosts / 3
    # .co.uk registrable domains x 2 spellings, 4 path classes incl.
    # the query-matched robots rule and the /ads/ gate class, 404s by
    # %13) minus the wire/HTML codec tiers (their dead-letter
    # accounting is their own oracled surface). The oracle replays the
    # residue matrix and states every count; n_kept_after_cap =
    # least(25, n_canonical) is exact WITHOUT running the cap — the
    # cap keeps min(cap, groups) per domain by construction.
    retired=True,
    oracle="""
    WITH pages AS (
        SELECT doc_id,
               doc_id // 2 AS pid,
               doc_id % 13 = 0 AS dropped,
               CAST((doc_id // 2) % 4 AS INT) AS c,
               (doc_id // 2) % 8 = 7 AS ads,
               'site' || CAST((doc_id // 2) % 3 AS VARCHAR)
                 || '.co.uk' AS dom,
               (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
                 || 'h' || CAST((doc_id // 2) % 4 AS VARCHAR)
                 || '.site' || CAST((doc_id // 2) % 3 AS VARCHAR)
                 || '.co.uk' AS host
        FROM documents
    ), flags AS (
        SELECT *,
               NOT dropped AND c IN (0, 2) AS robots_blocked,
               NOT dropped AND c = 3 AND ads AS gate_blocked,
               NOT dropped AND (c = 1 OR (c = 3 AND NOT ads))
                 AS candidate
        FROM pages
    )
    SELECT dom AS registrable_domain,
           count(*) AS n_urls,
           count(DISTINCT host) AS n_hosts,
           count(CASE WHEN dropped THEN 1 END) AS n_status_dropped,
           count(CASE WHEN robots_blocked THEN 1 END)
             AS n_robots_blocked,
           count(CASE WHEN gate_blocked THEN 1 END) AS n_gate_blocked,
           count(CASE WHEN candidate THEN 1 END) AS n_candidates,
           count(DISTINCT CASE WHEN candidate THEN pid END)
             AS n_canonical,
           least(25, count(DISTINCT CASE WHEN candidate THEN pid END))
             AS n_kept_after_cap,
           CAST(CASE WHEN count(CASE WHEN candidate THEN 1 END) > 0
                THEN 1.0
                     - count(DISTINCT CASE WHEN candidate THEN pid END)
                       * 1.0
                       / count(CASE WHEN candidate THEN 1 END)
                END AS DOUBLE) AS dedup_rate
    FROM flags
    GROUP BY dom
    """,
)
def crawl_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's gates re-run for ACCOUNTING: plant the URL
    universe, apply the real robots gate + url_filter + canonical
    key, then ONE per-domain aggregation of stage counts. Shapes: the
    rules broadcast join + the grouped distinct-count aggregation —
    no per-stage jobs, no collect."""
    from .. import robots as R
    from .. import web as W

    did = F.col("doc_id")
    pid = F.floor(did / 2).cast("bigint")
    c = (pid % 4).cast("int")
    ads = pid % 8 == 7
    host = F.concat(
        F.when(did % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("h"), (pid % 4).cast("string"),
        F.lit(".site"), (pid % 3).cast("string"),
        F.lit(".co.uk"),
    )
    path = (
        F.when(c == 0, F.concat(F.lit("/private/x"), pid.cast("string")))
        .when(c == 1, F.concat(F.lit("/private/public/x"), pid.cast("string")))
        .when(c == 2, F.lit("/search"))
        .when(ads, F.concat(F.lit("/ads/x"), pid.cast("string")))
        .otherwise(F.concat(F.lit("/ok/x"), pid.cast("string")))
    )
    query = F.when(
        c == 2,
        F.concat(
            F.lit("?q="), pid.cast("string"),
            F.when(did % 2 == 0, F.lit("&utm_source=x")).otherwise(F.lit("")),
        ),
    ).otherwise(
        F.when(did % 2 == 0, F.lit("?utm_source=x")).otherwise(F.lit(""))
    )
    url = F.concat(
        F.lit("http://"), host,
        F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        path, query,
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    urls = docs.select(
        did.cast("bigint").alias("doc_id"),
        url.alias("url"),
        (did % 13 == 0).alias("dropped"),
    )
    robots_txt = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public/\n"
        "Disallow: /search?q=\n"
    )
    hosts = spark.range(24).select(
        F.concat(
            F.when(F.col("id") >= 12, F.lit("www.")).otherwise(F.lit("")),
            F.lit("h"), (F.col("id") % 4).cast("string"),
            F.lit(".site"),
            ((F.col("id") % 12) / 4).cast("int").cast("string"),
            F.lit(".co.uk"),
        ).alias("host"),
        F.lit(robots_txt).alias("content"),
    )
    gated = R.robots_gate(
        urls, R.robots_rules(hosts), agent="graftbot", url_col="url"
    )
    bare_host = F.regexp_replace(
        W.parse_url("url")["host"], r":[0-9]+$", ""
    )
    flagged = gated.select(
        W.registrable_domain(bare_host).alias("registrable_domain"),
        bare_host.alias("host"),
        "dropped",
        (~F.col("dropped") & ~F.col("robots_allowed")).alias(
            "robots_blocked"
        ),
        (
            ~F.col("dropped")
            & F.col("robots_allowed")
            & ~W.url_filter("url")["keep"]
        ).alias("gate_blocked"),
        (
            ~F.col("dropped")
            & F.col("robots_allowed")
            & W.url_filter("url")["keep"]
        ).alias("candidate"),
        W.canonical_url("url").alias("canonical_url"),
    )
    one = F.lit(1)
    n_cand = F.count(F.when(F.col("candidate"), one))
    n_canon = F.countDistinct(
        F.when(F.col("candidate"), F.col("canonical_url"))
    )
    agg = flagged.groupBy("registrable_domain").agg(
        F.count(one).alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
        F.count(F.when(F.col("dropped"), one)).alias("n_status_dropped"),
        F.count(F.when(F.col("robots_blocked"), one)).alias(
            "n_robots_blocked"
        ),
        F.count(F.when(F.col("gate_blocked"), one)).alias("n_gate_blocked"),
        n_cand.alias("n_candidates"),
        n_canon.alias("n_canonical"),
    )
    return agg.select(
        "registrable_domain",
        "n_urls",
        "n_hosts",
        "n_status_dropped",
        "n_robots_blocked",
        "n_gate_blocked",
        "n_candidates",
        "n_canonical",
        F.least(F.lit(25).cast("bigint"), F.col("n_canonical")).alias(
            "n_kept_after_cap"
        ),
        F.when(
            F.col("n_candidates") > 0,
            F.lit(1.0)
            - F.col("n_canonical").cast("double")
            / F.col("n_candidates").cast("double"),
        ).alias("dedup_rate"),
    )
