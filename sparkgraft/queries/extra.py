"""Second-wave coverage: grouped conformance, exact percentiles,
exists/forall HOFs, and map-typed JSON handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .core import _event_spec
from .registry import register


@register(
    "conformance_daily",
    """
    WITH spec(event_name, prop_name) AS (
        SELECT t.event_name, p.prop_name
        FROM (VALUES ('click'),('error'),('purchase'),('signup'),('view')) t(event_name)
        CROSS JOIN (VALUES ('k'),('session_id')) p(prop_name)
    ), joined AS (
        SELECT strftime(e.ts, '%Y-%m-%d') AS event_date,
               s.event_name, s.prop_name,
               list_contains(json_keys(e.props), s.prop_name) AS key_present,
               nullif(json_extract_string(e.props, '$.' || s.prop_name), '') AS v
        FROM events e JOIN spec s ON e.event_type = s.event_name
    )
    SELECT event_date, event_name, prop_name,
           count(*) AS total_records,
           count(CASE WHEN key_present THEN 1 END) AS keys_not_null_count,
           count(v) AS value_not_null_count
    FROM joined GROUP BY 1, 2, 3
    """,
    retired=True,
)
def conformance_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance metrics PER DAY — the reference runs one driver
    invocation per date partition (event_verify.py:18-21); here the date
    is just another grouping column in the same single plan, which is
    what makes a 1000-day backfill one job instead of 1000."""
    ev = read_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.col("event_type").alias("event_name"),
        "props",
    )
    spec = _event_spec(spark)
    joined = ev.join(F.broadcast(spec), "event_name")

    from ..json_ops import extract_key, key_presence

    present = key_presence([F.col("props")], F.col("prop_name"))
    value = extract_key("props", F.col("prop_name"))
    return joined.groupBy("event_date", "event_name", "prop_name").agg(
        F.count(F.lit(1)).alias("total_records"),
        F.count(F.when(present, F.lit(1))).alias("keys_not_null_count"),
        F.count(value).alias("value_not_null_count"),
    )


@register(
    "price_percentiles_by_status",
    # Retired r4 (two-round-stable) to free a driver slot for the new
    # packing surface. Still locally verified (test_retired_oracles,
    # oracle_check --retired).
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    retired=True,
)
def price_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation — same definition as SQL
    quantile_cont). At 100 TB switch to ``percentile_approx`` (t-digest
    sketch, mergeable map-side) — exact percentile shuffles every value
    of the group; the approx variant is in approx_distinct_users' vein."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
    )


@register(
    "embedding_predicates_hof",
    # retired round 4 (coverage budget, made room for the corpus tier):
    # exists/forall HOF evidence stays verified here in the retired
    # tier; active HOF evidence lives in doc_embedding_profile's
    # filter/size and the similarity internals
    retired=True,
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x < 0)) > 0 AS has_negative,
           len(list_filter(embedding, x -> abs(x) >= 1)) = 0 AS all_unit_range,
           len(list_filter(embedding, x -> x > 0)) = len(embedding) AS all_positive
    FROM embeddings
    """,
)
def embedding_predicates_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exists / forall higher-order predicates over array columns."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.exists("embedding", lambda x: x < 0).alias("has_negative"),
        F.forall("embedding", lambda x: F.abs(x) < 1).alias("all_unit_range"),
        F.forall("embedding", lambda x: x > 0).alias("all_positive"),
    )


@register(
    "props_as_map",
    # retired round 4 (coverage budget): map-function evidence stays
    # verified in the retired tier; active JSON evidence lives in
    # json_extract_events / json_keys_per_type / json_value_stats
    retired=True,
    oracle="""
    SELECT event_id,
           len(json_keys(props)) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           json_extract_string(props, '$.k') AS k_value
    FROM events
    """,
)
def props_as_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parsed ONCE to ``map<string,string>`` then queried
    with map functions — the single-parse fast path that replaces N
    repeated ``get_json_object`` calls (SURVEY §7.3)."""
    from ..json_ops import payload_map

    ev = read_table(spark, sf_dir, "events")
    m = payload_map("props")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").alias("k_value"),
    )


@register(
    "user_event_cms_counts",
    # NEW r6 retired tier: the Count-Min state + its estimates fully
    # recomputed in SQL — positions (md5), cell counts, the min-over-
    # seeds read, AND the exact counts, so the one-sided error of every
    # estimate is part of the verified surface. PROMOTED to the active
    # driver tier r7 (rotation policy); RETIRED AGAIN r9 (two-round
    # stable, funds the contrastive_training_pairs promotion).
    retired=True,
    oracle="""
    WITH seeds(seed) AS (VALUES (0), (1), (2), (3)),
    cells AS (
        SELECT seed,
               CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '|'
                                        || CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 256 AS pos
        FROM events CROSS JOIN seeds
        WHERE user_id IS NOT NULL
    ),
    state AS (SELECT seed, pos, count(*) AS n FROM cells GROUP BY 1, 2),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
    probe_cells AS (
        SELECT user_id, seed,
               CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || '|'
                                        || CAST(user_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 256 AS pos
        FROM probes CROSS JOIN seeds
    ),
    est AS (
        SELECT user_id, CAST(min(coalesce(n, 0)) AS BIGINT) AS est
        FROM probe_cells LEFT JOIN state USING (seed, pos)
        GROUP BY user_id
    ),
    exact AS (
        SELECT user_id, count(*) AS exact
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, est, exact, CAST(est - exact AS BIGINT) AS overcount
    FROM est JOIN exact USING (user_id)
    """,
)
def user_event_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequencies read from a Count-Min sketch
    (incremental.partial_cms / cms_estimate, width 256 x depth 4 —
    deliberately NARROW so real hash collisions exercise the min-over-
    seeds read at test scale), joined against the exact counts so the
    sketch's one-sided guarantee (est >= exact, small overcount) is
    hash-verified row by row. At 100 TB the sketch is the point: per-
    item frequency tracking in depth x width longs of state per key,
    mergeable across batches by plain cell sums (fold == one-shot
    asserted exactly in tests/test_incremental.py)."""
    from .. import incremental as I

    ev = read_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    state = I.partial_cms(ev, [], "user_id", width=256, depth=4)
    items = ev.select("user_id").distinct()
    est = I.cms_estimate(state, items, [], "user_id", width=256, depth=4)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    return est.join(exact, "user_id").select(
        "user_id",
        "est",
        "exact",
        (F.col("est") - F.col("exact")).cast("bigint").alias("overcount"),
    )


@register(
    "order_trend_by_priority",
    # NEW r6 retired tier: per-group OLS trend with every sufficient
    # statistic, the closed form, and the rounding recomputed in SQL.
    retired=True,
    oracle="""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS DOUBLE) AS x,
               CAST(o_totalprice AS DOUBLE) AS y
        FROM orders
    ),
    stats AS (
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
        FROM base GROUP BY 1
    )
    SELECT o_orderpriority, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM stats
    """,
)
def order_trend_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contract.groupwise_ols: the per-segment drift-rate monitor —
    least-squares slope of order value against order date (in days),
    per priority class, in ONE keyed aggregate of decimal-exact
    sufficient statistics (never collecting a group, never a window
    over an unbounded partition). A priority class whose slope moves
    is repricing; r2 says whether the trend is real or noise."""
    from ..contract import groupwise_ols

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        # datediff, not unix_timestamp: epoch conversion of an ntz
        # timestamp is SESSION-TZ-dependent (x would shift hours under
        # a non-UTC session); day arithmetic on the date part is not
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    return groupwise_ols(orders, ["o_orderpriority"], "x", "y")


@register(
    "lineitem_key_skew_report",
    # NEW r6 retired tier: the pre-join skew detector with counts,
    # shares, top-N, and the rounded-decimal entropy recomputed in SQL.
    retired=True,
    oracle="""
    WITH report AS (
        SELECT 'l_suppkey' AS key_col, CAST(l_suppkey AS VARCHAR) AS k
        FROM lineitem WHERE l_suppkey IS NOT NULL
        UNION ALL
        SELECT 'l_returnflag', l_returnflag
        FROM lineitem WHERE l_returnflag IS NOT NULL
    ),
    counts AS (
        SELECT key_col, k, count(*) AS c FROM report GROUP BY 1, 2
    ),
    totals AS (
        SELECT key_col, sum(c) AS n, count(*) AS d FROM counts GROUP BY 1
    ),
    tops AS (
        SELECT key_col, max(c) AS top1, sum(c) AS topn FROM (
            SELECT key_col, c,
                   row_number() OVER (
                       PARTITION BY key_col ORDER BY c DESC, k ASC) AS rn
            FROM counts
        ) WHERE rn <= 10 GROUP BY 1
    ),
    ent AS (
        SELECT counts.key_col,
               CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n)
                                   * ln(CAST(c AS DOUBLE) / n), 9)
                             AS DECIMAL(18,9))) AS DOUBLE) AS h
        FROM counts JOIN totals ON counts.key_col = totals.key_col
        GROUP BY 1
    )
    SELECT totals.key_col, CAST(n AS BIGINT) AS n_rows,
           CAST(d AS BIGINT) AS n_distinct,
           round(CAST(top1 AS DOUBLE) / n, 6) AS top1_share,
           round(CAST(topn AS DOUBLE) / n, 6) AS topn_share,
           round(h, 6) AS entropy
    FROM totals
    JOIN tops ON totals.key_col = tops.key_col
    JOIN ent ON totals.key_col = ent.key_col
    """,
)
def lineitem_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contract.key_skew_report over lineitem's join key (l_suppkey,
    100 uniform suppliers) and its most skewed column (l_returnflag, 3
    values — a worst-case stand-in): the measurement that routes a join
    to relational.salted_join BEFORE it runs (the skew probe measured
    3.75x on a 95%-hot key). Per column: one exact count aggregate, a
    TakeOrdered top-10, a one-row roll-up; never a full sort."""
    from ..contract import key_skew_report

    li = read_table(spark, sf_dir, "lineitem")
    return key_skew_report(li, ["l_suppkey", "l_returnflag"])
