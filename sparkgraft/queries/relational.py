"""Relational operator breadth (SURVEY §2.2-2.3, §2.6-2.7).

Filters/predicates, the full join family, set operations, global
sort/top-k, pivot, and grouping-set rollup/cube — each as one
declarative plan with its DuckDB oracle.

Scale notes are attached per query: which side broadcasts, where the
shuffle lands, and why the plan survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..relational import missing_in, present_in
from .registry import dec, register

# ---------------------------------------------------------------------------
# P2/P3/P6/P8/P11: predicate combinations pushed to the parquet scan
# ---------------------------------------------------------------------------


@register(
    "filter_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_linestatus IN ('F', 'O')
      AND l_quantity BETWEEN 10 AND 40
      AND l_shipdate IS NOT NULL
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality + IN-list + range + null-test predicates.

    All four predicates reach the parquet scan (`.explain` shows them
    under PushedFilters), so at 100 TB only matching row groups are
    decoded — the projection also prunes the scan to 6 of 11 columns.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_returnflag") == "R")
        & F.col("l_linestatus").isin("F", "O")
        & F.col("l_quantity").between(10, 40)
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# J1: inner equi-join with broadcast of the small dimension
# ---------------------------------------------------------------------------


@register(
    "revenue_per_segment",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def revenue_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension join: customer is the small side -> broadcast
    hint skips the shuffle entirely; the only exchange is the final
    5-row aggregation. At 100 TB the fact table streams map-side."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J2/J3: left outer join with null accounting (the conformance join shape)
# ---------------------------------------------------------------------------


@register(
    "orders_per_customer_left",
    """
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def orders_per_customer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with zero orders survive with count 0 — the reference's
    left-join + ``na.fill(0)`` idiom (event_verify.py:120-129, :222).
    ``count(col)`` counts only matched rows; no fill needed for counts."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins: the natural spec-vs-observed diff operators
# ---------------------------------------------------------------------------


@register(
    "customers_without_orders",
    # retired round 4 (coverage budget, made room for weighted
    # sampling): at testdata SF every customer has orders, so the
    # active row hashed an empty result — near-zero signal. Anti-join
    # evidence stays verified here in the retired tier and in
    # tests/test_relational.py's missing_in cases.
    retired=True,
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join ('expected but never observed'); shuffle-free when the
    distinct key set of the right side is broadcastable."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return missing_in(customer, orders.withColumnRenamed("o_custkey", "c_custkey"),
                      ["c_custkey"]).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "parts_with_lineitems",
    """
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
)
def parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: existence check with no column pollution / duplication
    from the probe side."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    return present_in(part, li.withColumnRenamed("l_partkey", "p_partkey"),
                      ["p_partkey"]).select("p_partkey", "p_name", "p_brand")


# ---------------------------------------------------------------------------
# U1-U3 + intersect/except (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "user_funnel_set_ops",
    """
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         buyers   AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         errs     AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'click_and_buy' AS cohort, user_id FROM (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers)
    UNION ALL
    SELECT 'click_no_buy' AS cohort, user_id FROM (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    UNION ALL
    SELECT 'any_error' AS cohort, user_id FROM errs
    """,
)
def user_funnel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over user cohorts in one plan.
    Set ops hash-partition on the full row — at scale prefer keeping a
    cohort label column (as the final UNION ALL here does) over
    materializing N separate DataFrames."""
    ev = read_table(spark, sf_dir, "events")
    by = lambda t: ev.where(F.col("event_type") == t).select("user_id").distinct()  # noqa: E731
    clickers, buyers, errs = by("click"), by("purchase"), by("error")
    return (
        clickers.intersect(buyers).select(F.lit("click_and_buy").alias("cohort"), "user_id")
        .unionByName(
            clickers.exceptAll(buyers).select(F.lit("click_no_buy").alias("cohort"), "user_id")
        )
        .unionByName(errs.select(F.lit("any_error").alias("cohort"), "user_id"))
    )


# ---------------------------------------------------------------------------
# O1-O3: global sort + top-k with deterministic tiebreak
# ---------------------------------------------------------------------------


@register(
    "top_orders_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    retired=True,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark executes sort+limit as TakeOrderedAndProject —
    each partition keeps k rows, the driver merges k*partitions — no full
    sort at any scale. Tiebreak on the key makes the result set stable."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Grouping sets: rollup / cube (engine surface beyond the reference — §2.4)
# ---------------------------------------------------------------------------


@register(
    "lineitem_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    retired=True,
)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "lineitem_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    retired=True,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items")
    )


@register(
    "lineitem_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                            (l_linestatus), ())
    """,
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form that subsumes the
    retired lineitem_rollup / lineitem_cube queries (this set list IS
    the cube of the two columns and a superset of the rollup). One
    pass, one shuffle: Spark expands the sets map-side (Expand node),
    so at 100 TB the cost is the scan plus one combinable aggregation,
    not one job per grouping."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Pivot (wide aggregation; inverse of the melt the reference string-builds)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_pivot_by_type",
    """
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
    retired=True,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with EXPLICIT value list: without it Spark runs an extra
    distinct job to discover values and the output schema becomes
    data-dependent — never acceptable at scale."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# A4/A5: distinct and multi-distinct aggregation
# ---------------------------------------------------------------------------


@register(
    "distinct_users_per_type",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    retired=True,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_distinct_users",
    # retired round 4 (coverage budget, made room for the corpus tier):
    # the sketch-accuracy assertion stays verified here and in
    # tests/test_relational.py; exact distinct-count evidence stays
    # active in user_funnel_set_ops
    retired=True,
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the scale path when exact
    distinct's per-group hash sets would spill (SURVEY §2.4). The raw
    sketch value is engine-specific, so the driver-checked columns are
    the exact count plus ``approx_ok`` = |approx-exact|/exact <= 5%
    (rsd=0.02): the oracle's literal TRUE makes the sketch's accuracy
    bound itself the cross-engine assertion. The raw estimate stays a
    pytest assertion (tests/test_relational.py)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("approx_ok"),
        )
    )


@register(
    "orders_rollup_incremental",
    # Retired-tier BREADTH query (registry at its 50-slot cap): the
    # incremental-aggregate-maintenance invariant
    # merge(partial(A), partial(B), partial(C)) == direct(A u B u C)
    # hash-verified on every pytest run — the oracle IS the direct
    # aggregation, so any merge defect (double count, lost key,
    # order-dependent sum) breaks the comparison.
    retired=True,
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
               AS total_spend,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders GROUP BY o_custkey
    """,
)
def orders_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental.partial_aggregate + merge_aggregates: the orders
    table arrives as three deterministic hash-split batches (mimicking
    three daily loads); each batch is partially aggregated alone and
    the states are FOLDED — two merges, exercising associativity —
    never re-scanning earlier batches. Decimal-exact sums make the
    folded state bit-identical to the direct aggregation, which is
    exactly what the oracle computes."""
    from ..incremental import merge_aggregates, partial_aggregate
    from ..packing import hex_bucket

    orders = read_table(spark, sf_dir, "orders")
    specs = {
        "n_orders": ("count", None),
        "total_spend": ("sum", "o_totalprice"),
        "first_order": ("min", "o_orderdate"),
        "last_order": ("max", "o_orderdate"),
    }
    # three "arrival days": a deterministic hash split of the keyspace
    day = F.conv(hex_bucket(F.col("o_orderkey"), 1), 16, 10) % 3
    batches = [
        partial_aggregate(
            orders.where(day == i), ["o_custkey"], specs
        )
        for i in range(3)
    ]
    state = merge_aggregates(
        [merge_aggregates(batches[:2], ["o_custkey"], specs), batches[2]],
        ["o_custkey"],
        specs,
    )
    return state.select(
        F.col("o_custkey").alias("custkey"),
        "n_orders",
        F.col("total_spend").cast("double").alias("total_spend"),
        "first_order",
        "last_order",
    )
