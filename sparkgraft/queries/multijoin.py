"""Multi-table join pipelines (TPC-H Q3/Q5/Q10 shapes).

The reference's joins are two-table, single-hop (event_verify.py:101,
:120-129, :215). These queries exercise the join-planning surface that
actually decides 100 TB performance: 3-6 table chains where Catalyst +
AQE must pick broadcast vs shuffle per hop, reorder around selective
dimension filters, and keep the fact table streaming map-side through
every broadcast hop.

Scale design, common to all three:
- dimension filters (`c_mktsegment`, `r_name`) are applied BEFORE the
  join so the broadcast side is minimal and the filter reaches the
  parquet scan as a pushed predicate;
- date-range predicates on the fact tables prune row groups (and, on a
  date-partitioned production table, whole partitions);
- revenue math runs in exact DECIMAL then casts to double once, so the
  result is identical under any partitioning / aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import dec, register

# revenue term: l_extendedprice * (1 - l_discount), decimal-exact.
# Spark DECIMAL(18,2) * DECIMAL(18,2) and DuckDB both produce an exact
# product; the sum stays exact and only the final cast is lossy.
_REV_SQL = "SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))"


def _revenue() -> F.Column:
    return F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))


@register(
    "shipping_priority_top10",
    # RETIRED r7 (rotation policy: three-round-stable; slot funds the
    # bloom_pruned_urgent_revenue promotion; O1 stays covered by the
    # retired-tier oracle checks run every pytest + sf0.1 sweep).
    retired=True,
    oracle=f"""
    SELECT l_orderkey,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers -> their unshipped
    orders -> top-10 by open revenue.

    Join order matters at scale: customer is filtered to one segment
    (~1/5) and broadcast into orders; the surviving (orderkey) set joins
    lineitem on its natural key. lineitem never shuffles — both hops are
    broadcast from the fact table's perspective at bench scale, and at
    100 TB AQE downgrades only the orders⋈lineitem hop to sort-merge on
    l_orderkey. Final ORDER BY+LIMIT is TakeOrderedAndProject (per-
    partition top-k, no global sort); revenue ties break on l_orderkey.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(
            orders.where(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume",
    # retired round 4 (coverage budget): multi-join chain evidence stays
    # active via shipping_priority_top10 (Q3) and
    # returned_items_top_customers (Q10)
    retired=True,
    oracle=f"""
    SELECT n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with the non-key constraint
    c_nationkey = s_nationkey ("customer and supplier in the same
    nation"), revenue per nation within one region.

    region -> nation is pre-joined and broadcast (25 rows after the
    r_name filter); supplier and customer each broadcast-join it, then
    broadcast into the fact chain. The one genuinely big hop, orders ⋈
    lineitem, runs on the orderkey both tables already share — at 100 TB
    bucketing both by orderkey (io.write_bucketed) makes it shuffle-free.
    The same-nation constraint lands as a post-join filter on two
    broadcast-carried columns, costing nothing extra.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    asia_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(
                supplier.join(
                    F.broadcast(asia_nations),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_nationkey", "n_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(_revenue().cast("double").alias("revenue"))
    )


@register(
    "returned_items_top_customers",
    # retired r6 (slot rotation): two-round-stable; the TPC-H chain
    # family keeps driver evidence via shipping_priority_top10
    retired=True,
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue in a quarter-ish
    window — fact-side filter (l_returnflag) + two broadcast dims.

    The l_returnflag predicate is pushed to the lineitem scan (dictionary-
    encoded column -> whole row groups skip); orders' date range prunes
    its scan; customer and nation broadcast. Group-by key includes the
    customer attributes so no second join is needed to re-attach them.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.join(
                    F.broadcast(nation),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                ).select("c_custkey", "c_name", "n_name", "c_acctbal")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_revenue().cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "open_lineitems_per_day",
    # RETIRED r8 (three-round-stable; slot funds the r8 promotions —
    # rotation policy; oracle intact, verified every pytest run)
    retired=True,
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1998-02-01'
    ),
    iv AS (
        SELECT CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS e
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, count(*) AS n_open
    FROM days d JOIN iv ON d.day >= iv.s AND d.day < iv.e
    GROUP BY 1
    """,
)
def open_lineitems_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via ``relational.range_join``: for every distinct
    order date, how many lineitems were OPEN (ordered, not yet
    shipped) — points = the distinct order days of one reporting
    month (the dashboard shape: a bounded point set against the full
    interval table), intervals = each lineitem's [order day, ship day).
    This corpus's synthetic ship dates are uniform over the whole date
    range (~850-day average span, not TPC-H lead times), so an
    all-days variant is inherently ~|days| x ~10k open rows of output;
    the month restriction bounds output while every interval still
    flows through the bucket join. The oracle states the naive
    non-equi join, which Spark would plan as a nested loop; the
    executed plan is range_join's bucket decomposition — an equi-join
    on 64-day time buckets (~1-3 replicas per interval at TPC-H lead
    times) plus the exact predicate, nothing quadratic (asserted in
    tests/test_plan_shape.py)."""
    from ..relational import range_join

    epoch = "1970-01-01"
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    points = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-02-01").cast("timestamp_ntz"))
        )
        .select(F.to_date("o_orderdate").alias("day"))
        .distinct()
        .withColumn("__t", F.datediff(F.col("day"), F.lit(epoch)))
    )
    iv = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.datediff(F.to_date("o_orderdate"), F.lit(epoch)).alias("__s"),
            F.datediff(F.to_date("l_shipdate"), F.lit(epoch)).alias("__e"),
        )
    )
    return (
        range_join(points, iv, "__t", "__s", "__e", bucket_width=64)
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_open"))
    )


# --- Retired-tier breadth: more TPC-H join/agg shapes. These never
# consume driver slots; tests/test_retired_oracles.py verifies each
# against its DuckDB oracle on every pytest run.


@register(
    "large_order_customers",
    # PROMOTED to the active driver gate r11 (rotation policy, VERDICT
    # r10 #5: a never-slotted breadth query takes a driver slot; funded
    # by retiring the two-round-stable token_fertility_by_source) —
    # TPC-H Q18 is the canonical agg-HAVING-over-3-table-chain shape
    # and had never ridden the driver gate.
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4
    HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 140
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING over a 3-table chain — which
    customers placed orders totaling > 140 units. The quantity sum runs
    in exact decimal (order-independent), and the HAVING filter sits on
    the aggregate so AQE sees the real post-agg cardinality."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .where(F.col("__qty") > 140)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "orderdate",
            F.col("__qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "orders_shipped_before_ordered",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate < o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    retired=True,
)
def orders_shipped_before_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape, repurposed as a data-quality probe: orders with
    at least one lineitem shipped BEFORE the order date (a timeline
    anomaly this synthetic corpus actually contains), counted per
    priority. EXISTS compiles to a LEFT SEMI join with a compound
    condition — the probe side never duplicates order rows however
    many lineitems match."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate < orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "discount_revenue_band",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue_delta,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_quantity < 24
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
    retired=True,
)
def discount_revenue_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: a single-row scalar aggregate behind selective
    range predicates — the pure scan-efficiency query (every predicate
    pushes to the parquet scan; at scale this is a row-group pruning
    exercise, no shuffle beyond the final 1-row combine)."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "promo_revenue_share",
    # Retired-tier breadth (TPC-H Q14 shape): conditional-revenue ratio
    # over a scan-pruned month of lineitem joined to part.
    retired=True,
    oracle=f"""
    SELECT round(100.0 * CAST(
               SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST({_REV_SQL} AS DOUBLE), 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: what share of one month's revenue came from
    promo parts — a conditional aggregate RATIO in one pass (never two
    scans; the CASE splits the revenue term inside the same
    aggregation). The ship-month predicate prunes the lineitem scan;
    part joins on its key (broadcast at small SF, shuffle-hash at
    100 TB); decimal-exact sums make the ratio partitioning-stable."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / _revenue().cast("double"),
                4,
            ).alias("promo_share_pct")
        )
    )


@register(
    "late_lines_by_priority",
    # Retired-tier breadth (TPC-H Q12 shape, adapted: this corpus has
    # no shipmode/commitdate, so "late" = shipped > 60 days after the
    # order date): compound-CASE priority counts over the join.
    retired=True,
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: among lines shipped late (> 60 days after
    their order date), how many carried urgent/high vs lower order
    priorities, per line status — the join-then-compound-CASE counting
    pattern. The lateness predicate references both sides, so it
    applies post-join (not pushable); the aggregate is map-side
    combinable on a 2-value group key."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    # NULL o_orderpriority lands in NEITHER count on BOTH engines:
    # Spark's sum() skips the NULL produced by isin/~isin, and the
    # oracle's two CASEs each fall to ELSE 0 when IN/NOT IN is NULL —
    # identical totals (testdata has no NULL priorities; this keeps
    # parity if that ever changes)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).cast("bigint").alias("high_priority_lines"),
            F.sum((~high).cast("bigint")).cast("bigint").alias("low_priority_lines"),
        )
    )


@register(
    "cross_nation_trade_flows",
    # Retired-tier breadth (TPC-H Q7 shape): the same dimension table
    # joined twice under different aliases (customer's nation vs
    # supplier's nation), revenue per directed nation pair and year.
    retired=True,
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST({_REV_SQL} AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def cross_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between DIFFERENT customer and
    supplier nations, per directed pair and ship year — a 5-table
    chain where the nation dimension broadcasts TWICE under distinct
    aliases (one per role), the self-aliased-dimension pattern a
    single-join registry otherwise never exercises. Fact tables join
    on their keys; both nation copies broadcast at any scale (25
    rows); the inequality filter applies after both attach."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("__cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("__sn_key"))
        .where(F.col("__cn_key") != F.col("__sn_key"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            _revenue().cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@register(
    "orders_segment_scd2",
    # PROMOTED to a driver slot r6 (rotation policy): the SCD2
    # temporal dimension join.
    # The dimension history is synthesized deterministically from
    # customer: version 1 carries c_mktsegment over
    # [1992-01-01, 1995-07-01), version 2 carries c_mktsegment || '_v2'
    # open-ended from 1995-07-01 — orders span both regimes, so the
    # as-of boundary, the version flip, and the open interval are all
    # exercised (plus NULL-out correctness for any pre-1992 fact).
    oracle="""
    WITH dim AS (
        SELECT c_custkey AS custkey, c_mktsegment AS segment,
               TIMESTAMP '1992-01-01' AS valid_from,
               TIMESTAMP '1995-07-01' AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_mktsegment || '_v2',
               TIMESTAMP '1995-07-01', NULL
        FROM customer
    )
    SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
           o.o_orderdate AS orderdate, d.segment
    FROM orders o LEFT JOIN dim d
      ON o.o_custkey = d.custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    """,
)
def orders_segment_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relational.scd2_join: each order carries the market segment its
    customer was in WHEN THE ORDER WAS PLACED, against a two-version
    SCD2 history. The plan is the union-merge as-of (one custkey
    shuffle + sort), never the oracle's interval-predicate join — at
    100 TB the predicate join is a per-key partial cross product,
    while the merge is O(n log n) regardless of how many versions a
    hot customer accumulates."""
    from ..relational import scd2_join

    cust = read_table(spark, sf_dir, "customer")
    v1 = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit("1995-07-01").cast("timestamp_ntz").alias("valid_to"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("segment"),
        F.lit("1995-07-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("orderdate"),
    )
    return scd2_join(
        orders, dim, on="custkey", fact_time="orderdate"
    ).select("orderkey", "custkey", "orderdate", "segment")
