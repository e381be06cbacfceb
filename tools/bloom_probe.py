"""Bloom-prune shuffle-bytes probe: measure, don't claim.

``relational.bloom_prune_join``'s docstring says the big side "shuffles
only the ~matching fraction" once the broadcast bitmap filters it
map-side. This probe quantifies that on the sf0.1 lineitem ⋈ filtered-
orders join with broadcast DISABLED (modeling the big-big case where
neither the dim nor its key set broadcasts — only the bitmap does):

- plain:  lineitem.join(orders_filtered) as a shuffle join
- bloom:  bloom_prune_join(lineitem, orders_filtered) — same result

and reports wall time, shuffle read/write bytes, and output-equality
for both. Expected: identical results; bloom shuffle-write on the fact
side collapses to ~the matching fraction (plus the tiny bitmap build).

Usage: python tools/bloom_probe.py [sf_dir] > artifacts/BLOOM_PROBE_r{N}.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import bench
    from sparkgraft.io import read_table
    from sparkgraft.relational import bloom_prune_join
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-bloom-probe")
    # disable BOTH broadcast elections (plan-time and AQE runtime) so
    # the probe models the big-big case: only the bitmap broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    read_metrics = bench._stage_metrics_reader(spark)

    def tables():
        li = read_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice",
            "l_discount",
        )
        orders = (
            read_table(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > 150000)
            )
            .select("o_orderkey")
        )
        return li, orders

    def run(name, build):
        best = None
        for _ in range(3):
            # REBUILD the frame each pass: re-collecting the same plan
            # object reuses the previous job's registered shuffle map
            # outputs, so pass 2+ would report ~zero shuffle bytes and
            # the reuse's wall time, not the join's
            li, orders = tables()
            df = build(li, orders).agg(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                )
                .cast("double")
                .alias("revenue"),
                F.count(F.lit(1)).alias("n"),
            )
            spark.catalog.clearCache()
            read_metrics()  # reset watermark
            t0 = time.time()
            row = df.collect()[0]
            dt = time.time() - t0
            m = read_metrics()
            if best is None or dt < best["sec"]:
                best = {
                    "sec": round(dt, 3),
                    "shuffle_read": m.get("shuffle_read"),
                    "shuffle_write": m.get("shuffle_write"),
                    "revenue": row.revenue,
                    "n": row.n,
                }
        return best

    plain = run("plain", lambda li, o: li.join(o, "o_orderkey"))
    bloom = run("bloom", lambda li, o: bloom_prune_join(li, o, "o_orderkey"))

    out = {
        "metric": "bloom_prune_probe",
        "sf_dir": sf_dir,
        "plain": plain,
        "bloom": bloom,
        "results_equal": plain["revenue"] == bloom["revenue"]
        and plain["n"] == bloom["n"],
        "shuffle_write_ratio": round(
            bloom["shuffle_write"] / max(plain["shuffle_write"], 1), 4
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
