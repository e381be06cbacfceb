"""Skew-join probe: measure what each skew answer actually buys.

scale_slope salts its replicas UNIFORMLY, so it can never see skew;
this probe builds a deliberately pathological join — one hot key owning
``hot_share`` of the fact side — and times three strategies end-to-end:

- ``plain_aqe``    plain equi-join, AQE skew-join splitting ON (the
                   engine default: skewed shuffle partitions split into
                   sub-partitions at runtime);
- ``plain_no_aqe`` the same join with AQE off — the naive baseline a
                   1000-executor cluster would stall on (one task owns
                   hot_share of the shuffle);
- ``salted``       relational.salted_join (explicit salt: the answer
                   when the hot key is ONE key inside ONE partition,
                   which AQE's partition-granular splitting cannot
                   subdivide for a sort-merge join).

All three must return identical aggregates (asserted before timing);
sizes are picked so the hot key's partition dwarfs the rest. Output:
one JSON line {"metric": "skew_probe", ...} — recorded per round next
to SCALE_SLOPE so the "skew has answers" claim carries numbers.

Usage: python tools/skew_probe.py [rows] [hot_share]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9

    from pyspark.sql import functions as F

    from sparkgraft.relational import salted_join
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-skew-probe")
    n_keys = 1000

    # fact: hot_share of rows on key 0, the rest uniform over n_keys;
    # payload column defeats column pruning making the shuffle real
    fact = spark.range(rows).select(
        F.when(
            (F.col("id") % 1_000_000) < int(hot_share * 1_000_000), F.lit(0)
        )
        .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1013).alias("payload"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 17).alias("grp")
    )
    # force a SHUFFLE join: broadcast would sidestep the skew entirely
    # (and real skew pain is fact-fact); disable broadcast for the probe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )

    def agg(df):
        return df.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("payload").alias("s"),
        )

    strategies = {
        "plain_aqe": lambda: agg(fact.join(dim, "k")),
        "plain_no_aqe": lambda: agg(fact.join(dim, "k")),
        "salted": lambda: agg(salted_join(fact, dim, "k", salt_buckets=32)),
    }

    # correctness first: all three agree exactly
    expected = {
        r.grp: (r.n, r.s) for r in strategies["plain_aqe"]().collect()
    }
    got_salted = {r.grp: (r.n, r.s) for r in strategies["salted"]().collect()}
    assert got_salted == expected, "salted join changed the answer"

    times: dict[str, float] = {}
    for name, build in strategies.items():
        spark.conf.set(
            "spark.sql.adaptive.enabled",
            "false" if name == "plain_no_aqe" else "true",
        )
        best = None
        for _ in range(3):
            t0 = time.time()
            build().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    out = {
        "metric": "skew_probe",
        "rows": rows,
        "hot_share": hot_share,
        "n_keys": n_keys,
        "times_sec": times,
        "speedup_vs_no_aqe": {
            k: round(times["plain_no_aqe"] / v, 2) for k, v in times.items()
        },
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
