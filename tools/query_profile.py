"""Per-stage profile of one or more headline queries (guide §1).

Runs each named query warm (N throwaway + M measured noop-sink passes
in one session) and prints, per measured pass, the wall seconds plus a
per-stage breakdown from the JVM AppStatusStore: stage id, name,
task count, executor-run time, shuffle read/write bytes, spill.
This is the stage-level view the Spark UI would give (the UI is
disabled in this environment), so optimization targets are named by
STAGE, not guessed from the plan.

Usage: python tools/query_profile.py <query> [query ...] [--sf DIR]
       [--passes N] [--warm K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_reader(spark):
    sc = spark.sparkContext
    gw = sc._gateway
    jsc = sc._jsc.sc()
    store = jsc.statusStore()
    watermark = -1

    def read() -> list[dict]:
        nonlocal watermark
        jsc.listenerBus().waitUntilEmpty()
        seq = store.stageList(
            gw.jvm.java.util.ArrayList(),
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.ArrayList(),
        )
        out = []
        top = watermark
        it = seq.iterator()
        while it.hasNext():
            s = it.next()
            sid = s.stageId()
            if sid <= watermark:
                continue
            top = max(top, sid)
            out.append(
                {
                    "id": sid,
                    "name": str(s.name())[:90],
                    "tasks": s.numCompleteTasks(),
                    "run_ms": s.executorRunTime(),
                    "cpu_ms": s.executorCpuTime() // 1_000_000,
                    "sh_read": s.shuffleReadBytes(),
                    "sh_write": s.shuffleWriteBytes(),
                    "spill": s.memoryBytesSpilled() + s.diskBytesSpilled(),
                    "in_bytes": s.inputBytes(),
                }
            )
        watermark = top
        return sorted(out, key=lambda d: d["id"])

    return read


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    passes, warm = 2, 1
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        elif args[i] == "--warm":
            warm = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from sparkgraft import queries as Q
    from sparkgraft.session import get_spark

    spark = get_spark("query-profile")
    read = stage_reader(spark)
    # session warm-up: JVM + parquet footers
    spark.range(1000).selectExpr("sum(id)").collect()
    all_q = dict(Q.QUERIES)
    all_q.update(Q.RETIRED_QUERIES)
    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        for w in range(warm):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            print(f"[{name}] warm pass {w}: {time.time() - t0:.3f}s")
            read()  # discard warm stages
        for p in range(passes):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
            stages = read()
            print(f"\n[{name}] pass {p}: wall {wall:.3f}s, "
                  f"{len(stages)} stages")
            tot_run = sum(s["run_ms"] for s in stages)
            for s in stages:
                print(
                    f"  stage {s['id']:4d} tasks={s['tasks']:3d} "
                    f"run={s['run_ms']:6d}ms cpu={s['cpu_ms']:6d}ms "
                    f"shR={s['sh_read']:>9d} shW={s['sh_write']:>9d} "
                    f"in={s['in_bytes']:>9d} spill={s['spill']} "
                    f" {s['name']}"
                )
            print(f"  total executor-run {tot_run}ms across stages "
                  f"(wall includes driver/planning gaps)")
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
