"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collection cost). The session is warmed once so JVM/
codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # flagship + reference-shaped core
    "conformance_flagship",
    "conformance_pipeline_versioned",
    "conformance_three_payload",
    "pricing_summary",
    "revenue_per_segment",
    "user_funnel_set_ops",
    "doc_importance_resampling",
    "lineitem_grouping_sets",
    # windows / sessionization / as-of
    "user_sessions",
    "last_order_asof_event",
    "open_lineitems_per_day",
    # JSON introspection
    "json_extract_events",
    # contracts
    "documents_contract_report",
    # LLM-pipeline extensions
    "corpus_vocab_topk",
    "corpus_dup_ngram_stats",
    "doc_embedding_profile",
    "pack_training_sequences",
    "domain_mixture_epochs",
    "quality_percentile_filter",
    "doc_gopher_quality_gate",
    "tfidf_top_terms",
    "corpus_curation_pipeline",
    "dedup_exact_keep_first",
    "dedup_repeated_spans",
    "decontaminate_docs",
    "ngram_jaccard_near_dups",
    "minhash_lsh_near_dups",
    "simhash_by_doc",
    "knn_cosine_bruteforce",
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_planted",
    "semantic_dedup_embeddings",
    "ann_lsh_top1_planted",
    "ann_ivf_top1_planted",
    "label_centroid_similarity",
    # r6 second-continuation promotion (rotation policy; the other
    # promotion, near_dup_quality_keep, is iterative and so pinned via
    # ITERATIVE_LINEAGE_PINS rather than benched — the
    # near_dup_doc_clusters precedent)
    "suppliers_sole_returned",
]


def _stage_metrics_reader(spark):
    """Per-query executor-metric deltas from the JVM AppStatusStore.

    Returns a closure that, on each call, sums shuffle read/write and
    spill bytes over every stage whose stageId is above the previous
    call's watermark — i.e. the stages the just-finished query ran.
    Stage IDs are monotonic, so UI stage eviction (which only drops the
    oldest entries) cannot corrupt the deltas the way a cumulative-sum
    snapshot would. The listener bus is drained first so task-end
    metric updates are not attributed to the next query.
    """
    sc = spark.sparkContext
    gw = sc._gateway
    jsc = sc._jsc.sc()
    store = jsc.statusStore()
    watermark = -1

    def read() -> dict[str, int]:
        nonlocal watermark
        try:
            jsc.listenerBus().waitUntilEmpty()
            seq = store.stageList(
                gw.jvm.java.util.ArrayList(),  # all statuses
                False,  # no task details
                False,  # no summaries
                gw.new_array(gw.jvm.double, 0),
                gw.jvm.java.util.ArrayList(),
            )
            totals = {"shuffle_read": 0, "shuffle_write": 0,
                      "spill_mem": 0, "spill_disk": 0}
            top = watermark
            it = seq.iterator()
            while it.hasNext():
                s = it.next()
                sid = s.stageId()
                if sid <= watermark:
                    continue
                top = max(top, sid)
                totals["shuffle_read"] += s.shuffleReadBytes()
                totals["shuffle_write"] += s.shuffleWriteBytes()
                totals["spill_mem"] += s.memoryBytesSpilled()
                totals["spill_disk"] += s.diskBytesSpilled()
            watermark = top
            return totals
        except Exception:
            # metrics are diagnostics, never a bench failure
            return {}

    return read


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as E
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-bench")
    queries = E.queries()

    # warm: JVM, parquet footers/page cache, codegen paths — so query
    # timings measure the plans, not first-touch filesystem costs
    from sparkgraft.io import TPCH_TABLES, read_table

    spark.range(1000).selectExpr("sum(id)").collect()
    for t in TPCH_TABLES:
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:
            pass
    # throwaway warm run of the suite opener: codegen/broadcast/AQE
    # machinery for the conformance shape compiles here, so the first
    # measured query stops absorbing residual JVM warmup (it measured
    # 1.8-7.9s across rounds as the opener with no code change)
    queries["conformance_flagship"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    # three passes, keep the min: single-JVM local mode has multi-second
    # run-to-run jitter (JIT compilation of generated code, GC, AQE
    # timing); min-of-2 published a 6x-off artifact in round 3
    # (conformance_pipeline_versioned 20.4s vs 3.26s on re-run), so the
    # min is taken over three. The cache is cleared between passes so
    # persisted intermediates don't carry over — only code/page-cache
    # warmth does.
    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    exec_metrics: dict[str, dict[str, list[int]]] = {
        name: {"shuffle_read": [], "shuffle_write": [],
               "spill_mem": [], "spill_disk": []}
        for name in HEADLINE
    }
    read_metrics = _stage_metrics_reader(spark)
    read_metrics()  # consume warmup stages so pass 1 starts clean
    for _ in range(3):
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = queries[name]
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            passes[name].append(round(time.time() - t0, 3))
            for k, v in read_metrics().items():
                exec_metrics[name][k].append(v)

    # "queries" stays the min per query (the stable plan-cost estimate);
    # "passes" publishes all three raw times so a driver-vs-local
    # outlier (r4: LSH 7.96s driver vs 2.31s judge re-run) is
    # attributable at a glance to contention (one bad pass) vs a plan
    # change (all passes moved)
    timings = {name: min(ps) for name, ps in passes.items()}
    total = round(sum(timings.values()), 3)
    # per-pass shuffle/spill bytes make driver-bench outliers
    # attributable at a glance: a slow pass with spill_disk > 0 is
    # memory pressure; one with identical bytes across passes is host
    # contention/JIT, not a plan or data-volume change
    exec_out = {
        name: m
        for name, m in exec_metrics.items()
        if any(m.values()) and any(sum(v) > 0 for v in m.values())
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "passes": passes,
                "exec_bytes_per_pass": exec_out,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
