"""Scale-slope probe: do the dedup / similarity plans scale ~linearly?

The fixed-sf bench cannot see superlinear behavior — a plan that is
accidentally O(n^2) in candidates looks fine at one scale. This probe
stages the sf0.1 ``documents`` / ``embeddings`` tables at 1x and Nx
(default 8x) and times the headline dedup/ANN queries at both, printing
sec, sec-per-1k-rows, and the observed slope t(Nx)/t(1x). Linear plans
land near N (plus fixed overhead, so usually below N); a quadratic
candidate stage would land near N^2.

Replicas are SALTED so they form independent mini-corpora rather than
exact copies (exact copies would inflate near-dup output quadratically
and measure output explosion, not plan slope):
- documents: replica k prefixes the text with ``r<k> `` (all shingle /
  minhash / simhash / fingerprint features diverge across replicas) and
  offsets doc_id by k*10M;
- embeddings: replica k circularly rotates the 64-dim vector by 7k
  positions (norm and distribution preserved; cross-replica cosine is
  ~random, within-replica structure identical) and offsets vec_id.

Usage: python tools/scale_slope.py [factor] [sf_dir]
Output: one JSON line {"metric": "scale_slope", ...} plus a table on
stderr; results are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    # documents-based
    "dedup_exact_keep_first",
    "ngram_jaccard_near_dups",
    "minhash_lsh_near_dups",
    "simhash_by_doc",
    # embeddings-based
    "knn_cosine_bruteforce",
    "embedding_near_dup_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "label_centroid_similarity",
]


def stage(spark, sf_dir: str, out_dir: str, factor: int) -> dict[str, int]:
    from pyspark.sql import functions as F

    from sparkgraft.io import read_table

    rep = F.col("replica")
    docs = read_table(spark, sf_dir, "documents").crossJoin(
        spark.range(factor).withColumnRenamed("id", "replica")
    )
    staged_docs = docs.select(
        (F.col("doc_id") + rep * 10_000_000).alias("doc_id"),
        F.when(rep == 0, F.col("text"))
        .otherwise(F.concat(F.lit("r"), rep.cast("string"), F.lit(" "), F.col("text")))
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    staged_docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = read_table(spark, sf_dir, "embeddings").crossJoin(
        spark.range(factor).withColumnRenamed("id", "replica")
    )
    rot = (rep * 7 % 64).cast("int")
    staged_emb = emb.select(
        (F.col("vec_id") + rep * 10_000_000).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding"), rot + 1, F.lit(64) - rot),
            F.slice(F.col("embedding"), 1, rot),
        ).alias("embedding"),
        "label",
    )
    staged_emb.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    from sparkgraft.io import read_table as rt

    return {
        "documents": rt(spark, out_dir, "documents").count(),
        "embeddings": rt(spark, out_dir, "embeddings").count(),
    }


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-scale-slope")
    queries = E.queries()
    results: dict[str, dict] = {name: {} for name in PROBES}
    row_counts: dict[int, dict[str, int]] = {}

    for f in (1, factor):
        work = tempfile.mkdtemp(prefix=f"sparkgraft-slope-{f}x-")
        try:
            row_counts[f] = stage(spark, sf_dir, work, f)
            # one warm pass at 1x covers codegen; per-query min-of-2
            for name in PROBES:
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    queries[name](spark, work).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                results[name][f] = round(best, 3)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    print(
        f"{'query':32} {'t(1x)':>8} {'t(' + str(factor) + 'x)':>8} "
        f"{'slope':>6}  (linear ~<= {factor})",
        file=sys.stderr,
    )
    slopes = {}
    for name in PROBES:
        t1, tn = results[name][1], results[name][factor]
        slope = round(tn / t1, 2) if t1 > 0 else None
        slopes[name] = {"t_1x": t1, f"t_{factor}x": tn, "slope": slope}
        print(f"{name:32} {t1:8.3f} {tn:8.3f} {slope:6.2f}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_slope",
                "factor": factor,
                "sf_dir": sf_dir,
                "rows": row_counts,
                "queries": slopes,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
