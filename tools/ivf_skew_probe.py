"""IVF hot-list skew probe (VERDICT r9 'What's missing' #3): all the
IVF/IVF-PQ slope probes ran on uniform-ish embeddings, but a REAL
corpus clusters — and a clustered corpus concentrates vectors in few
coarse lists, making the cid-keyed candidate join hot on exactly the
lists most queries probe (queries come from the same distribution).
This probe measures that regime head-on, the BM25 skew probe's
methodology (interleaved sweeps, warm-up discarded, volumes counted
from the plan's own keys):

Corpora at equal N (seeded, byte-stable):
- ``balanced``: isotropic Gaussian vectors — every direction equally
  likely, lists fill ~evenly;
- ``clustered``: 80% of vectors in ONE tight cluster + 20% isotropic
  background, queries drawn from the same mixture — the adversarial
  case where naive bucketing sends 80% of queries to the same lists.

Reported per corpus (both through the r10 DEFAULT path — auto-sized
n_centroids from the row count, hash-drawn training sample):
- ``list_sizes``: max / p50 / gini-ish top-share of the inverted-list
  histogram from the codes store (is the index itself skewed?);
- ``cand_rows``: the TOTAL candidate-join volume — sum over queries of
  their probed lists' sizes (the exact row count the cid-keyed shuffle
  moves; the quantity that blows up if the hot list dominates);
- ``sec``: ivfpq_topk_from_codes wall, min over interleaved sweeps.

The k-means hypothesis under test: a TRAINED quantizer allocates
centroids by data density (the hot cluster splits into many lists), so
candidate volume should stay near-balanced — unlike hash bucketing.
If the clustered corpus's cand_rows blow up instead, a per-list
candidate cap / probe-spill guard is warranted (VERDICT: "a guard only
if the measurement demands one").

Output: one JSON line {"metric": "ivf_skew_probe", ...}; recorded as
artifacts/IVF_SKEW_PROBE_r{N}.json and adjudicated in BENCH_NOTES.md.

Usage: python tools/ivf_skew_probe.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16
M = 4
N_CODES = 32
N_PROBE = 4
K = 10
PASSES = 2


def _build(spark, kind: str, n: int):
    import numpy as np

    rng = np.random.default_rng(11)
    if kind == "balanced":
        x = rng.normal(size=(n, DIM))
    else:
        n_hot = int(n * 0.8)
        center = np.zeros(DIM)
        center[0] = 10.0
        hot = center + rng.normal(scale=0.5, size=(n_hot, DIM))
        bg = rng.normal(size=(n - n_hot, DIM))
        x = np.concatenate([hot, bg])
        # interleave hot/background by a seeded shuffle so ids don't
        # correlate with cluster membership (the drift probe owns that
        # axis; here the corpus is clustered but stationary)
        x = x[rng.permutation(n)]
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from sparkgraft import similarity as S
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-ivf-skew-probe")
    out: dict = {
        "metric": "ivf_skew_probe",
        "n_vectors": n,
        "n_queries": n_queries,
        "n_probe": N_PROBE,
        "corpora": {},
    }

    staged = {}
    for kind in ("balanced", "clustered"):
        corpus = _build(spark, kind, n).persist()
        corpus.count()
        queries = corpus.where(F.col("vec_id") % (n // n_queries) == 0)
        # the r10 DEFAULT path: auto-sized lists from the row hint,
        # hash-drawn training sample
        centroids, books = S.ivfpq_train(
            corpus, DIM, m=M, n_codes=N_CODES, approx_rows=n
        )
        codes = S.ivfpq_encode(corpus, centroids, books).persist()
        codes.count()
        staged[kind] = (corpus, queries, centroids, books, codes)

        # index skew: the inverted-list histogram from the codes store
        sizes = sorted(
            (r["c"] for r in codes.groupBy("cid").agg(
                F.count("*").alias("c")).collect()),
            reverse=True,
        )
        total = sum(sizes)
        # candidate volume: per query, the sizes of its probed lists —
        # counted through the SAME probe udf the serving join uses
        probed = queries.select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                S.ivf_probe_udf(centroids, DIM, N_PROBE)(F.col("embedding"))
            ).alias("cid"),
        )
        size_df = codes.groupBy("cid").agg(F.count("*").alias("list_size"))
        per_q = (
            probed.join(size_df, "cid")
            .groupBy("query_id")
            .agg(F.sum("list_size").alias("cand"))
            .agg(
                F.sum("cand").alias("total"),
                F.max("cand").alias("mx"),
                F.avg("cand").alias("mean"),
            )
            .collect()[0]
        )
        out["corpora"][kind] = {
            "n_centroids": len(centroids),
            "list_size_max": sizes[0],
            "list_size_p50": sizes[len(sizes) // 2],
            "top4_list_share": round(sum(sizes[:4]) / total, 4),
            "cand_rows_total": int(per_q["total"]),
            "cand_rows_max_per_query": int(per_q["mx"]),
            "cand_rows_mean_per_query": round(float(per_q["mean"]), 1),
        }

    # interleaved wall sweeps, warm-up discarded (BM25-probe method)
    for kind, (corpus, queries, centroids, books, codes) in staged.items():
        S.ivfpq_topk_from_codes(
            codes, queries, centroids, books, k=K, n_probe=N_PROBE
        ).count()  # warm-up, discarded
    walls: dict[str, list[float]] = {k: [] for k in staged}
    for _ in range(PASSES):
        for kind, (corpus, queries, centroids, books, codes) in staged.items():
            t0 = time.time()
            S.ivfpq_topk_from_codes(
                codes, queries, centroids, books, k=K, n_probe=N_PROBE
            ).count()
            walls[kind].append(time.time() - t0)
    for kind in staged:
        out["corpora"][kind]["sec"] = round(min(walls[kind]), 3)
    bal = out["corpora"]["balanced"]
    clu = out["corpora"]["clustered"]
    out["clustered_over_balanced"] = {
        "cand_rows": round(clu["cand_rows_total"] / bal["cand_rows_total"], 3),
        "sec": round(clu["sec"] / bal["sec"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
