"""Planted-drift quantizer-training probe (VERDICT r9 #2's "Done"
criterion): does the seeded-md5-uniform training draw actually protect
recall on a time-ordered corpus under drift, where the lowest-id PREFIX
it replaced trains only on the oldest cluster?

Construction: a two-epoch corpus — the LOW half of the id range is
cluster A (old data), the HIGH half cluster B (post-drift data), both
tight Gaussian clouds around orthogonal directions. The training budget
is smaller than cluster A, so the pre-r10 prefix draw sees ZERO cluster
B vectors, while the r10 hash draw covers both clusters ~evenly. Both
quantizers then index the SAME full corpus and serve the SAME cluster-B
query set through ivfpq_topk_from_codes; recall@k is scored against
exact brute-force cosine (similarity.cosine_topk).

Expected mechanics of the degradation (and what the probe verifies):
prefix-trained coarse centroids all live in cluster A, so every B
vector crowds into whichever A lists are nearest AND the residual
codebooks — trained on small A residuals — quantize the huge B
residuals into a few saturated cells; ADC ranking inside cluster B then
collapses toward ties and recall drops. Hash-trained centroids sit on
both clusters, B residuals are small, recall holds.

Output: one JSON line {"metric": "drift_probe", ...} with recall@k for
both training draws on both query epochs; recorded as
artifacts/DRIFT_PROBE_r{N}.json and adjudicated in BENCH_NOTES.md.

Usage: python tools/drift_probe.py [n_per_cluster] [train_budget]
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
N_CENTROIDS = 16
N_PROBE = 4
K = 10


def _build_corpus(spark, n_per_cluster: int):
    """Deterministic two-epoch drifted corpus: ids [0, n) are cluster A
    (axis 0), ids [n, 2n) are cluster B (axis 1) — seeded Gaussian
    jitter, byte-stable across runs."""
    import numpy as np

    rng = np.random.default_rng(10)
    noise = rng.normal(scale=1.0, size=(2 * n_per_cluster, DIM))
    base = np.zeros((2 * n_per_cluster, DIM))
    base[:n_per_cluster, 0] = 10.0
    base[n_per_cluster:, 1] = 10.0
    x = base + noise
    rows = [(i, [float(v) for v in x[i]]) for i in range(2 * n_per_cluster)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(spark, corpus, queries, centroids, books, exact_sets) -> float:
    from sparkgraft import similarity as S

    codes = S.ivfpq_encode(corpus, centroids, books)
    got = {}
    for r in S.ivfpq_topk_from_codes(
        codes, queries, centroids, books, k=K, n_probe=N_PROBE
    ).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(
        len(exact_sets[q] & got.get(q, set())) for q in exact_sets
    )
    return hits / (len(exact_sets) * K)


def main() -> None:
    n_per_cluster = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    train_budget = int(sys.argv[2]) if len(sys.argv) > 2 else 2_048
    assert train_budget < n_per_cluster, (
        "the probe needs the training budget smaller than cluster A so "
        "the prefix draw sees zero post-drift vectors"
    )

    from pyspark.sql import functions as F

    from sparkgraft import similarity as S
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-drift-probe")
    t0 = time.time()
    corpus = _build_corpus(spark, n_per_cluster).persist()
    corpus.count()

    out: dict = {
        "metric": "drift_probe",
        "n_per_cluster": n_per_cluster,
        "train_budget": train_budget,
        "k": K,
        "n_centroids": N_CENTROIDS,
        "recall": {},
    }

    # the r10 default draw vs the pre-r10 prefix draw, trained on the
    # same budget: the prefix is reproduced exactly by restricting the
    # corpus to the lowest `train_budget` ids (all cluster A)
    trained = {
        "hash_sample": S.ivfpq_train(
            corpus, DIM, n_centroids=N_CENTROIDS, m=M, n_codes=N_CODES,
            sample_size=train_budget,
        ),
        "prefix_sample": S.ivfpq_train(
            corpus.where(F.col("vec_id") < train_budget), DIM,
            n_centroids=N_CENTROIDS, m=M, n_codes=N_CODES,
            sample_size=train_budget,
        ),
    }

    for epoch, lo, hi in (
        ("cluster_b_queries", n_per_cluster, 2 * n_per_cluster),
        ("cluster_a_queries", 0, n_per_cluster),
    ):
        step = max(1, n_per_cluster // 100)
        queries = corpus.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            & (F.col("vec_id") % step == 0)
        )
        exact_sets: dict[int, set] = {}
        for r in S.cosine_topk(corpus, queries, k=K).collect():
            exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
        for draw, (centroids, books) in trained.items():
            rec = _recall(spark, corpus, queries, centroids, books, exact_sets)
            out["recall"].setdefault(epoch, {})[draw] = round(rec, 4)
            print(
                f"{epoch:>20} {draw:>14}: recall@{K} = {rec:.4f}",
                file=sys.stderr,
            )

    out["sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
