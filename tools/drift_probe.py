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

``--pq`` (r11, VERDICT r10 #8) extends the measurement to the PURE-PQ
path (pq_train -> pq_encode -> pq_adc_topk, no coarse quantizer) at
m=4 AND m=8 with the same hash-vs-prefix draws at the same budget:
pq_train kept a fixed 65536-row sample default when ivf_train's went
scaled, so this measures whether PQ codebook quality on a drifted
corpus demands a scaling rule of its own — the adjudication lives in
BENCH_NOTES (rule only if the measurement demands one).

Usage: python tools/drift_probe.py [n_per_cluster] [train_budget] [--pq]
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
    args = [a for a in sys.argv[1:] if a != "--pq"]
    with_pq = "--pq" in sys.argv[1:]
    n_per_cluster = int(args[0]) if len(args) > 0 else 10_000
    train_budget = int(args[1]) if len(args) > 1 else 2_048
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

    pq_trained: dict = {}
    pq_codes: dict = {}
    if with_pq:
        out["pq_recall"] = {}
        prefix = corpus.where(F.col("vec_id") < train_budget)
        for m_pq in (4, 8):
            pq_trained[(m_pq, "hash_sample")] = S.pq_train(
                corpus, DIM, m=m_pq, n_codes=N_CODES,
                sample_size=train_budget,
            )
            pq_trained[(m_pq, "prefix_sample")] = S.pq_train(
                prefix, DIM, m=m_pq, n_codes=N_CODES,
                sample_size=train_budget,
            )
        for key, books in pq_trained.items():
            pq_codes[key] = S.pq_encode(corpus, books).persist()
            pq_codes[key].count()

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
        for (m_pq, draw), books in pq_trained.items():
            got: dict[int, set] = {}
            for r in S.pq_adc_topk(
                pq_codes[(m_pq, draw)], queries, books, k=K
            ).collect():
                got.setdefault(r.query_id, set()).add(r.vec_id)
            rec = sum(
                len(exact_sets[q] & got.get(q, set())) for q in exact_sets
            ) / (len(exact_sets) * K)
            out["pq_recall"].setdefault(epoch, {}).setdefault(
                f"m{m_pq}", {}
            )[draw] = round(rec, 4)
            print(
                f"{epoch:>20} pq m={m_pq} {draw:>14}: recall@{K} = "
                f"{rec:.4f}",
                file=sys.stderr,
            )

    out["sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
