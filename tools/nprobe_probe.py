"""n_probe sizing probe (r10 follow-through on making auto_n_centroids
the DEFAULT): fixed ``n_probe=4`` probes 4/16 = 25% of the old
fixed-16 index but only 4/112 = 3.6% of the auto-sized index the same
corpus now gets by default — so the r10 sizing change silently trades
recall unless n_probe scales too. This probe measures recall@k against
exact brute-force cosine on a 100k isotropic corpus (the ivf_skew_probe
builder) across (n_centroids, n_probe) configurations, to ground an
``auto_n_probe`` rule: the candidate is n_probe ~ sqrt(n_centroids)
(probed candidate volume then falls as N/sqrt(K) — still shrinking
with corpus growth — while list coverage grows with K).

Output: one JSON line {"metric": "nprobe_probe", ...} with recall@k
and serving wall per configuration (interleaved, warm-up discarded);
recorded as artifacts/NPROBE_PROBE_r{N}.json, adjudicated in
BENCH_NOTES.md, and — if the measurement demands it — encoded as the
n_probe default.

Usage: python tools/nprobe_probe.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16
M = 4
N_CODES = 32
K = 10
PASSES = 2


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from sparkgraft import similarity as S
    from sparkgraft.session import get_spark
    from tools.ivf_skew_probe import _build

    spark = get_spark("sparkgraft-nprobe-probe")
    corpus = _build(spark, "balanced", n).persist()
    corpus.count()
    queries = corpus.where(F.col("vec_id") % (n // n_queries) == 0)
    exact: dict[int, set] = {}
    for r in S.cosine_topk(corpus, queries, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    auto_k = S.auto_n_centroids(n)
    configs = [
        ("fixed16_p4", 16, 4),                  # the pre-r10 default pair
        (f"auto{auto_k}_p4", auto_k, 4),        # r10 K with legacy n_probe
        (
            f"auto{auto_k}_sqrtp",
            auto_k,
            max(4, math.ceil(math.sqrt(auto_k))),
        ),                                       # the candidate rule
        (f"auto{auto_k}_p16", auto_k, 16),       # upper reference
    ]

    staged = {}
    for name, k_lists, n_probe in configs:
        centroids, books = S.ivfpq_train(
            corpus, DIM, n_centroids=k_lists, m=M, n_codes=N_CODES
        )
        codes = S.ivfpq_encode(corpus, centroids, books).persist()
        codes.count()
        staged[name] = (centroids, books, codes, n_probe)

    out: dict = {
        "metric": "nprobe_probe",
        "n_vectors": n,
        "n_queries": n_queries,
        "k": K,
        "auto_n_centroids": auto_k,
        "configs": {},
    }
    for name, (centroids, books, codes, n_probe) in staged.items():
        got: dict[int, set] = {}
        for r in S.ivfpq_topk_from_codes(
            codes, queries, centroids, books, k=K, n_probe=n_probe
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        recall = sum(
            len(exact[q] & got.get(q, set())) for q in exact
        ) / (len(exact) * K)
        out["configs"][name] = {
            "n_centroids": len(centroids),
            "n_probe": n_probe,
            "recall": round(recall, 4),
        }

    # interleaved serving wall, warm-up discarded
    for name, (centroids, books, codes, n_probe) in staged.items():
        S.ivfpq_topk_from_codes(
            codes, queries, centroids, books, k=K, n_probe=n_probe
        ).count()
    walls: dict[str, list[float]] = {name: [] for name in staged}
    for _ in range(PASSES):
        for name, (centroids, books, codes, n_probe) in staged.items():
            t0 = time.time()
            S.ivfpq_topk_from_codes(
                codes, queries, centroids, books, k=K, n_probe=n_probe
            ).count()
            walls[name].append(time.time() - t0)
    for name in staged:
        out["configs"][name]["sec"] = round(min(walls[name]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
