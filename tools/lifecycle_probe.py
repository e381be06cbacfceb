"""End-to-end ANN index LIFECYCLE rehearsal (VERDICT r10 #4): every
stage of the refresh decision loop has been probed green individually —
this probe runs the whole operational story as ONE composition at probe
scale and measures where the wall-clock actually goes:

  train -> save (versioned store) -> encode -> write codes store ->
  serve -> corpus GROWS 5x AND DRIFTS -> quantizer_stale flags (both
  triggers) -> refresh_quantizer (new vintage, atomic pointer flip) ->
  re-encode -> serve again

and asserts the operational invariants along the way: the stale store's
cluster-B recall is degraded and the refresh restores it; the old codes
store REFUSES the refreshed quantizer (codes_fingerprint guard); the
old vintage keeps serving in-flight readers until gc.

Output: one JSON line {"metric": "lifecycle_probe", "stages": {...},
"recall": {...}, "dominant_stage": ...}; recorded as
artifacts/LIFECYCLE_PROBE_r{N}.json and adjudicated in BENCH_NOTES.md.
Expected dominant stage: the re-encode pass (one Arrow map over the
full grown corpus — at 100 TB this is the pass you schedule, everything
else is bounded driver work).

Usage: python tools/lifecycle_probe.py [n_epoch_a] [growth_factor]
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


def _epoch(spark, lo_id: int, n: int, axis: int, seed: int):
    """Tight deterministic Gaussian cloud around one axis: epoch A on
    axis 0 (pre-drift world), epoch B on axis 1 (post-drift)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.normal(scale=1.0, size=(n, DIM))
    x[:, axis] += 10.0
    rows = [(lo_id + i, [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main() -> None:
    n_a = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    growth = int(sys.argv[2]) if len(sys.argv) > 2 else 5  # total = growth * n_a

    from pyspark.sql import functions as F

    from sparkgraft import similarity as S
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-lifecycle-probe")
    tmp = os.path.join("/tmp", f"lifecycle_probe_{n_a}")
    store = os.path.join(tmp, "quantizer")
    codes_a_dir = os.path.join(tmp, "codes_a")
    codes_b_dir = os.path.join(tmp, "codes_b")

    stages: dict[str, float] = {}

    def stage(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                stages[name] = round(time.time() - self.t0, 2)
                print(f"stage {name:>18}: {stages[name]:7.2f}s", file=sys.stderr)

        return _T()

    epoch_a = _epoch(spark, 0, n_a, axis=0, seed=11).persist()
    epoch_a.count()
    n_total = growth * n_a
    epoch_b = _epoch(spark, n_a, n_total - n_a, axis=1, seed=12)
    full = epoch_a.unionByName(epoch_b).persist()
    full.count()

    # ---- day 0: train on the pre-drift corpus at its hint
    with stage("train"):
        cents_a, books_a = S.ivfpq_train(
            epoch_a, DIM, m=M, n_codes=N_CODES, approx_rows=n_a
        )
    with stage("save"):
        m_a = S.save_quantizer_version(
            spark, store, books_a, centroids=cents_a, training_rows=n_a
        )
    with stage("encode"):
        codes_a = S.ivfpq_encode(epoch_a, cents_a, books_a)
        S.write_codes_store(codes_a, codes_a_dir, m_a)

    queries_a = epoch_a.where(F.col("vec_id") % max(1, n_a // 100) == 0)
    with stage("serve_day0"):
        stored_a = S.read_codes_store(spark, codes_a_dir, m_a)
        day0 = S.ivfpq_topk_from_codes(
            stored_a, queries_a, cents_a, books_a, k=K, n_probe=N_PROBE,
            codes_fingerprint=m_a["fingerprint"],
        ).count()

    # ---- the corpus grows 5x and drifts; is the index stale?
    step_b = max(1, (n_total - n_a) // 100)
    queries_b = epoch_b.where(F.col("vec_id") % step_b == 0)
    with stage("stale_check"):
        drift = S.snapshot_drift(epoch_a, epoch_b, DIM)
        verdict = S.quantizer_stale(
            m_a, current_rows=n_total, drift_df=drift
        )
    assert verdict["stale"], verdict
    reasons = sorted(r.split(":")[0] for r in verdict["reasons"])
    assert reasons == ["centroid_drift", "corpus_grew"], verdict

    # serving the GROWN corpus with the stale quantizer: the appended
    # batches encode under the frozen day-0 codebooks (the monoid), and
    # cluster-B recall shows what staleness costs
    with stage("encode_stale_append"):
        codes_full_stale = S.ivfpq_encode(full, cents_a, books_a).persist()
        codes_full_stale.count()

    exact_b: dict[int, set] = {}
    with stage("exact_baseline"):
        for r in S.cosine_topk(full, queries_b, k=K).collect():
            exact_b.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(codes, cents, books, fp) -> float:
        got: dict[int, set] = {}
        for r in S.ivfpq_topk_from_codes(
            codes, queries_b, cents, books, k=K, n_probe=N_PROBE,
            codes_fingerprint=fp,
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(len(exact_b[q] & got.get(q, set())) for q in exact_b) / (
            len(exact_b) * K
        )

    with stage("serve_stale"):
        recall_stale = recall(
            codes_full_stale, cents_a, books_a, m_a["fingerprint"]
        )

    # ---- execute the verdict: refresh to a new vintage
    with stage("refresh_train"):
        fresh = S.refresh_quantizer(
            spark, store, full, DIM, m=M, n_codes=N_CODES,
            approx_rows=n_total,
        )
    m_b = fresh["manifest"]
    assert m_b["vintage"] != m_a["vintage"]
    # the old codes store must REFUSE the refreshed quantizer
    try:
        S.read_codes_store(spark, codes_a_dir, m_b)
        raise AssertionError("mixed-vintage read did not fail")
    except ValueError:
        pass
    # the old vintage keeps serving in-flight readers
    old = S.load_quantizer(spark, os.path.join(store, m_a["vintage"]))
    assert old["fingerprint"] == m_a["fingerprint"]

    with stage("reencode"):
        codes_full_fresh = S.ivfpq_encode(
            full, fresh["centroids"], fresh["codebooks"]
        )
        S.write_codes_store(codes_full_fresh, codes_b_dir, m_b)
    with stage("serve_fresh"):
        stored_b = S.read_codes_store(spark, codes_b_dir, m_b)
        recall_fresh = recall(
            stored_b, fresh["centroids"], fresh["codebooks"],
            m_b["fingerprint"],
        )
    assert recall_fresh >= recall_stale, (recall_fresh, recall_stale)

    with stage("gc"):
        removed = S.gc_quantizer_vintages(store, keep=0)
    assert m_a["vintage"] in removed
    assert S.load_quantizer(spark, store)["vintage"] == m_b["vintage"]

    # dominant over LIFECYCLE stages only — exact_baseline is the
    # probe's own brute-force scoring harness, not a lifecycle cost
    lifecycle_only = {k: v for k, v in stages.items() if k != "exact_baseline"}
    dominant = max(lifecycle_only, key=lifecycle_only.get)
    out = {
        "metric": "lifecycle_probe",
        "n_epoch_a": n_a,
        "n_total": n_total,
        "dim": DIM,
        "m": M,
        "n_codes": N_CODES,
        "k": K,
        "n_probe": N_PROBE,
        "day0_rows": day0,
        "stale_reasons": reasons,
        "recall_stale": round(recall_stale, 4),
        "recall_fresh": round(recall_fresh, 4),
        "stages": stages,
        "dominant_stage": dominant,
        "gc_removed": removed,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
