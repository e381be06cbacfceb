"""BM25 term-skew probe: what does the max_df_ratio prune buy?

VERDICT r7 'What's missing' #2: bm25_topk's 8x scale probe ran on a
benign synthetic vocabulary; real corpora are Zipfian, and the postings
join is the one place the retrieval tier can go quadratic-ish — a
query containing a stopword joins ~|corpus| postings for that term
while its idf (~ln(1/ratio) at df/N = ratio) contributes almost
nothing to the ranking.

This probe builds a deliberately Zipfian corpus — a planted stopword
band appearing in ~99% of documents plus a zipf(a)-sampled content
vocabulary — and measures bm25_topk as-is vs with the max_df_ratio
prune:

- ``join_rows``   the postings-join output volume (per-term hits the
                  score aggregate consumes) — the quantity that blows
                  up under term skew;
- ``cand_pairs``  distinct (query, doc) pairs scored;
- ``sec``         end-to-end wall time — measured in INTERLEAVED
                  rotated sweeps (VERDICT r8 'What's wrong' #2: the r8
                  probe scanned thresholds sequentially, so earlier
                  configs carried JVM/codegen warm-up and the timing
                  column wasn't quotable; now a discarded warm-up pass
                  runs first and each sweep times every config once in
                  a rotated order, min over sweeps);
- ``parity``      fraction of queries whose ORDERED top-k doc list is
                  identical with and without the prune (the
                  rank-neutrality check the threshold choice rests on).

Output: one JSON line {"metric": "bm25_skew_probe", ...}; also written
to artifacts/BM25_SKEW_PROBE_r{N}.json by the round-close runner.

Usage: python tools/bm25_skew_probe.py [n_docs] [max_df_ratio]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_STOPWORDS = 8
STOP_DF = 0.99       # stopword band lands in ~99% of documents
CONTENT_TOKENS = 90  # content tokens per document
ZIPF_A = 2.0         # content vocabulary skew (Zipf's law exponent ~2
                     # for natural-language rank-frequency)
VOCAB = 30_000
K = 10
PASSES = 2


def _build_corpus(spark, n_docs: int):
    """Deterministic Zipfian corpus as a (doc_id, text) frame.

    numpy's zipf sampler gives the heavy-tailed document frequencies
    (seeded Generator — byte-stable across runs); the stopword band is
    planted explicitly so its df/N is a controlled experiment variable
    rather than a sampling accident.
    """
    import numpy as np

    rng = np.random.default_rng(8)
    # content words: zipf-distributed ranks clipped to the vocabulary
    content = rng.zipf(ZIPF_A, size=(n_docs, CONTENT_TOKENS)) % VOCAB
    stop_mask = rng.random((n_docs, N_STOPWORDS)) < STOP_DF
    rows = []
    for i in range(n_docs):
        toks = [f"w{v}" for v in content[i]]
        for s in range(N_STOPWORDS):
            if stop_mask[i, s]:
                # stopwords repeat (tf > 1) like real function words
                toks.extend([f"stop{s}"] * (2 + (i + s) % 3))
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(
        32
    ).persist()


RATIOS = [0.5, 0.9, 0.98]


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    ratios = (
        [float(r) for r in sys.argv[2].split(",")] if len(sys.argv) > 2
        else RATIOS
    )

    from pyspark.sql import functions as F

    from sparkgraft import text as T
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-bm25-skew-probe")
    docs = _build_corpus(spark, n_docs)
    docs.count()  # materialize the corpus before any timing
    qids = docs.where(F.col("doc_id") % (n_docs // 10) == 7).select("doc_id")
    n_queries = qids.count()

    # --- join-volume + candidate-set accounting (replicates the
    # postings-join input/output shapes without the score aggregate) --
    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("__term"))
    tf = tok.groupBy("doc_id", "__term").count().persist()
    n = docs.count()
    dft = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df")).persist()
    qterms = tf.join(F.broadcast(qids), "doc_id").select(
        F.col("doc_id").alias("query_id"), "__term"
    ).persist()
    n_qterms = qterms.count()

    def volume(qt):
        hits = tf.join(F.broadcast(qt), "__term").where(
            F.col("doc_id") != F.col("query_id")
        )
        return (
            hits.count(),
            hits.select("query_id", "doc_id").distinct().count(),
        )

    def run_once(max_df_ratio) -> float:
        t0 = time.time()
        T.bm25_topk(
            docs, qids, k=K, max_df_ratio=max_df_ratio
        ).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def timed_all(configs) -> dict:
        """Interleaved rotated sweeps: one discarded warm-up run, then
        PASSES sweeps each timing every config once, the start index
        rotating per sweep — no config systematically pays (or
        inherits) warm-up, so the timings compare fairly."""
        run_once(configs[0])  # warm-up, discarded
        best: dict = {}
        for p in range(PASSES):
            for i in range(len(configs)):
                cfg = configs[(i + p) % len(configs)]
                dt = run_once(cfg)
                if cfg not in best or dt < best[cfg]:
                    best[cfg] = dt
        return {cfg: round(dt, 3) for cfg, dt in best.items()}

    def topk_lists(max_df_ratio):
        out = {}
        rows = T.bm25_topk(docs, qids, k=K, max_df_ratio=max_df_ratio).collect()
        for r in rows:
            out.setdefault(r.query_id, []).append((r.rank, r.doc_id))
        return {q: [d for _, d in sorted(v)] for q, v in out.items()}

    join_rows_full, cand_full = volume(qterms)
    full_topk = topk_lists(None)
    times = timed_all([None] + list(ratios))
    sec_full = times[None]

    scan = []
    for ratio in ratios:
        pruned_qterms = qterms.join(
            dft.where(F.col("__df") <= ratio * n).select("__term"), "__term"
        )
        join_rows, cand = volume(pruned_qterms)
        pruned_topk = topk_lists(ratio)
        ordered_same = sum(
            1 for q in full_topk if full_topk[q] == pruned_topk.get(q)
        )
        set_same = sum(
            1
            for q in full_topk
            if set(full_topk[q]) == set(pruned_topk.get(q, []))
        )
        scan.append(
            {
                "max_df_ratio": ratio,
                "query_terms_pruned": n_qterms - pruned_qterms.count(),
                "join_rows": join_rows,
                "cand_pairs": cand,
                "sec": times[ratio],
                "topk_parity_ordered": round(ordered_same / n_queries, 4),
                "topk_parity_set": round(set_same / n_queries, 4),
            }
        )

    # recommended = the largest join-volume cut whose ORDERED top-k is
    # identical to the unpruned ranking on this corpus; None when no
    # scanned threshold is rank-neutral (an honest negative: with a
    # continuous Zipf df spectrum there is no free prune below the
    # function-word band — see the docstring)
    neutral = [s for s in scan if s["topk_parity_ordered"] == 1.0]
    recommended = (
        min(neutral, key=lambda s: s["join_rows"])["max_df_ratio"]
        if neutral
        else None
    )
    out = {
        "metric": "bm25_skew_probe",
        "n_docs": n_docs,
        "n_queries": n_queries,
        "stop_df": STOP_DF,
        "zipf_a": ZIPF_A,
        "full": {
            "join_rows": join_rows_full,
            "cand_pairs": cand_full,
            "sec": sec_full,
        },
        "scan": scan,
        "recommended_max_df_ratio": recommended,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
