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
- documents: replica k suffixes EVERY whitespace token with ``_r<k>``
  (underscore survives ``normalize_text``'s lowercase+collapse), so
  every word shingle — hence every minhash band, simhash bit pattern,
  and winnowing fingerprint — diverges across replicas. A mere prefix
  salt is NOT enough: with word k-shingles only the first k-1 shingles
  change, replicas stay genuine near-dups of each other, and both the
  candidate count and the output grow quadratically in the factor —
  measuring output explosion, not plan slope (observed: slope 20 for
  ngram-jaccard at 8x under prefix salting vs ~linear under token
  salting). doc_id offsets by k*10M;
- embeddings: replica k multiplies each dimension by a deterministic
  per-replica sign pattern (``hash(dim, k)`` parity; replica 0 keeps
  the original vector). Sign flips preserve every norm and all
  WITHIN-replica cosines exactly while centering cross-replica cosines
  on ~0 (mean 0.14 measured; a circular rotation was worse — rotated
  copies of these correlated-component vectors keep high cosine).

Each query's ``out_slope`` (output rows at Nx / rows at 1x) is printed
next to its time slope — it verifies the salting premise per query.
Expected out_slope: ~N for per-doc/per-row outputs and doc near-dups,
1.0 for fixed-k top-k. CAVEAT ``embedding_near_dup_pairs``: its 0.4
threshold sits inside the random-pair cosine tail for d=64 (~1e-3 of
RANDOM pairs exceed 0.4), so its output — and therefore any
pairs-above-threshold query at such a threshold — is inherently
~quadratic in corpus size regardless of salting. Its out_slope ~N^2 is
the query's semantics, not a plan defect; the plan's compute is the
deliberate exact-verification tier (blocked matmul, O(n^2/B)
vectorized FLOPs), and the ANN queries are the documented scale path.

THREE-POINT FIT (r5): a two-point slope cannot separate fixed-cost
amortization from genuine superlinearity (r4's watch set: slopes 3-4
that could be either). The probe now measures 1x / factor//2 x /
factor x and fits t = a * f^e by least squares on log t vs log f,
reporting the overall ``exponent`` plus ``tail_exponent`` (between the
two LARGEST points, where fixed overhead is most amortized — the
asymptote estimate). Linear plans: tail_exponent ~<= 1.3; a quadratic
candidate stage lands near 2.

Usage: python tools/scale_slope.py [factor] [sf_dir] [probe ...]
(trailing probe names filter PROBES — sanity runs of a new probe)
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
    "decontaminate_docs",
    "corpus_vocab_topk",
    "corpus_dup_ngram_stats",
    # embeddings-based
    "knn_cosine_bruteforce",
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_planted",
    "semantic_dedup_embeddings",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "label_centroid_similarity",
    # r5 additions (retired tier — resolved against both registries):
    "doc_cdc_segments",          # row-local HOFs: must be ~linear
    "doc_unigram_logprob",       # two tokenize passes + term-keyed join
    "embedding_standardized",    # posexplode moments + broadcast zip
    "near_dup_committee_pairs",  # bucketed + blocked proposers composed
    "conservative_dedup_keep",   # committee -> iterative components
    # late-r5 additions:
    "dedup_repeated_spans",      # seg-hash window + doc groupBy: ~linear
    "doc_quality_logistic",      # pure map over the scan: ~linear
    "semantic_dedup_planted",    # planted SemDeDup (oracled path)
    # r6: iterative graph analytics. The registered query
    # (trade_graph_pagerank) bounds its graph with o_custkey < 150 for
    # the unrolled-SQL oracle, so it cannot grow with the staging
    # factor; this probe runs the same graph.pagerank (3 iterations,
    # same dangling-mass handling) over a staged edge table that grows
    # linearly with the factor — n nodes, ~2.4n weighted edges, 1 in 5
    # nodes dangling. Expected linear: edges x fixed iteration count.
    "pagerank_synth_graph",
    # r6 continuation: the heaviest new operator (tokenize -> term
    # counts -> two term-keyed model joins -> doc aggregate). Both
    # models grow with the corpus (target = the src0 slice), so
    # expected ~linear: term-count tables are compact and the joins
    # are term-keyed, never all-pairs.
    "doc_importance_resampling",
    # line explode -> md5-key distinct count -> broadcast join-back ->
    # doc-keyed rebuild; the flagged key set stays 2 planted templates
    # regardless of factor, so expected ~linear.
    "boilerplate_line_removal",
    # r6 late additions:
    # row-local pair expansion -> d(d+1)/2-cell aggregate; cell count is
    # CONSTANT in n, so expected ~linear (explode volume n * 2080).
    "embedding_covariance_cells",
    # one tokenize pass -> bigram/context/model aggregates + two
    # term-keyed joins; compact count tables, expected ~linear.
    "doc_bigram_logprob",
    # query set bounded at 10 ids (doc_id % 100 == 7 AND < 1000): the
    # lexical inverted-index join and the vector scan are each linear
    # in the corpus for a FIXED query count.
    "hybrid_retrieval_rrf",
    # jaccard pair proposal (inverted index) -> iterative components ->
    # (id, score) join + per-cluster window; salted replicas keep pairs
    # ~linear, so expected ~linear.
    "near_dup_quality_keep",
    # one md5 pass + two compact integer shuffles; expected ~linear.
    "doc_hash_embedding",
    # chunk (row-local) -> hash-embed chunks -> bounded-query cosine;
    # every stage linear for the fixed 10-query set.
    "rag_chunk_retrieval",
    # r7: the SCALE TIERS of the two heaviest r6 exact-tier probes —
    # the exact tiers (41.9s and 61.9s at 8x in r6) are correctness
    # anchors, but these are the compositions a 100x user runs.
    # Arrow partial-Gram covariance: one numpy matmul per batch, batch
    # -count partial rows reduce to d(d+1)/2 cells; expected ~linear.
    "covariance_cells_arrow",
    # RP-LSH vector arm + lexical inverted index -> RRF fusion: the
    # bucket join replaces the corpus-linear exact scan. MEASURED r7:
    # linear (tail 0.87) at the SAME constant as the exact tier
    # (60.1s vs 63.2s at 8x) — the lexical shingle inverted index
    # dominates both compositions; the ANN arm's win is removing the
    # vector arm's scale RISK (broadcast-scan FLOPs grow with the
    # corpus), not this scale's wall-clock.
    "hybrid_retrieval_rrf_ann",
    # r7: BM25 — one staged tokenize pass + compact term aggregates +
    # broadcast query-term postings join; expected ~linear.
    "bm25_doc_retrieval",
]


def _pagerank_synth_graph(spark, work_dir: str):
    """graph.pagerank over the staged ``edges.parquet`` (see stage())."""
    from sparkgraft.graph import pagerank

    edges = spark.read.parquet(os.path.join(work_dir, "edges.parquet"))
    return pagerank(edges, weight_col="w", iters=3)


def _covariance_cells_arrow(spark, work_dir: str):
    """similarity.covariance_cells_arrow over the staged embeddings —
    the high-dimension scale tier (the registered query probes the
    decimal-exact tier)."""
    from sparkgraft.io import read_table
    from sparkgraft.similarity import covariance_cells_arrow

    return covariance_cells_arrow(read_table(spark, work_dir, "embeddings"), 64)


def _ivfpq_topk_probe(spark, work_dir: str):
    """similarity.ivfpq_topk over the staged embeddings with a FIXED
    10-query set (vec_id < 10 exist at every factor): the composed
    residual-coded index — expected ~linear in the corpus (encode is
    one Arrow pass; the candidate join moves ~n_probe/n_centroids of
    the m-byte codes)."""
    from pyspark.sql import functions as F

    from sparkgraft.io import read_table
    from sparkgraft.similarity import ivfpq_topk

    emb = read_table(spark, work_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return ivfpq_topk(
        emb, queries, dim=64, k=10, n_centroids=16, n_probe=4,
        m=16, n_codes=64,
    )


def _ivfpq_topk_scaling_queries(spark, work_dir: str):
    """r9 (VERDICT r8 #5): ivfpq_topk with the QUERY SET GROWING with
    the corpus (vec_id % 50 == 0 over the staged embeddings — the
    registered planted query's rate) at fixed n_centroids/n_probe.
    Per-query cost is ~linear in the probed fraction (corpus /
    n_centroids x n_probe), so TOTAL time is expected ~quadratic-ish
    (queries x corpus both grow) — the honest serving-workload curve;
    the 100 TB answer is n_centroids ~ sqrt(N) (below) plus the
    rerank shortlist, not a fixed 16-list layout."""
    from pyspark.sql import functions as F

    from sparkgraft.io import read_table
    from sparkgraft.similarity import ivfpq_topk

    emb = read_table(spark, work_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return ivfpq_topk(
        emb, queries, dim=64, k=10, n_centroids=16, n_probe=4,
        m=16, n_codes=64,
    )


def _ivfpq_topk_scaling_queries_sqrtn(spark, work_dir: str):
    """The production layout for the growing-workload regime, run
    THROUGH THE DEFAULT PATH (r10: n_centroids=None + approx_rows from
    the staged parquet footer — exactly what a caller who passes only
    a row hint gets): auto_n_centroids grows ~sqrt(corpus), so each
    query's probed candidate pool grows only ~sqrt(f) — expected total
    exponent ~1.5 vs the fixed-list probe's ~2."""
    from pyspark.sql import functions as F

    from sparkgraft.io import read_table, table_row_hint
    from sparkgraft.similarity import ivfpq_topk

    emb = read_table(spark, work_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return ivfpq_topk(
        emb, queries, dim=64, k=10, n_probe=4,
        m=16, n_codes=64,
        approx_rows=table_row_hint(work_dir, "embeddings"),
    )


def _ffd_bin_pack(shard_width: int):
    """FFD whole-document packing probe (VERDICT r8 #7) over the staged
    documents with n_chars as the token count. shard_width=2 is the
    production default (256 shards: per-shard docs grow f/256-slowly);
    shard_width=1 HOLDS the shard count at 16 so per-shard docs grow 8x
    — exposing the per-shard O(docs x bins) loop's growth, which sets
    the max-docs-per-shard guidance."""

    def probe(spark, work_dir: str):
        from sparkgraft.io import read_table
        from sparkgraft.packing import bin_pack_documents

        docs = read_table(spark, work_dir, "documents")
        return bin_pack_documents(
            docs, "n_chars", budget=4096, shard_width=shard_width
        )

    return probe


EXTRA_PROBES = {
    "pagerank_synth_graph": _pagerank_synth_graph,
    "covariance_cells_arrow": _covariance_cells_arrow,
    "ivfpq_topk_fixed_queries": _ivfpq_topk_probe,
    "ivfpq_topk_scaling_queries": _ivfpq_topk_scaling_queries,
    "ivfpq_topk_scaling_queries_sqrtn": _ivfpq_topk_scaling_queries_sqrtn,
    "ffd_bin_pack_shards16": _ffd_bin_pack(1),
    "ffd_bin_pack_shards256": _ffd_bin_pack(2),
}


def stage(spark, sf_dir: str, out_dir: str, factor: int) -> dict[str, int]:
    from pyspark.sql import functions as F

    from sparkgraft.io import read_table

    rep = F.col("replica")
    docs = read_table(spark, sf_dir, "documents").crossJoin(
        spark.range(factor).withColumnRenamed("id", "replica")
    )
    salt = F.concat(F.lit("_r"), rep.cast("string"))
    salted = F.array_join(
        F.transform(F.split(F.col("text"), r"\s+"), lambda w: F.concat(w, salt)),
        " ",
    )
    staged_docs = docs.select(
        (F.col("doc_id") + rep * 10_000_000).alias("doc_id"),
        F.when(rep == 0, F.col("text")).otherwise(salted).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    staged_docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = read_table(spark, sf_dir, "embeddings").crossJoin(
        spark.range(factor).withColumnRenamed("id", "replica")
    )
    def signed(x, i):
        flip = (F.hash(i, rep.cast("int")) % 2 == 0) & (rep > 0)
        return F.when(flip, -x).otherwise(x)

    staged_emb = emb.select(
        (F.col("vec_id") + rep * 10_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), signed).alias("embedding"),
        "label",
    )
    staged_emb.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # Edge table for the pagerank probe: each staged doc_id (already
    # replica-offset, so the node set grows linearly) emits 3 weighted
    # out-edges to fixed strides, except every 5th node which emits
    # none — real dangling mass for the redistribution term every
    # iteration. Materialized to parquet so the timed passes measure
    # pagerank, not edge derivation.
    ids = staged_docs.select("doc_id")
    dsts = F.array(
        F.col("doc_id") + 1, F.col("doc_id") + 17, F.col("doc_id") + 131
    )
    edges = (
        ids.where(F.col("doc_id") % 5 != 0)
        .select(F.col("doc_id").alias("src"), F.posexplode(dsts))
        .select(
            "src",
            F.col("col").alias("dst"),
            (F.col("pos") + 1).cast("double").alias("w"),
        )
    )
    edges.write.mode("overwrite").parquet(os.path.join(out_dir, "edges.parquet"))

    from sparkgraft.io import read_table as rt

    return {
        "documents": rt(spark, out_dir, "documents").count(),
        "embeddings": rt(spark, out_dir, "embeddings").count(),
    }


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # optional probe-name filter (sanity runs of a single new probe).
    # Names NOT in PROBES resolve from the registry too — a requested
    # probe must run or fail loudly, never drop silently (the r7 32x
    # run initially lost 2 of 4 requested composites to this filter)
    only = set(sys.argv[3:])
    if only:
        unknown = only - set(PROBES)
        probes = [p for p in PROBES if p in only] + sorted(unknown)
    else:
        probes = list(PROBES)

    import __spark_entry__ as E
    from sparkgraft.queries import RETIRED_QUERIES
    from sparkgraft.session import get_spark

    spark = get_spark("sparkgraft-scale-slope")
    # probe across BOTH tiers: retired breadth queries have the same
    # scale obligations as active ones
    queries = {**RETIRED_QUERIES, **E.queries(), **EXTRA_PROBES}
    results: dict[str, dict] = {name: {} for name in probes}
    row_counts: dict[int, dict[str, int]] = {}

    # three scale points: 1x, mid, Nx (mid = factor // 2, distinct)
    points = sorted({1, max(2, factor // 2), factor})
    for f in points:
        work = tempfile.mkdtemp(prefix=f"sparkgraft-slope-{f}x-")
        try:
            row_counts[f] = stage(spark, sf_dir, work, f)
            # min-of-3 per point: this host's run-to-run jitter is
            # multi-second (observed 3.5s vs 30.5s for the same query
            # and data under min-of-2); the min over three passes is
            # the stable plan-cost estimator, same policy as bench.py
            for name in probes:
                best = None
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    queries[name](spark, work).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                results[name][f] = round(best, 3)
                # output rows per point: proves the salting premise —
                # near-dup/candidate OUTPUT must grow ~linearly with the
                # factor, else the time slope measures output explosion
                spark.catalog.clearCache()
                results[name][f"rows_{f}"] = queries[name](spark, work).count()
        finally:
            shutil.rmtree(work, ignore_errors=True)

    import math

    def fit_exponent(fs: list[int], ts: list[float]) -> float | None:
        """Least-squares exponent e of t = a * f^e over the points."""
        pts = [(math.log(f), math.log(t)) for f, t in zip(fs, ts) if t > 0]
        if len(pts) < 2:
            return None
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        sxx = sum((x - mx) ** 2 for x, _ in pts)
        if sxx == 0:
            return None
        return sum((x - mx) * (y - my) for x, y in pts) / sxx

    hdr = " ".join(f"t({f}x)".rjust(8) for f in points)
    print(
        f"{'query':32} {hdr} {'slope':>6} {'exp':>5} {'tail':>5}"
        f"  (linear slope ~<= {factor}, tail exp ~<= 1.3)",
        file=sys.stderr,
    )
    slopes = {}
    for name in probes:
        ts = [results[name][f] for f in points]
        t1, tn = ts[0], ts[-1]
        r1, rn = results[name]["rows_1"], results[name][f"rows_{factor}"]
        slope = round(tn / t1, 2) if t1 > 0 else None
        out_slope = round(rn / r1, 2) if r1 > 0 else None
        exponent = fit_exponent(points, ts)
        # tail exponent: between the two LARGEST points, where fixed
        # overhead is most amortized — the asymptote estimate that
        # adjudicates "slope 3-4" as amortization vs superlinearity
        tail = fit_exponent(points[-2:], ts[-2:])
        slopes[name] = {
            **{f"t_{f}x": results[name][f] for f in points},
            "slope": slope,
            "exponent": round(exponent, 2) if exponent is not None else None,
            "tail_exponent": round(tail, 2) if tail is not None else None,
            "rows_1x": r1,
            f"rows_{factor}x": rn,
            "out_slope": out_slope,
        }
        tcols = " ".join(f"{t:8.3f}" for t in ts)
        print(
            f"{name:32} {tcols} {slope:6.2f} {exponent:5.2f} {tail:5.2f}"
            f"   rows {r1}->{rn} (out_slope {out_slope})",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "scale_slope",
                "factor": factor,
                "points": points,
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
