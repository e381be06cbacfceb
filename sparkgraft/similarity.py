"""Embedding similarity search over ``array<float>`` columns.

Three tiers:

- ``cosine_topk``   — exact brute-force top-k for a (small) query set:
                      broadcast the queries, one pass over the corpus,
                      per-query top-k via window. The correctness
                      baseline and the right answer when |queries| is
                      small relative to the corpus.
- ``cosine_pairs``  — all-pairs near-duplicate detection above a
                      cosine threshold (embedding-based near-dup).
                      Exact; quadratic — gate behind LSH at scale.
- ``rp_lsh_*``      — sign-random-projection LSH: deterministic
                      md5-derived hyperplanes hash vectors to buckets;
                      candidate generation joins on the bucket key.
                      The scale path: shuffle keyed on bucket hash,
                      nothing quadratic. Recall is tested against the
                      brute-force baseline (tests/test_similarity.py).

All vector math is built-in HOFs (zip_with / aggregate / transform)
over doubles — JVM codegen, no Python in the hot path. Elements are
cast to double BEFORE multiplication so an external oracle performs
the identical IEEE operation sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "cosine_topk",
    "cosine_pairs",
    "rp_lsh_bucket",
    "rp_lsh_topk",
]


def _d(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product, left-to-right summation in double."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_predoubled(a: Column, b: Column) -> Column:
    """Dot product over arrays ALREADY cast to double — for quadratic
    stages, stage the cast once per vector, not once per pair (each
    ``transform`` materializes a fresh array per evaluation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector by cosine.

    ``queries`` is broadcast (it must be small — for query sets that
    are themselves huge, use ``rp_lsh_topk``). Ranking uses the ROUNDED
    cosine with the candidate id as tiebreak, so the result set is
    deterministic and engine-independent (raw float ordering can differ
    in the last ulp between engines).

    Returns ``(query_id, rank, vec_id, cos_sim)``.
    """
    from pyspark.sql import Window

    from .relational import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = spread(corpus.select(F.col(id_col), F.col(vec_col)))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__qvec")), round_to).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos_sim")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    round_to: int = 6,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup).

    Exact and O(n^2) — correct at dimension-table scale and as the
    verification stage behind ``rp_lsh_bucket`` candidates at corpus
    scale (same pattern as dedup.minhash_near_dups: LSH proposes,
    exact math disposes)."""
    # norms AND double-cast arrays staged per vector (not per pair): the
    # pair expression is one zip+fold and a multiply — no per-pair array
    # casts, no per-pair norm aggregates (measured ~3x on the quadratic
    # stage)
    from .relational import spread

    withn = spread(df.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col),
        _d(F.col(vec_col)).alias("__dv"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col("__dv").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col("__dv").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_predoubled(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                round_to,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from md5(plane|dim) — no RNG state, reproducible anywhere."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[:8]
        out.append(int(h, 16) / float(2**31) - 1.0)
    return out


def rp_lsh_bucket(
    vec: Column, dim: int, num_planes: int = 8
) -> Column:
    """Sign-random-projection bucket id: bit p = sign(vec . plane_p).
    Vectors in the same bucket are ANN candidates. Hyperplanes are
    md5-derived constants folded into the plan (broadcast literals)."""
    bucket = F.lit(0).cast("bigint")
    dv = _d(vec)
    for p in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        proj = F.aggregate(
            F.zip_with(dv, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 6,
    num_tables: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH
    bucket with the query in ANY of ``num_tables`` independent plane
    sets; exact cosine ranks the candidates.

    The join is keyed on ``(table, bucket)`` — at 100 TB this is one
    hash-shuffle of the corpus vs the quadratic blowup of brute force;
    recall tunes with planes/tables (fewer planes -> bigger buckets ->
    higher recall, more compute)."""
    from pyspark.sql import Window

    def table_bucket(vec: Column, table: int) -> Column:
        # independent plane set per table via seed offset
        bucket = F.lit(0).cast("bigint")
        dv = _d(vec)
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(v) for v in _hyperplane(table * 1000 + p, dim)]
            )
            proj = F.aggregate(
                F.zip_with(dv, plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(
                proj > 0, F.lit(2**p).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return bucket

    def bucketed_ids(df: DataFrame, id_alias: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    table_bucket(F.col(vec_col), t).alias("bucket"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(id_alias), F.explode(buckets).alias("b")
        ).select(id_alias, F.col("b.table").alias("table"),
                 F.col("b.bucket").alias("bucket"))

    from .relational import spread

    cand_ids = (
        bucketed_ids(spread(corpus), "cand_id")
        .join(F.broadcast(bucketed_ids(queries, "query_id")), ["table", "bucket"])
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    # re-attach vectors only for surviving candidates (ids shuffled, not
    # vectors — the candidate set is small relative to the corpus)
    scored = (
        cand_ids.join(
            corpus.select(
                F.col(id_col).alias("cand_id"), F.col(vec_col).alias("__cvec")
            ),
            "cand_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("__qvec"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("cand_id").alias(id_col),
            F.round(cosine(F.col("__cvec"), F.col("__qvec")), round_to).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos_sim")
    )
