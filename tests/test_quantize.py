from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgraft import quantize as Qz
from sparkgraft import similarity as S
from sparkgraft.io import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_roundtrip_error_bound(spark, emb):
    """Dequantized components differ from the original by at most
    scale/2 = max(|v|)/254 (+ float32 representation slack)."""
    out = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        Qz.dequantize_int8(Qz.quantize_int8("embedding")).alias("dq"),
        Qz.quantize_int8("embedding").getField("scale").alias("scale"),
    ).select(
        "vec_id",
        "scale",
        F.array_max(
            F.zip_with("v", "dq", lambda a, b: F.abs(a.cast("double") - b.cast("double")))
        ).alias("max_err"),
    )
    bad = out.where(F.col("max_err") > F.col("scale") * 0.5001).count()
    assert bad == 0


def test_quantize_null_and_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, None), (3, [1.0, -2.0, 0.5, 2.0])],
        "vec_id int, embedding array<float>",
    )
    rows = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            Qz.quantize_int8("embedding").alias("q"),
            Qz.dequantize_int8(Qz.quantize_int8("embedding")).alias("dq"),
        ).collect()
    }
    assert rows[2].q is None and rows[2].dq is None
    assert rows[1].q.scale == 0.0 and rows[1].dq == [0.0] * 4  # zero vec roundtrips
    assert rows[3].q.q[3] == 127  # absmax component hits full range
    assert rows[3].q.q[1] == -127


def test_quantized_cosine_close_to_exact(spark, emb):
    """Quantized cosine within 0.02 of exact for every corpus pair
    against a fixed probe vector (scales cancel; error ~ rounding)."""
    probe = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("pv")
    )
    joined = emb.crossJoin(F.broadcast(probe)).where(F.col("vec_id") != 0)
    out = joined.select(
        S.cosine("embedding", F.col("pv")).alias("exact"),
        Qz.quantized_cosine(
            Qz.quantize_int8("embedding"), Qz.quantize_int8(F.col("pv"))
        ).alias("approx"),
    )
    worst = out.select(
        F.max(F.abs(F.col("exact") - F.col("approx"))).alias("m")
    ).collect()[0].m
    assert worst < 0.02, f"quantized cosine off by {worst}"


def test_topk_quantized_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.vec_id)
        for r in S.cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in Qz.cosine_topk_quantized(
            emb, queries, k=10, rerank_factor=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"quantized top-k recall {recall}"


def test_topk_quantized_plan_shape(spark, emb):
    plan = (
        Qz.cosine_topk_quantized(emb, emb.where(F.col("vec_id") < 5), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure JVM HOFs, no UDF at all
