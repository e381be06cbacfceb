from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from sparkgraft.classify import _reference_train, logistic_score, train_logistic


def planted(n=400, seed=3):
    """Linearly separable-ish data: y = 1 iff 2*x1 - x2 + noise > 0."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x1, x2 = rng.uniform(-1, 1), rng.uniform(-1, 1)
        y = 1 if 2 * x1 - x2 + rng.gauss(0, 0.1) > 0 else 0
        rows.append((i, x1, x2, y))
    return rows


def test_train_logistic_learns_planted_rule(spark):
    rows = planted()
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")
    model = train_logistic(df, ["x1", "x2"], "y", lr=2.0, iters=60)
    assert model["n"] == len(rows) and model["n_skipped"] == 0
    # learned direction matches the planted rule: +x1, -x2, ratio ~ -2
    assert model["weights"]["x1"] > 0 > model["weights"]["x2"]
    assert model["loss"] < 0.25
    # scoring with the learned weights classifies the training set well
    scored = df.select(
        "y",
        logistic_score(
            {"x1": model["weights"]["x1"], "x2": model["weights"]["x2"]},
            model["bias"],
        ).alias("p"),
    )
    acc = scored.select(
        F.avg(((F.col("p") >= 0.5).cast("int") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc > 0.93


def test_train_logistic_matches_numpy_reference(spark):
    rows = planted(n=150, seed=11)
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")
    model = train_logistic(df, ["x1", "x2"], "y", lr=1.0, iters=25)
    ref = _reference_train(
        [(r[1], r[2]) for r in rows], [r[3] for r in rows], lr=1.0, iters=25
    )
    # decimal(38,10) per-row truncation bounds divergence at ~1e-6
    assert math.isclose(model["bias"], ref["bias"], abs_tol=1e-5)
    assert math.isclose(model["weights"]["x1"], ref["weights"][0], abs_tol=1e-5)
    assert math.isclose(model["weights"]["x2"], ref["weights"][1], abs_tol=1e-5)


def test_train_logistic_deterministic_and_null_handling(spark):
    rows = planted(n=120, seed=5)
    # add incomplete rows that must be skipped, not crash or bias
    extra = [(1000, None, 0.5, 1), (1001, 0.1, None, 0), (1002, 0.1, 0.2, None)]
    df = spark.createDataFrame(
        rows + extra, "id long, x1 double, x2 double, y int"
    )
    m1 = train_logistic(df.repartition(1), ["x1", "x2"], "y", iters=10)
    m2 = train_logistic(df.repartition(17, "id"), ["x1", "x2"], "y", iters=10)
    assert m1["n_skipped"] == m2["n_skipped"] == 3
    # decimal gradient sums -> identical trajectory under any partitioning
    assert m1["bias"] == m2["bias"]
    assert m1["weights"] == m2["weights"]
    assert m1["loss"] == m2["loss"]


def test_train_logistic_empty_raises(spark):
    df = spark.createDataFrame([], "x1 double, y int")
    with pytest.raises(ValueError):
        train_logistic(df, ["x1"], "y")


def test_logistic_score_null_propagates(spark):
    df = spark.createDataFrame(
        [(1, 0.5), (2, None)], "id long, x double"
    )
    out = {
        r.id: r.p
        for r in df.select(
            "id", logistic_score({"x": 2.0}, -1.0).alias("p")
        ).collect()
    }
    assert out[1] == 0.5  # sigmoid(0) = 0.5
    assert out[2] is None
