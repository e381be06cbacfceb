from __future__ import annotations

from pyspark.sql import functions as F

from sparkgraft import json_ops as J


def payloads(spark):
    rows = [
        (1, '{"a": "1", "b": ""}', '{"c": "x"}'),
        (2, '{"a": null}', None),
        (3, None, '{"a": "in_other"}'),
        # key name appears inside a VALUE — the reference's regex approach
        # would false-positive on this row (event_verify.py:69-76)
        (4, '{"z": "a"}', "{}"),
    ]
    return spark.createDataFrame(rows, "id int, p1 string, p2 string")


def test_key_presence_exact_membership(spark):
    df = payloads(spark)
    out = (
        df.select("id", J.key_presence([F.col("p1"), F.col("p2")], F.lit("a")).alias("x"))
        .orderBy("id")
        .collect()
    )
    assert [r.x for r in out] == [True, True, True, False]


def test_extract_key_scrubs_empty(spark):
    df = payloads(spark)
    out = (
        df.select("id", J.extract_key("p1", F.lit("b")).alias("v"))
        .orderBy("id")
        .collect()
    )
    # row 1 has b="" -> scrubbed to NULL
    assert [r.v for r in out] == [None, None, None, None]


def test_multi_path_coalesce_order(spark):
    df = spark.createDataFrame(
        [(1, '{"x": ""}', '{"x": "second"}'), (2, '{"x": "first"}', '{"x": "second"}')],
        "id int, p1 string, p2 string",
    )
    out = (
        df.select(
            "id",
            J.multi_path_coalesce([("p1", "$.x"), ("p2", "$.x")]).alias("v"),
        )
        .orderBy("id")
        .collect()
    )
    assert [r.v for r in out] == ["second", "first"]


def test_enumerate_keys(spark):
    df = payloads(spark)
    keys = {r.key for r in J.enumerate_keys(df, ["p1", "p2"]).collect()}
    assert keys == {"a", "b", "c", "z"}


def test_enumerate_keys_grouped(spark):
    df = payloads(spark)
    out = J.enumerate_keys(df, ["p1"], group_cols=["id"]).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, set()).add(r.key)
    assert by_id[1] == {"a", "b"}
    assert by_id[4] == {"z"}
