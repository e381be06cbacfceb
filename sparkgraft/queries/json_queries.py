"""JSON introspection queries (SURVEY §2.8 F1-F3, §2.2 P7).

The engine's schema-on-read JSON surface over ``events.props``:
path extraction, dynamic key extraction, key enumeration, and exact
key-presence — the operators the reference builds its whole pipeline
from, minus its regex false-positive bug (SURVEY §4.2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import json_ops as J
from ..io import read_table
from .registry import register


@register(
    "json_keys_per_type",
    """
    SELECT DISTINCT event_type, unnest(json_keys(props)) AS key
    FROM events
    """,
)
def json_keys_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct observed top-level keys per event type — the reference's
    five-scan key-union pipeline (event_verify.py:51-62) as one scan."""
    ev = read_table(spark, sf_dir, "events")
    return J.enumerate_keys(ev, ["props"], group_cols=["event_type"])


@register(
    "json_extract_events",
    """
    SELECT event_id, event_type,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.absent') AS missing_value,
           coalesce(json_extract_string(props, '$.absent'),
                    json_extract_string(props, '$.k'), '0') AS k_coalesced,
           list_contains(json_keys(props), 'k') AS has_k
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction + cast + multi-path coalesce + exact presence in
    one projection — all JVM-side, no UDFs, fully codegen'd."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        J.extract_path("props", "$.k").alias("k_str"),
        J.extract_path("props", "$.k").cast("bigint").alias("k_num"),
        J.extract_path("props", "$.absent").alias("missing_value"),
        F.coalesce(
            J.extract_path("props", "$.absent"),
            J.extract_path("props", "$.k"),
            F.lit("0"),
        ).alias("k_coalesced"),
        J.key_presence([F.col("props")], F.lit("k")).alias("has_k"),
    )


@register(
    "json_value_stats",
    """
    SELECT event_type,
           count(*) AS total_records,
           count(CASE WHEN list_contains(json_keys(props), 'k') THEN 1 END)
               AS k_key_count,
           count(nullif(json_extract_string(props, '$.k'), '')) AS k_value_count,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max
    FROM events GROUP BY event_type
    """,
)
def json_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-accounting aggregation over an extracted JSON value — the
    count(v)-vs-count(*) reformulation of the reference's
    collect_list/array_compact/size chain (SURVEY §2.4 A3)."""
    ev = read_table(spark, sf_dir, "events")
    k_val = J.extract_path("props", "$.k")
    k_num = k_val.cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total_records"),
        F.count(F.when(J.key_presence([F.col("props")], F.lit("k")), 1)).alias(
            "k_key_count"
        ),
        F.count(k_val).alias("k_value_count"),
        F.min(k_num).alias("k_min"),
        F.max(k_num).alias("k_max"),
    )
