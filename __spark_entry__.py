"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``sparkgraft/``; this module only wires operators
to the harness. Query names map to SURVEY.md §2 operator rows (noted per
entry). Float-producing queries round explicitly and sums go through
exact decimal arithmetic so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkgraft import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the conformance composite (SURVEY §7.1): spec-vs-
    observed key-presence + value-completeness metrics in one lazy plan.
    """
    return Q.conformance_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Oracled queries first (stable registration order), rows-only last:
    # if the driver's gate is ever truncated by a time budget, it drops
    # weaker rows-only checks, never full oracle comparisons.
    ordered = sorted(Q.QUERIES, key=lambda n: n not in Q.ORACLES)
    return {name: Q.QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
