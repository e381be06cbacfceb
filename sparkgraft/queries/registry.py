from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Retired tier: queries dropped from the driver-facing surface to keep
# the gate's coverage budget (see queries/__init__.py policy) but kept
# fully oracle-paired — tests/test_retired_oracles.py and
# `tools/oracle_check.py --retired` still verify them locally every run.
RETIRED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
RETIRED_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None, retired: bool = False):
    """Register a named query; ``oracle=None`` means non-SQL-expressible
    (the driver records a weaker rows-only check — keep these rare).
    ``retired=True`` keeps the query + oracle locally verifiable but
    out of the driver gate (coverage-budget policy)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES or name in RETIRED_QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        queries = RETIRED_QUERIES if retired else QUERIES
        oracles = RETIRED_ORACLES if retired else ORACLES
        queries[name] = fn
        if oracle is not None:
            oracles[name] = oracle
        return fn

    return deco


def dec(col: str | Column, scale: int = 2) -> Column:
    """Exact-decimal view of a double column (deterministic sums across
    any partitioning / row order — see package docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")
