"""Named-query registry: the harness-facing surface.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
registered here as ``(spark, sf_dir) -> DataFrame`` paired with DuckDB
oracle SQL. Submodules register on import; this package just aggregates.

Alignment rules (the driver hashes values order-insensitively after
sorting columns by name):
- alias every computed column identically on both sides;
- double sums go through exact DECIMAL arithmetic then cast to double;
- ratios/percentages are round(x, 4) on both sides;
- timestamps are µs-truncated on read (io.read_table), matching DuckDB.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, dec, register  # noqa: F401

# Import order = SURVEY §2 order; each module registers its queries.
from . import core  # noqa: E402,F401  (flagship + first slice)
from . import relational  # noqa: E402,F401  (filters, joins, set ops, sorts)
from . import multijoin  # noqa: E402,F401  (TPC-H Q3/Q5/Q10 multi-table chains)
from . import windows  # noqa: E402,F401  (window functions, sessionization)
from . import json_queries  # noqa: E402,F401  (JSON introspection)
from . import functions  # noqa: E402,F401  (string/date/array/higher-order)
from . import extra  # noqa: E402,F401  (grouped conformance, percentiles, HOFs)
from . import pipeline  # noqa: E402,F401  (full versioned-conformance pipeline)
from . import text  # noqa: E402,F401  (text analysis extension)
from . import sampling  # noqa: E402,F401  (deterministic sampling/splits)
from . import dedup  # noqa: E402,F401  (dedup extension)
from . import similarity  # noqa: E402,F401  (embedding similarity extension)
from . import multimodal_queries  # noqa: E402,F401  (binary payload extension)
from . import streaming_queries  # noqa: E402,F401  (streaming engine w/ batch oracle)

from .core import conformance_flagship  # noqa: E402,F401  (entry() flagship)
