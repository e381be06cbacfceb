"""Incremental aggregate maintenance: keep a keyed rollup current by
MERGING each arriving batch's partial aggregates into a persistent
state table — never re-scanning history. This is the batch-side twin of
the streaming tier's stateful operators, and the pattern behind every
"daily revenue per customer, updated nightly" table at 100 TB: the
nightly job aggregates ONLY the new partition and folds it in.

Only decomposable statistics are offered (count / sum / min / max —
the classic commutative monoids): ``merge(agg(A), agg(B)) == agg(A u B)``
holds exactly, which the oracle-paired query verifies by folding three
arrival batches and hash-comparing against the direct aggregation.
Mean is DERIVED at read time (sum/count); count-distinct is deliberately
absent — it does not decompose without a sketch, and the engine's HLL
surface (approx_count_distinct, contract.profile_table) is the answer
there.

Scale shape: ``partial_aggregate`` is one map-side-combinable groupBy
over the batch; ``merge_aggregates`` unions the (already tiny, one row
per key) states and re-aggregates — a shuffle on the key proportional
to |keys|, not |history|. Sums run in exact DECIMAL so the folded state
is bit-identical to the direct aggregation under any batch split or
merge order.

Reference scope: the reference re-reads its full input every run
(event_verify.py:21's daily path template); this module is the
extension that makes the daily cadence incremental.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_aggregate", "merge_aggregates"]

# spec kinds -> (batch aggregate, state-merge aggregate)
_KINDS = ("count", "sum", "min", "max")


def _check_specs(specs: Mapping[str, tuple[str, str | None]]) -> None:
    for out, (kind, col) in specs.items():
        if kind not in _KINDS:
            raise ValueError(
                f"spec {out!r}: kind {kind!r} not in {_KINDS} — "
                "non-decomposable statistics (count_distinct, medians) "
                "cannot be maintained incrementally without a sketch"
            )
        if kind != "count" and col is None:
            raise ValueError(f"spec {out!r}: {kind} needs a column")


def partial_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str | None]],
    sum_scale: int = 2,
) -> DataFrame:
    """One batch's keyed partial aggregates: ``specs`` maps each output
    column to ``(kind, column)`` with kind in count / sum / min / max
    (``("count", None)`` counts rows). Sums accumulate in
    ``DECIMAL(38, sum_scale)`` so later merges are order-independent
    and engine-exact; cast once at read time if doubles are wanted."""
    _check_specs(specs)
    aggs = []
    for out, (kind, col) in specs.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("bigint").alias(out))
        elif kind == "sum":
            aggs.append(
                F.sum(F.col(col).cast(f"decimal(38,{sum_scale})")).alias(out)
            )
        elif kind == "min":
            aggs.append(F.min(col).alias(out))
        else:
            aggs.append(F.max(col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    specs: Mapping[str, tuple[str, str | None]],
) -> DataFrame:
    """Fold any number of partial-aggregate states (from
    :func:`partial_aggregate` or prior merges — merging is associative
    and commutative) into one: counts and sums add, mins min, maxes
    max. Keys present in only some states contribute their rows alone
    (union semantics); the result is exactly
    ``partial_aggregate(union of all underlying batches)``."""
    _check_specs(specs)
    if not states:
        raise ValueError("merge_aggregates needs at least one state")
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = []
    for out, (kind, _) in specs.items():
        if kind == "count":
            aggs.append(F.sum(out).cast("bigint").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(out).alias(out))
        elif kind == "min":
            aggs.append(F.min(out).alias(out))
        else:
            aggs.append(F.max(out).alias(out))
    return unioned.groupBy(*keys).agg(*aggs)
