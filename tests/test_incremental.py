"""Incremental aggregate maintenance (sparkgraft/incremental.py):
merge(partial(A), partial(B)) must equal partial(A u B) for every
offered statistic, under any batch split, merge ORDER, and disjoint /
overlapping key sets; non-decomposable specs must be rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgraft.incremental import merge_aggregates, partial_aggregate

SPECS = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return {
        r.k: (r.n, float(r.s) if r.s is not None else None, r.lo, r.hi)
        for r in df.collect()
    }


def test_merge_equals_direct_any_split(spark):
    data = spark.createDataFrame(
        [(i % 7, float(i) - 3.0) for i in range(100)]
        + [(99, None)],  # NULL values: counted in n, ignored by s/lo/hi
        "k long, v double",
    )
    direct = _rows(partial_aggregate(data, ["k"], SPECS))
    for split in (F.col("v").isNull(), F.col("k") < 3, F.col("k") % 2 == 0):
        a = partial_aggregate(data.where(split), ["k"], SPECS)
        b = partial_aggregate(data.where(~split | split.isNull()), ["k"], SPECS)
        assert _rows(merge_aggregates([a, b], ["k"], SPECS)) == direct
        # merging is commutative
        assert _rows(merge_aggregates([b, a], ["k"], SPECS)) == direct


def test_merge_associative_and_union_keys(spark):
    a = partial_aggregate(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"),
        ["k"], SPECS,
    )
    b = partial_aggregate(
        spark.createDataFrame([(2, 5.0), (3, 3.0)], "k long, v double"),
        ["k"], SPECS,
    )
    c = partial_aggregate(
        spark.createDataFrame([(3, -1.0)], "k long, v double"), ["k"], SPECS
    )
    left = merge_aggregates([merge_aggregates([a, b], ["k"], SPECS), c], ["k"], SPECS)
    right = merge_aggregates([a, merge_aggregates([b, c], ["k"], SPECS)], ["k"], SPECS)
    assert _rows(left) == _rows(right) == {
        1: (1, 1.0, 1.0, 1.0),
        2: (2, 7.0, 2.0, 5.0),
        3: (2, 2.0, -1.0, 3.0),
    }


def test_non_decomposable_specs_rejected(spark):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="sketch"):
        partial_aggregate(df, ["k"], {"d": ("count_distinct", "v")})
    with pytest.raises(ValueError, match="needs a column"):
        partial_aggregate(df, ["k"], {"s": ("sum", None)})
    with pytest.raises(ValueError, match="at least one state"):
        merge_aggregates([], ["k"], SPECS)


def test_distinct_sketch_merge_equals_direct(spark, sf_dir):
    """The HLL state decomposes count-distinct: folding per-batch
    sketches gives the IDENTICAL estimate to sketching all history at
    once (union is associative and deterministic — exact equality, no
    tolerance), and the estimate tracks the exact distinct count
    within the lg_k=12 bound."""
    from sparkgraft.incremental import merge_distinct, partial_distinct
    from sparkgraft.io import read_table

    ev = read_table(spark, sf_dir, "events")
    batches = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]
    states = [
        partial_distinct(b, ["event_type"], "user_id") for b in batches
    ]
    folded = merge_distinct(states, ["event_type"])
    direct = merge_distinct(
        [partial_distinct(ev, ["event_type"], "user_id")], ["event_type"]
    )
    f = {r.event_type: r.n_distinct for r in folded.collect()}
    d = {r.event_type: r.n_distinct for r in direct.collect()}
    assert f == d  # exact: same sketch algorithm, associative union
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(f) == set(exact)
    for k, n in exact.items():
        assert abs(f[k] - n) <= max(2, 0.05 * n), (k, f[k], n)
    # merged state can be folded AGAIN (state is persistable/reusable)
    refolded = merge_distinct(
        [folded.select("event_type", "distinct_sketch")], ["event_type"]
    )
    r = {x.event_type: x.n_distinct for x in refolded.collect()}
    assert r == f


def test_histogram_states_fold_and_quantile(spark, sf_dir):
    """Histogram states decompose quantiles: per-batch histograms fold
    to the identical merged state as one-shot histogramming, and the
    read-off median lands within one bin width of the exact median."""
    from sparkgraft.incremental import (
        histogram_quantile,
        merge_histograms,
        partial_histogram,
    )
    from sparkgraft.io import read_table

    lo, hi, bins = 0.0, 600000.0, 64
    orders = read_table(spark, sf_dir, "orders")
    batches = [orders.where(F.col("o_orderkey") % 3 == i) for i in range(3)]
    states = [
        partial_histogram(b, ["o_orderpriority"], "o_totalprice", lo, hi, bins)
        for b in batches
    ]
    folded = merge_histograms(states, ["o_orderpriority"])
    direct = partial_histogram(
        orders, ["o_orderpriority"], "o_totalprice", lo, hi, bins
    )
    f = {(r.o_orderpriority, r.bin): r.n for r in folded.collect()}
    d = {(r.o_orderpriority, r.bin): r.n for r in direct.collect()}
    assert f == d  # exact: bin counts are plain sums

    med = {
        r.o_orderpriority: r.quantile
        for r in histogram_quantile(
            folded, ["o_orderpriority"], 0.5, lo, hi, bins
        ).collect()
    }
    exact = {
        r.o_orderpriority: r.m
        for r in orders.groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    width = (hi - lo) / bins
    for k, m in exact.items():
        assert abs(med[k] - m) <= width, (k, med[k], m)


def test_histogram_degenerate_range_raises(spark):
    """ADVICE r5: hi <= lo (or bins < 1) must raise, not silently bin
    every row into NULL."""
    import pytest

    from sparkgraft.incremental import histogram_quantile, partial_histogram

    df = spark.range(3).withColumn("v", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        partial_histogram(df, [], "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError):
        partial_histogram(df, [], "v", lo=0.0, hi=1.0, bins=0)
    with pytest.raises(ValueError):
        histogram_quantile(df, [], 0.5, lo=2.0, hi=1.0)


# ---- Count-Min sketch (keyed item-frequency state) -------------------------


def test_cms_fold_equals_one_shot_exactly(spark):
    """The sketch is deterministic: folding three batches must equal
    sketching all history in one pass CELL FOR CELL, and the estimates
    read off both states must be identical."""
    from sparkgraft import incremental as I

    rows = [("g", f"item{i % 17}") for i in range(300)] + [
        ("g", "hot") for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "k string, item string")
    batches = [
        df.where(F.crc32(F.col("item")) % 3 == i) for i in range(3)
    ]
    folded = I.merge_cms(
        [I.partial_cms(b, ["k"], "item", width=256, depth=3) for b in batches],
        ["k"],
    )
    oneshot = I.partial_cms(df, ["k"], "item", width=256, depth=3)
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, oneshot.collect()))
    items = df.select("k", "item").distinct()
    ef = sorted(map(tuple, I.cms_estimate(folded, items, ["k"], "item", width=256, depth=3).collect()))
    eo = sorted(map(tuple, I.cms_estimate(oneshot, items, ["k"], "item", width=256, depth=3).collect()))
    assert ef == eo


def test_cms_one_sided_guarantee_and_accuracy(spark):
    """est >= true for EVERY item (counters only over-count), zero for
    absent items, and at width 1024 over ~450 rows the over-count is
    tiny for the heavy hitter."""
    from sparkgraft import incremental as I

    rows = [("g", f"item{i % 17}") for i in range(300)] + [
        ("g", "hot") for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "k string, item string")
    state = I.partial_cms(df, ["k"], "item")
    true = {
        r.item: r.c
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    probe = spark.createDataFrame(
        [("g", it) for it in true] + [("g", "never-seen")], "k string, item string"
    )
    est = {r.item: r.est for r in I.cms_estimate(state, probe, ["k"], "item").collect()}
    assert est["never-seen"] == 0
    for it, t in true.items():
        assert est[it] >= t, it
    assert est["hot"] <= true["hot"] + 5  # eps*N at width 1024 is ~1


def test_cms_guards(spark):
    from sparkgraft import incremental as I
    import pytest as _pytest

    df = spark.createDataFrame([("g", "x")], "k string, item string")
    with _pytest.raises(ValueError, match="width/depth"):
        I.partial_cms(df, ["k"], "item", width=0)


def test_cms_estimate_rejects_geometry_mismatch(spark):
    """The state carries its (width, depth) build parameters; probing
    with different ones would hash items to the wrong cells and return
    arbitrary plausible-looking numbers — it must raise instead."""
    from sparkgraft import incremental as I
    import pytest as _pytest

    df = spark.createDataFrame(
        [("g", "x"), ("g", "x"), ("g", "y")], "k string, item string"
    )
    state = I.partial_cms(df, ["k"], "item", width=256, depth=3)
    items = df.select("k", "item").distinct()
    with _pytest.raises(ValueError, match="mismatched geometry"):
        I.cms_estimate(state, items, ["k"], "item", width=512, depth=3)
    with _pytest.raises(ValueError, match="mismatched geometry"):
        I.cms_estimate(state, items, ["k"], "item", width=256, depth=4)
    # matching geometry still estimates exactly (no collisions at n=2)
    est = {
        r.item: r.est
        for r in I.cms_estimate(
            state, items, ["k"], "item", width=256, depth=3
        ).collect()
    }
    assert est["x"] == 2 and est["y"] == 1


def test_merge_cms_rejects_geometry_disagreement(spark):
    """ADVICE r7: merging states with DIFFERENT geometries used to
    'succeed' (groupBy kept them as separate geometry rows) and only
    blow up later at cms_estimate; mixing a geometry-carrying state
    with a legacy geometry-less one died inside unionByName with an
    opaque column-mismatch error. Both must raise AT MERGE TIME with a
    message naming the real problem."""
    from sparkgraft import incremental as I
    import pytest as _pytest

    df = spark.createDataFrame(
        [("g", "x"), ("g", "y")], "k string, item string"
    )
    a = I.partial_cms(df, ["k"], "item", width=256, depth=3)
    b = I.partial_cms(df, ["k"], "item", width=512, depth=3)
    with _pytest.raises(ValueError, match="disagree on sketch geometry"):
        I.merge_cms([a, b], ["k"])
    legacy = a.drop("width", "depth")
    with _pytest.raises(ValueError, match="legacy geometry-less"):
        I.merge_cms([a, legacy], ["k"])
    # same geometry still folds exactly
    folded = I.merge_cms([a, a], ["k"])
    items = df.select("k", "item").distinct()
    est = {
        r.item: r.est
        for r in I.cms_estimate(
            folded, items, ["k"], "item", width=256, depth=3
        ).collect()
    }
    assert est["x"] == 2 and est["y"] == 2
