"""Data-contract validation (sparkgraft/contract.py): every check kind
against a fixture with planted violations, NULL semantics, and the
single-pass plan shape (adding scalar rules must not add scans).
"""

from __future__ import annotations

import pytest

from sparkgraft.contract import validate_contract


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10, "alpha"),
            (2, "en", -5, "beta"),      # min violation
            (2, "xx", 20, "gamma"),     # duplicate id + enum violation
            (3, None, 700, "delta"),    # null lang (allowed passes NULLs)
            (4, "de", 30, "not ok"),    # regex violation (space)
        ],
        "id long, lang string, n int, name string",
    )


RULES = [
    {"column": "id", "check": "not_null"},
    {"column": "id", "check": "unique"},
    {"column": "lang", "check": "not_null"},
    {"column": "lang", "check": "allowed", "values": ["en", "de"]},
    {"column": "n", "check": "min", "value": 0},
    {"column": "n", "check": "max", "value": 500},
    {"column": "name", "check": "matches", "pattern": r"^\S+$"},
]


def test_contract_counts_and_verdicts(spark, table):
    rows = {r.rule_id: r for r in validate_contract(table, RULES).collect()}
    assert len(rows) == len(RULES)
    assert rows["id:not_null"].n_violations == 0 and rows["id:not_null"].passed
    assert rows["id:unique"].n_violations == 2  # both rows of the dup value
    assert rows["lang:not_null"].n_violations == 1
    # NULL lang is NOT an enum violation; 'xx' is
    assert rows["lang:allowed"].n_violations == 1
    assert rows["n:min"].n_violations == 1
    assert rows["n:max"].n_violations == 1
    assert rows["name:matches"].n_violations == 1
    assert not rows["n:max"].passed


def test_contract_all_green_on_clean_table(spark):
    clean = spark.createDataFrame([(1, "en"), (2, "de")], "id long, lang string")
    out = validate_contract(
        clean,
        [
            {"column": "id", "check": "unique"},
            {"column": "id", "check": "not_null"},
            {"column": "lang", "check": "allowed", "values": ["en", "de"]},
        ],
    )
    assert all(r.passed and r.n_violations == 0 for r in out.collect())


def test_contract_unknown_check_raises(spark, table):
    with pytest.raises(ValueError, match="unknown contract check"):
        validate_contract(table, [{"column": "id", "check": "positive"}]).collect()


def test_scalar_rules_share_one_scan(spark, table):
    # 6 scalar rules -> ONE aggregate over the table: the plan reads the
    # source exactly once (unique rules are the documented exception)
    scalar_only = [r for r in RULES if r["check"] != "unique"]
    plan = (
        validate_contract(table, scalar_only)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LocalTableScan") <= 2  # data scan + broadcast meta


def test_profile_table_one_pass(spark, table):
    from sparkgraft.contract import profile_table

    prof = {r.column: r for r in profile_table(table).collect()}
    assert set(prof) == {"id", "lang", "n", "name"}
    assert all(r.n_rows == 5 for r in prof.values())
    assert prof["lang"].n_null == 1
    assert prof["lang"].null_frac == pytest.approx(0.2)
    assert prof["id"].n_null == 0
    # HLL at tiny cardinality is exact
    assert prof["id"].n_distinct_approx == 4
    assert prof["n"].min_str == "-5" and prof["n"].max_str == "700"
    # ONE aggregate over the data: a single source scan in the plan
    plan = (
        profile_table(table)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_profile_table_empty_input(spark):
    from sparkgraft.contract import profile_table

    empty = spark.createDataFrame([], "id long, v string")
    rows = {r.column: r for r in profile_table(empty).collect()}
    assert rows["id"].n_rows == 0 and rows["id"].n_null == 0
    assert rows["id"].null_frac == 0.0  # guarded denominator
    assert rows["v"].min_str is None


def test_contract_duplicate_column_check_pairs(spark, table):
    rules = [
        {"column": "n", "check": "min", "value": 0},
        {"column": "n", "check": "min", "value": 25},  # tighter second bound
    ]
    rows = {r.rule_id: r.n_violations for r in validate_contract(table, rules).collect()}
    assert rows == {"n:min": 1, "n:min#2": 3}  # -5 fails both; 10 and 20 fail #2


def test_contract_empty_rules(spark, table):
    out = validate_contract(table, [])
    assert out.count() == 0
    assert set(out.columns) == {"rule_id", "column", "check", "n_violations", "passed"}


def test_profile_table_empty_columns_list(spark, table):
    """ADVICE r4: columns=[] used to build malformed ``stack(0, )``
    SQL; it now mirrors validate_contract's empty-rules branch — an
    empty report with the documented schema. Same for a zero-column
    DataFrame."""
    from sparkgraft.contract import profile_table

    out = profile_table(table, columns=[])
    assert out.count() == 0
    assert list(out.columns) == [
        "column", "n_rows", "n_null", "null_frac",
        "n_distinct_approx", "min_str", "max_str",
    ]
    zero_cols = table.drop(*table.columns)
    assert profile_table(zero_cols).count() == 0


def test_profile_drift_flags_null_spike_and_cardinality_collapse(spark):
    """Drift between two snapshots: a null spike beyond tolerance and a
    distinct-count collapse both flag; a stable column does not."""
    from sparkgraft.contract import profile_drift

    before = spark.createDataFrame(
        [(i, f"u{i}", f"l{i % 10}") for i in range(100)],
        "id long, user string, lang string",
    )
    after = spark.createDataFrame(
        # nulls spike to 20% on user; lang collapses 10 values -> 1
        [(i, None if i % 5 == 0 else f"u{i}", "xx") for i in range(100)],
        "id long, user string, lang string",
    )
    out = {r.column: r for r in profile_drift(before, after).collect()}
    assert set(out) == {"id", "user", "lang"}
    assert not out["id"].drifted
    assert out["user"].drifted and out["user"].null_frac_delta == 0.2
    assert out["lang"].drifted and out["lang"].distinct_ratio < 0.5
    assert out["id"].n_rows_before == out["id"].n_rows_after == 100


def test_profile_drift_defaults_to_shared_columns(spark):
    """columns=None profiles only the columns both snapshots share."""
    from sparkgraft.contract import profile_drift

    before = spark.createDataFrame([(1, "a")], "id long, old string")
    after = spark.createDataFrame([(1, "b")], "id long, new string")
    out = profile_drift(before, after).collect()
    assert [r.column for r in out] == ["id"]


def test_numeric_correlations_known_values(spark):
    """Pearson r from the one-scan sufficient statistics: exact +1 for
    a linear relation, exact -1 for its negation, ~0 for designed
    orthogonality; NULL rows drop pairwise; degenerate (constant)
    columns yield NULL instead of dividing by zero."""
    from sparkgraft.contract import numeric_correlations

    rows = []
    for i in range(40):
        x = float(i)
        rows.append((x, 2 * x + 3, -x, 7.0, x if i % 2 == 0 else None))
    df = spark.createDataFrame(
        rows, "x double, lin double, neg double, const double, gappy double"
    )
    out = {
        (r.col_a, r.col_b): (r.n, r.corr)
        for r in numeric_correlations(
            df, ["x", "lin", "neg", "const", "gappy"]
        ).collect()
    }
    assert out[("x", "lin")] == (40, 1.0)
    assert out[("x", "neg")] == (40, -1.0)
    assert out[("x", "const")][1] is None  # zero variance
    n, corr = out[("x", "gappy")]
    assert n == 20 and corr == 1.0  # pairwise-complete rows only

    # fewer than two columns -> empty report with the documented schema
    empty = numeric_correlations(df, ["x"])
    assert empty.count() == 0
    assert list(empty.columns) == ["col_a", "col_b", "n", "corr"]


def test_mad_outliers_planted_and_degenerate(spark):
    from sparkgraft.contract import mad_outliers

    rows = (
        # group A: spread values, one wild point
        [("A", i, float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 15, 500])]
        # group B: constant (MAD = 0) plus one deviation -> fallback rule
        + [("B", i, 7.0) for i in range(6)]
        + [("B", 99, 8.0)]
    )
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {
        (r.g, r.id): r
        for r in mad_outliers(df, ["g"], "v", id_cols=["id"]).collect()
    }
    # group A: median 13, MAD 2 -> 500 is a massive outlier, rest are not
    a_flags = {i: out[("A", i)].is_outlier for i in range(7)}
    assert a_flags[6] is True
    assert all(a_flags[i] is False for i in range(6))
    assert out[("A", 6)].robust_z > 100
    # group B: MAD = 0 -> robust_z NULL, any deviation flagged
    assert out[("B", 99)].is_outlier is True
    assert out[("B", 99)].robust_z is None
    assert all(out[("B", i)].is_outlier is False for i in range(6))


def test_psi_drift_detects_shift(spark, sf_dir):
    """PSI: a snapshot against itself scores ~0; a 15%-scaled copy of
    the same column scores well above the 0.1 drift line."""
    from sparkgraft.contract import psi_drift
    from sparkgraft.io import read_table

    orders = read_table(spark, sf_dir, "orders")
    same = psi_drift(
        orders, orders, "o_totalprice", 0.0, 600000.0, bins=10
    ).collect()[0]
    assert same.psi == 0.0
    assert same.n_baseline == same.n_current

    from pyspark.sql import functions as SF

    shifted = orders.withColumn(
        "o_totalprice", SF.col("o_totalprice") * 1.15
    )
    moved = psi_drift(
        orders, shifted, "o_totalprice", 0.0, 600000.0, bins=10
    ).collect()[0]
    assert moved.psi > 0.1


def test_psi_drift_degenerate_range_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from sparkgraft.contract import psi_drift

    df = spark.range(3).withColumn("v", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", lo=1.0, hi=1.0)
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", lo=0.0, hi=1.0, bins=0)


def test_groupwise_ols_matches_numpy_and_handles_degenerates(spark):
    import numpy as np

    from sparkgraft.contract import groupwise_ols

    rows = []
    for i in range(50):
        rows.append(("up", float(i), 2.5 * i + 7 + (i % 3 - 1) * 0.25))
    rows += [("flatx", 1.0, float(v)) for v in (1, 2, 3)]   # zero x-variance
    rows += [("tiny", 1.0, 2.0)]                             # n < 2
    rows += [("up", None, 5.0), ("up", 3.0, None)]           # pairwise-incomplete
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.k: r for r in groupwise_ols(df, ["k"], "x", "y").collect()}

    xs = np.array([r[1] for r in rows[:50]])
    ys = np.array([r[2] for r in rows[:50]])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(out["up"].slope - slope) < 1e-6
    assert abs(out["up"].intercept - intercept) < 1e-6
    assert out["up"].r2 > 0.99
    assert out["up"].n == 50  # incomplete rows excluded
    assert out["flatx"].slope is None and out["flatx"].r2 is None
    assert out["tiny"].slope is None


def test_key_skew_report_flags_hot_key(spark):
    import math

    from sparkgraft.contract import key_skew_report

    rows = [(0, "u") for _ in range(95)] + [(i, "u") for i in range(1, 6)]
    rows = [(k, f"v{i % 10}") for i, (k, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "hot long, uniform string")
    out = {r.key_col: r for r in key_skew_report(df, ["hot", "uniform"]).collect()}
    # 95% hot key: top1_share flags it, entropy collapses toward 0
    assert out["hot"].top1_share == 0.95
    assert out["hot"].entropy < 0.3
    # 10 uniform values: top1_share == 1/10, entropy == ln(10) (rounded)
    assert out["uniform"].top1_share == 0.1
    assert abs(out["uniform"].entropy - math.log(10)) < 1e-5
    assert out["uniform"].topn_share == 1.0  # top-10 covers all 10 values
    assert out["hot"].n_rows == out["uniform"].n_rows == 100
