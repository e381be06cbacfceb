"""The retired query tier stays correct even though it no longer
consumes driver-gate slots (queries/__init__.py coverage policy):
every retired query runs on Spark AND its DuckDB oracle on the same
parquet tables, compared with the driver's discipline — row count,
sorted column names, and cell values (rows sorted by all columns).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from sparkgraft import queries as Q
from sparkgraft.io import TPCH_TABLES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    import os

    for t in TPCH_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        return a == b or math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12)
    return a == b


# The two queries that were BORN rows-only (engine-specific ANN
# bucketing/indexing; no SQL twin exists by design) and were rotated to
# the retired tier in r6 once their hash-checked planted-oracle twins
# (ann_lsh_top1_planted / ann_ivf_top1_planted) took over the ACTIVE
# evidence. Recall-vs-brute-force is asserted in tests/test_similarity.
ROWS_ONLY_RETIRED = {
    "ann_lsh_topk",
    "ann_ivf_topk",
    # r7: the ANN-armed hybrid's RP-LSH bucketing is not practically
    # re-expressible in SQL (the ann_lsh_topk precedent); its fused
    # top-10 is recall-gated against the fully-oracled exact twin in
    # tests/test_similarity.py::test_hybrid_retrieval_ann_tier_tracks_exact_tier
    "hybrid_retrieval_rrf_ann",
    # r8 (VERDICT r7 #1): the two remaining born-rows-only actives
    # rotate here — their hash-checked planted twins
    # (embedding_near_dup_lsh_planted active since r5;
    # semantic_dedup_planted promoted to active r8) carry the oracle
    # evidence, and the freed slots make CORRECTNESS_r08 the first
    # all-hash-green artifact. Recall/keep-rule/plan-shape coverage
    # stays in tests/test_similarity.py and tests/test_semdedup.py.
    "embedding_near_dup_lsh",
    "semantic_dedup_embeddings",
}


def test_retired_tier_is_fully_oracled():
    # retirement must never silently downgrade a query to rows-only:
    # the only un-oracled retired entries are the documented
    # born-rows-only pair whose planted twins hold the active oracle
    assert set(Q.RETIRED_QUERIES) - set(Q.RETIRED_ORACLES) == ROWS_ONLY_RETIRED
    # and never shadow an active name
    assert not set(Q.RETIRED_QUERIES) & set(Q.QUERIES)


@pytest.mark.parametrize("name", sorted(Q.RETIRED_ORACLES))
def test_retired_query_matches_oracle(spark, name, duck):
    sdf = Q.RETIRED_QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.sql(Q.RETIRED_ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        try:
            ok = bool(((sc.values == oc.values) | (sc.isna().values & oc.isna().values)).all())
        except (TypeError, ValueError):
            ok = False
        if not ok:
            bad = [
                (i, sc.iloc[i], oc.iloc[i])
                for i in range(len(s))
                if not _cells_equal(sc.iloc[i], oc.iloc[i])
            ]
            assert not bad, f"{name}.{c}: first mismatches {bad[:3]}"
