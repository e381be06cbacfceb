"""Property-based checks (SURVEY §5.4): conformance invariants hold for
arbitrary generated payload corpora, not just the hand-written fixtures.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkgraft import conformance as C

EVENTS = ["a", "b"]
PROPS = ["p", "q", "empty_me"]

payload = st.dictionaries(
    keys=st.sampled_from(PROPS + ["other"]),
    values=st.one_of(
        st.none(), st.just(""), st.text(alphabet="xyz", max_size=3), st.integers(0, 9)
    ),
    max_size=4,
)
row = st.tuples(st.sampled_from(EVENTS), payload)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=0, max_size=25))
def test_conformance_invariants_hold(spark, rows):
    catalog = spark.createDataFrame(
        [(e, json.dumps(p)) for e, p in rows] or [("a", None)],
        "event_name string, props string",
    )
    spec = spark.createDataFrame(
        [(e, p) for e in EVENTS for p in PROPS], "event_name string, prop_name string"
    )
    out = C.verify_events(catalog, spec, payload_cols=["props"]).collect()
    assert len(out) == len(EVENTS) * len(PROPS)  # every spec pair present
    for r in out:
        # FIXTURES.md §3 invariants
        assert r.value_null_count + r.value_not_null_count == r.total_records
        assert r.key_null_count + r.keys_not_null_count == r.total_records
        assert 0 <= r.key_null_count_percentage <= 100
        assert 0 <= r.value_null_count_percentage <= 100
        # a key may exist with an empty/null value, never the reverse
        assert r.keys_not_null_count >= r.value_not_null_count
        assert r.total_records >= 0
