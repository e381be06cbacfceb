"""Behavioral analytics queries (funnel conversion, cohort retention)
over the events table — retired-tier breadth (the registry sits at its
50-slot cap): every step timestamp, conversion verdict, cohort
truncation, and retention count is recomputed by the DuckDB oracle.

Library logic in sparkgraft/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..analytics import cohort_retention, funnel_steps
from ..io import read_table
from .registry import register


@register(
    "user_funnel_view_click_purchase",
    # PROMOTED to a driver slot r6 (rotation policy)
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        WHERE event_type = 'click' AND ts > t1 GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1
    )
    SELECT s1.user_id,
           t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
           t3 IS NOT NULL AND t3 <= t1 + INTERVAL 7 DAY AS converted
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def user_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics.funnel_steps over view -> click -> purchase with a
    7-day conversion window. Leftmost-match semantics are exactly the
    oracle's chain of mins (first view, first click after it, first
    purchase after that); the Spark plan computes all three in ONE
    higher-order fold over each user's sorted funnel events — one
    shuffle, no per-step self-joins."""
    ev = read_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, ["view", "click", "purchase"], within="7 days"
    )


@register(
    "weekly_cohort_retention",
    retired=True,
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY 1
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        FROM events
    )
    SELECT f.cohort AS cohort_start,
           CAST(date_diff('day', f.cohort, a.period) // 7 AS BIGINT)
               AS period_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics.cohort_retention by week: users cohorted by the week
    of their first event; each (cohort, week-offset) cell counts the
    cohort members active that week — offset 0 is the cohort size.
    Two map-side aggregations and a tiny final group-by."""
    ev = read_table(spark, sf_dir, "events")
    return cohort_retention(ev, period="week")


@register(
    "event_transition_matrix",
    # NEW r6 retired tier: the Markov transition matrix with the
    # (ts, id) ordering, pair counts, and in-plan conditional
    # probabilities all recomputed in SQL.
    retired=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT cur, nxt, count(*) AS n_transitions
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    )
    SELECT cur, nxt, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / sum(n_transitions) OVER (PARTITION BY cur), 6) AS p_next
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analytics.event_transitions over the events table: P(next event
    type | current) per adjacent pair in each user's (ts, event_id)-
    ordered stream. One user-keyed window shuffle, a |types|^2-row
    aggregate, in-plan conditional probabilities — the next-action
    model a product-analytics stack derives before anything fancier."""
    from ..analytics import event_transitions

    return event_transitions(read_table(spark, sf_dir, "events"))
