"""robots.txt gate query (r12). The corpus has no crawl surface, so
the query plants one URL per document across 5 hosts (path class by
residue) and ONE robots.txt per host (two groups: ``*`` and
``graftbot``) built as plain strings in Spark, parses them with the
Arrow rule parser, and gates every URL TWICE — once as an unlisted
agent (the ``*`` group governs) and once as ``graftbot`` (the exact
group governs and ``*`` must NOT leak). The oracle knows nothing
about robots parsing: the plant is a pure residue function, so it
states each verdict directly — group selection, longest-match
precedence, Allow-wins-ties, and default-allow all hash-checked.
Library logic in sparkgraft/robots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import robots as R
from ..io import read_table
from ..relational import spread
from .registry import register

_ROBOTS = (
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/public/\n"
    "\n"
    "User-agent: graftbot\n"
    "Disallow: /bot-only/\n"
)


@register(
    "robots_url_gate",
    # NEW r12 retired tier; PROMOTED to the active driver gate r13
    # (VERDICT r12 #5, slot funded by retiring the five-round-stable
    # user_next_event_pairs). RFC 9309 politeness as data. Verdict
    # matrix stated directly by the oracle: for the UNLISTED agent the
    # '*' group blocks /private/ but its longer Allow re-admits
    # /private/public/ (longest-match precedence), /bot-only/ is
    # untouched; for graftbot the exact group governs alone — only
    # /bot-only/ blocked, the '*' rules must not leak.
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'http://h' || CAST(CAST(doc_id % 5 AS INT) AS VARCHAR)
           || '.example.com'
           || (CASE CAST(doc_id % 4 AS INT)
                   WHEN 0 THEN '/private/x'
                   WHEN 1 THEN '/private/public/x'
                   WHEN 2 THEN '/bot-only/x'
                   ELSE '/ok/x' END)
           || CAST(doc_id AS VARCHAR) AS url,
           CAST(doc_id % 4 AS INT) != 0 AS allowed_unlisted,
           CAST(doc_id % 4 AS INT) != 2 AS allowed_graftbot
    FROM documents
    """,
)
def robots_url_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant URLs over 5 hosts x 4 path classes, one two-group robots
    file per host; ``robots_rules`` parses (one Arrow pass),
    ``robots_gate`` runs once per agent (host-keyed rules join + the
    per-URL argmax window). Verdicts are pure residue functions, so
    the oracle checks the full RFC semantics without reimplementing
    the parser."""
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://h"),
        (did % 5).cast("int").cast("string"),
        F.lit(".example.com"),
        F.when(did % 4 == 0, F.lit("/private/x"))
        .when(did % 4 == 1, F.lit("/private/public/x"))
        .when(did % 4 == 2, F.lit("/bot-only/x"))
        .otherwise(F.lit("/ok/x")),
        did.cast("string"),
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    urls = docs.select(
        did.cast("bigint").alias("doc_id"), url.alias("url")
    )
    hosts = (
        spark.range(5)
        .select(
            F.concat(
                F.lit("h"), F.col("id").cast("string"),
                F.lit(".example.com"),
            ).alias("host"),
            F.lit(_ROBOTS).alias("content"),
        )
    )
    rules = R.robots_rules(hosts)
    gated = R.robots_gate(
        urls, rules, agent="unlistedbot", out_col="allowed_unlisted"
    )
    gated = R.robots_gate(
        gated, rules, agent="graftbot", out_col="allowed_graftbot"
    )
    return gated.select(
        "doc_id", "url", "allowed_unlisted", "allowed_graftbot"
    )
