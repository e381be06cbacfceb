"""Web-curation URL gate queries (round 6). The corpus tables carry no
URL column, so the queries plant a deterministic URL per document
(pure function of doc_id/source — both engines rebuild it identically)
with residue classes that violate each rule exactly once: an ftp
scheme, a blocklisted host, an /ads/ path segment, an over-deep path,
and a tracking-parameter overload. Library logic in sparkgraft/web.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import web as W
from ..io import read_table
from ..relational import spread
from .registry import register

_DEEP = "/a/b/c/d/e/f/g/x"
_UTM = "?utm_a=1&utm_b=2&utm_c=3&utm_d=4&utm_e=5"
_BLOCKED_HOST = "blocked.example.com"


def _planted_url():
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 13 == 0, F.lit("ftp")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(did % 17 == 0, F.lit("blocked")).otherwise(F.col("source")),
        F.lit(".example.com"),
        F.when(did % 5 == 0, F.concat(F.lit("/ads/item"), did.cast("string")))
        .when(did % 9 == 0, F.lit(_DEEP))
        .otherwise(F.concat(F.lit("/article/"), did.cast("string"))),
        F.when(did % 4 == 0, F.lit(_UTM)).otherwise(F.lit("")),
    )


@register(
    "web_url_filter_gate",
    retired=True,
    oracle=f"""
    WITH u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 13 = 0 THEN 'ftp' ELSE 'https' END)
               || '://'
               || (CASE WHEN doc_id % 17 = 0 THEN 'blocked' ELSE source END)
               || '.example.com'
               || (CASE WHEN doc_id % 5 = 0
                        THEN '/ads/item' || CAST(doc_id AS VARCHAR)
                        WHEN doc_id % 9 = 0 THEN '{_DEEP}'
                        ELSE '/article/' || CAST(doc_id AS VARCHAR) END)
               || (CASE WHEN doc_id % 4 = 0 THEN '{_UTM}' ELSE '' END)
                 AS url
        FROM documents
    ), parsed AS (
        SELECT doc_id, url,
               lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
               regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS q
        FROM u
    ), comp AS (
        SELECT doc_id, url, scheme, host,
               regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
               list_filter(string_split(path, '/'), s -> s != '') AS segs,
               CAST(CASE WHEN q = '' THEN 0
                         ELSE len(string_split(q, '&')) END AS BIGINT)
                 AS n_params
        FROM parsed
    ), rules AS (
        SELECT doc_id, url, scheme, host, domain,
               CAST(len(segs) AS BIGINT) AS path_depth, n_params,
               (scheme = 'http' OR scheme = 'https') AS r_scheme,
               (host != '' AND host != '{_BLOCKED_HOST}') AS r_host,
               NOT (list_contains(list_transform(segs, s -> lower(s)), 'ads')
                    OR list_contains(list_transform(segs, s -> lower(s)),
                                     'tracker')) AS r_path,
               len(segs) <= 6 AS r_depth,
               n_params <= 4 AS r_params
        FROM comp
    )
    SELECT *,
           r_scheme AND r_host AND r_path AND r_depth AND r_params AS keep
    FROM rules
    """,
)
def web_url_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """web.url_filter over planted per-document URLs: scheme / host
    blocklist / path-segment blocklist / depth / query-param rules,
    each violated by exactly one doc_id residue class, all parse
    components and rule booleans + the keep conjunction recomputed by
    the oracle. Row-local regexp codegen — the gate rides the scan."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    planted = docs.select("doc_id", _planted_url().alias("url"))
    g = W.url_filter("url", host_blocklist=(_BLOCKED_HOST,))
    cols = [
        "scheme", "host", "domain", "path_depth", "n_params",
        "r_scheme", "r_host", "r_path", "r_depth", "r_params", "keep",
    ]
    return planted.select(
        "doc_id", "url", *[g[c].alias(c) for c in cols]
    )
