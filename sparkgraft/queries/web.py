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


@register(
    "web_url_canonical_dedup",
    # NEW r11 retired tier: URL-keyed dedup via web.canonical_url —
    # the cheapest dedup tier of a web-scale pipeline. The corpus has
    # no URL column, so each document plants THREE-WAY-colliding URL
    # variants (case/www/default-port/slash/tracking-param/order/
    # fragment noise by doc_id residue); the oracle rebuilds the
    # construction AND every canonicalization rule (lowercase, www +
    # default-port + trailing-dot strip, slash collapse, tracking-param
    # drop, parameter sort) and the keep-min-id-per-canonical verdict.
    retired=True,
    oracle=r"""
    WITH u AS (
        SELECT doc_id, source,
               (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://www.' ELSE 'http://' END)
               || 'crawl.example.com'
               || (CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END)
               || '/bucket' || CAST(CAST(doc_id AS BIGINT) // 3 AS VARCHAR)
               || (CASE CAST(doc_id % 3 AS INT)
                       WHEN 0 THEN '//item/?utm_source=x&b=2&a=1'
                       WHEN 1 THEN '/item?a=1&b=2&utm_campaign=y#frag'
                       ELSE '/item/?b=2&gclid=z&a=1' END)
                 AS url
        FROM documents
    ), parsed AS (
        SELECT doc_id, url,
               lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host0,
               regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
               regexp_extract(url, '\?([^#]*)', 1) AS q0
        FROM u
    ), canon AS (
        SELECT doc_id,
               scheme || '://'
               || regexp_replace(
                      CASE WHEN scheme = 'http'
                           THEN regexp_replace(
                               regexp_replace(host0, '^www\.', ''),
                               ':80$', '')
                           WHEN scheme = 'https'
                           THEN regexp_replace(
                               regexp_replace(host0, '^www\.', ''),
                               ':443$', '')
                           ELSE regexp_replace(host0, '^www\.', '') END,
                      '\.$', '')
               || regexp_replace(
                      regexp_replace(path0, '/+', '/', 'g'), '/$', '')
               || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
        FROM (
            SELECT *,
                   array_to_string(list_sort(list_filter(
                       string_split(q0, '&'),
                       x -> x != '' AND NOT regexp_matches(
                           x, '^(utm_|gclid=|fbclid=|ref=)'))), '&') AS q
            FROM parsed
        )
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keep_doc_id
    FROM canon
    GROUP BY 1
    """,
)
def web_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup through ``web.canonical_url``: every planted
    3-document bucket carries the same page behind case / www /
    default-port / duplicate-and-trailing-slash / tracking-parameter /
    parameter-order / fragment noise; the canonical key must collapse
    each bucket to one group with ``keep_doc_id`` = its min doc_id.
    One row-local canonicalization pass + one groupBy — the same scale
    shape as exact-hash dedup, because that is what this IS, with a
    content-identity-aware key."""
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 3 == 0, F.lit("HTTP://www.")).otherwise(
            F.lit("http://")
        ),
        F.lit("crawl.example.com"),
        F.when(did % 3 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/bucket"),
        F.floor(did / 3).cast("bigint").cast("string"),
        F.when(did % 3 == 0, F.lit("//item/?utm_source=x&b=2&a=1"))
        .when(did % 3 == 1, F.lit("/item?a=1&b=2&utm_campaign=y#frag"))
        .otherwise(F.lit("/item/?b=2&gclid=z&a=1")),
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.col("doc_id"), W.canonical_url(url).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
    )
