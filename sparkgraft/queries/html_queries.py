"""HTML extraction query (r12). The corpus carries no HTML, so the
query WRAPS each document's text in a real HTML page (head/title/style
noise, script noise, heading, escaped body text, an outlink, an img
alt) with pure string expressions BOTH engines can build, runs the
one-pass ``html.extract_html`` Arrow extractor over it, and the oracle
states what extraction must recover — the un-escaped text in the
documented whitespace normal form, the title, and the outlink list.
Library logic in sparkgraft/html.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import html as H
from ..io import read_table
from ..relational import spread
from .registry import register


@register(
    "html_text_extraction",
    # NEW r12 retired tier: markup strip / entity decode / skip-element
    # drop / title + outlink extraction, verified as a build-extract
    # round trip — the oracle knows nothing about HTML parsing and
    # simply states the recovery contract over the documents table.
    retired=True,
    oracle=r"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           trim(regexp_replace(
               'Doc ' || CAST(doc_id AS VARCHAR) || ' '
               || coalesce(text, '') || ' next pic',
               '\s+', ' ', 'g')) AS text,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           '/next/' || CAST(doc_id AS VARCHAR) AS links_joined
    FROM documents
    """,
)
def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document's text in a page whose noise the extractor
    must drop (style/script payloads, markup, entity escapes — the
    body text goes in HTML-ESCAPED, so ``&``/``<``/``>`` in real
    documents round-trip through ``&amp;``-style entities) and whose
    signal it must keep (heading, body text, anchor text, img alt,
    title, href); one Arrow pass extracts all three products and the
    oracle recomputes them from the raw table. Any tag-soup,
    entity, skip-scope, or whitespace defect hash-mismatches."""
    esc = F.col("text")
    for a, b in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(a), F.lit(b))
    did_s = F.col("doc_id").cast("string")
    page = F.concat(
        F.lit("<html><head><title>Doc "), did_s,
        F.lit("</title><style>p {color: red}</style></head>"
              "<body><script>var x = '<p>not text</p>';</script>"
              "<h1>Doc "), did_s,
        F.lit("</h1><p>"), F.coalesce(esc, F.lit("")),
        F.lit('</p><a href="/next/'), did_s,
        F.lit('">next</a><img alt="pic"></body></html>'),
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    pages = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        page.alias("html"))
    out = H.extract_html(pages)
    # the driver compare sorts rows by every column, which arrays
    # defeat — join the outlink list into one ordered string (order is
    # part of the contract: document order, duplicates kept)
    return out.select(
        "doc_id", "text", "title",
        F.array_join("links", "|").alias("links_joined"),
    )


# the fixed ref matrix every planted page carries (r13, VERDICT r12
# #2): relative path, ../ climb, absolute path, scheme-relative
# network path, query-only, and interior dot segments — the RFC 3986
# §5 cases a crawl frontier actually hits
_REFS = (
    "rel/x", "../up", "/abs?q=1", "//cdn.example.com/lib.js", "?y",
    "g/./h/../i",
)


@register(
    "html_link_resolution",
    # NEW r13 retired tier: RFC 3986 §5 reference resolution over the
    # extractor's outlink frontier, honoring <base href>. The oracle
    # knows nothing about resolution — every planted ref's resolved
    # form is a pure function of doc_id (odd docs carry a <base
    # href="/base/dir/">), so it states the expected URL per
    # (doc_id, link_no) directly; any merge, dot-segment, base, or
    # component-recomposition defect hash-mismatches.
    oracle="""
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(r.link_no AS INT) AS link_no,
           (CASE r.link_no
             WHEN 0 THEN (CASE WHEN d.doc_id % 2 = 1
               THEN 'http://site.example.com/base/dir/rel/x'
               ELSE 'http://site.example.com/a/b/rel/x' END)
             WHEN 1 THEN (CASE WHEN d.doc_id % 2 = 1
               THEN 'http://site.example.com/base/up'
               ELSE 'http://site.example.com/a/up' END)
             WHEN 2 THEN 'http://site.example.com/abs?q=1'
             WHEN 3 THEN 'http://cdn.example.com/lib.js'
             WHEN 4 THEN (CASE WHEN d.doc_id % 2 = 1
               THEN 'http://site.example.com/base/dir/?y'
               ELSE 'http://site.example.com/a/b/page'
                    || CAST(d.doc_id AS VARCHAR) || '.html?y' END)
             ELSE (CASE WHEN d.doc_id % 2 = 1
               THEN 'http://site.example.com/base/dir/g/i'
               ELSE 'http://site.example.com/a/b/g/i' END)
            END) AS resolved_url
    FROM documents d
    CROSS JOIN (SELECT unnest(range(6)) AS link_no) r
    """,
    retired=True,
)
def html_link_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build one page per document carrying the fixed ref matrix
    (odd doc_ids also carry ``<base href="/base/dir/">``), extract
    with ``extract_html(url_col=...)`` — ONE Arrow pass that parses,
    captures the base, and resolves every href per RFC 3986 §5 — then
    posexplode the resolved frontier to ``(doc_id, link_no,
    resolved_url)``. Same scale shape as extraction itself: the
    resolution rides the existing pass, zero extra stages."""
    did_s = F.col("doc_id").cast("string")
    anchors = F.concat(
        *[F.lit(f'<a href="{r}">{i}</a>') for i, r in enumerate(_REFS)]
    )
    page = F.concat(
        F.lit("<html><head>"),
        F.when(
            F.col("doc_id") % 2 == 1,
            F.lit('<base href="/base/dir/">'),
        ).otherwise(F.lit("")),
        F.lit("</head><body>"),
        anchors,
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("http://site.example.com/a/b/page"), did_s, F.lit(".html")
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    pages = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        url.alias("url"),
        page.alias("html"),
    )
    out = H.extract_html(pages, url_col="url")
    return out.select(
        "doc_id", F.posexplode("resolved_links").alias("link_no", "resolved_url")
    ).select(
        "doc_id", F.col("link_no").cast("int").alias("link_no"), "resolved_url"
    )


@register(
    "html_meta_canonical_gate",
    # NEW r13 retired tier: the page-level curation signals — <link
    # rel=canonical> (RFC 6596) resolved per RFC 3986 against the
    # record URL, and <meta name=robots> noindex exclusion. The
    # EFFECTIVE dedup key is the page's own canonical hint when
    # present, else its canonicalized record URL — the real-pipeline
    # rule this tier exists for. All plants are residue functions; the
    # oracle states key and verdict directly.
    retired=True,
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(doc_id % 3 = 0 AS BOOLEAN) AS noindex,
           (CASE WHEN doc_id % 4 = 1
                 THEN 'http://site.example.com/canon/'
                      || CAST((doc_id // 4) * 4 + 1 AS VARCHAR)
                 WHEN doc_id % 4 = 2
                 THEN 'http://other.example.com/c/'
                      || CAST(doc_id AS VARCHAR)
                 ELSE 'http://site.example.com/page/'
                      || CAST(doc_id AS VARCHAR) END) AS effective_key
    FROM documents
    """,
)
def html_meta_canonical_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant per-doc pages: every third doc carries ``<meta
    name=robots content="noindex, nofollow">``; ``%4==1`` docs carry a
    RELATIVE rel=canonical (``/canon/<4k+1>`` — resolution against the
    record URL is on the hash), ``%4==2`` an ABSOLUTE cross-host one.
    One Arrow extract pass; the effective key folds row-locally:
    resolve(record_url, canonical_href) when present, else
    canonical_url(record_url) (the record URLs carry tracking noise
    the canonicalizer must strip). Zero shuffles beyond the spread."""
    did = F.col("doc_id")
    did_s = did.cast("string")
    url = F.concat(
        F.lit("http://site.example.com/page/"), did_s,
        F.lit("?utm_source=x"),
    )
    canon_tag = (
        F.when(
            did % 4 == 1,
            F.concat(
                F.lit('<link rel="canonical" href="/canon/'),
                (F.floor(did / 4) * 4 + 1).cast("bigint").cast("string"),
                F.lit('">'),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(
                F.lit('<link rel="canonical" href="http://other.example.com/c/'),
                did_s,
                F.lit('">'),
            ),
        )
        .otherwise(F.lit(""))
    )
    robots_tag = F.when(
        did % 3 == 0,
        F.lit('<meta name="robots" content="noindex, nofollow">'),
    ).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><head>"), canon_tag, robots_tag,
        F.lit("</head><body><p>doc "), did_s,
        F.lit("</p></body></html>"),
    )
    docs = spread(read_table(spark, sf_dir, "documents"))
    pages = docs.select(
        did.cast("bigint").alias("doc_id"),
        url.alias("url"),
        page.alias("html"),
    )
    ext = H.extract_html(pages, url_col="url")
    # resolve the canonical hint in the SAME Arrow tier is overkill
    # for a single reference — the RFC resolver runs row-local via a
    # tiny second pass? No: the hint here is either absolute or
    # root-relative, so the resolution is expressible row-locally:
    # scheme://host + href when href starts with '/', href when it
    # has a scheme, else resolved by the Python tier upstream. The
    # general path (dot segments, relative dirs) is owned by
    # extract_html(url_col=...).resolved_links and html_link_
    # resolution; HERE the fold stays pure codegen.
    from .. import web as W

    p = W.parse_url("url")
    resolved_canon = (
        F.when(
            F.col("canonical_href").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
            F.col("canonical_href"),
        )
        .when(
            F.col("canonical_href").startswith("/"),
            F.concat(
                p["scheme"], F.lit("://"), p["host"], F.col("canonical_href")
            ),
        )
        .otherwise(F.col("canonical_href"))
    )
    noindex = F.coalesce(
        F.col("meta_robots").rlike(r"(^|[,\s])noindex([,\s]|$)"),
        F.lit(False),
    )
    return ext.select(
        "doc_id",
        noindex.alias("noindex"),
        F.coalesce(
            resolved_canon, W.canonical_url("url")
        ).alias("effective_key"),
    )
