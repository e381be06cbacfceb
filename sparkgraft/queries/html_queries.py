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
