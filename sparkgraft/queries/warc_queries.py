"""WARC ingestion query (r12). The corpus tables carry no WARC files,
so the query BUILDS one real WARC file per document (warcinfo record +
HTTP response record, url and status planted as pure functions of
doc_id, body = the document text) with the library's own writer, then
cracks them back through ``warc.warc_responses`` — a full
write-then-ingest round trip whose expected output the DuckDB oracle
recomputes directly from the documents table. Library logic in
sparkgraft/warc.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import warc as WC
from ..io import read_table
from ..relational import spread
from .registry import register


@register(
    "warc_http_responses",
    # NEW r12 retired tier: the web-crawl ingestion step — WARC/1.0
    # framing (gzip members), HTTP response splitting, record-type
    # filtering — verified as a build/parse round trip: the oracle
    # knows nothing about WARC and simply states what ingestion must
    # recover from the documents table.
    retired=True,
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS file_id,
           'http://crawl.example.com/doc/' || CAST(doc_id AS VARCHAR)
             AS url,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INT)
             AS status,
           coalesce(text, '') AS body_text,
           CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_body_bytes
    FROM documents
    """,
)
def warc_http_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build one gzip-member WARC file per document (warcinfo +
    response; a 404 planted on every seventh doc), crack them with
    ``warc.warc_responses``, and emit ``(file_id, url, status,
    body_text, n_body_bytes)``. Two Arrow map passes (build, crack) —
    no shuffle beyond the spread; the oracle recomputes the expected
    rows straight from the documents table, so any framing, gzip,
    HTTP-split, or byte-fidelity defect in EITHER the writer or the
    parser hash-mismatches."""
    import pandas as pd

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                body = (text or "").encode("utf-8")
                status = 404 if did % 7 == 0 else 200
                recs = [
                    WC.build_warc_record(
                        "warcinfo", b"software: sparkgraft\r\n",
                        content_type="application/warc-fields",
                    ),
                    WC.build_warc_record(
                        "response",
                        WC.build_http_response(status=status, body=body),
                        url=f"http://crawl.example.com/doc/{did}",
                    ),
                ]
                ids.append(did)
                payloads.append(WC.build_warc_file(recs, gzip_members=True))
            yield pd.DataFrame({"file_id": ids, "payload": payloads})

    docs = spread(read_table(spark, sf_dir, "documents"))
    files = docs.select("doc_id", "text").mapInPandas(
        build, "file_id long, payload binary"
    )
    out = WC.warc_responses(files)
    return out.where(F.col("warc_error").isNull()).select(
        F.col("file_id").cast("bigint").alias("file_id"),
        "url",
        "status",
        F.decode(F.col("body"), "UTF-8").alias("body_text"),
        F.col("n_body_bytes").cast("bigint").alias("n_body_bytes"),
    )
