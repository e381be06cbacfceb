"""Tar-shard container round trip (r13 extension). The corpus tables
carry no tar shards, so the query BUILDS them in-plan — documents
group into 16 shards, each shard serializes to real ustar bytes with
the library's own writer (two members per sample: ``{key}.txt`` = the
document text, ``{key}.json`` = a metadata record), then every shard
cracks back through ``tarshard.tar_samples`` and pivots to samples —
a full container write-then-ingest round trip whose expected output
the DuckDB oracle recomputes directly from the documents table,
knowing nothing about tar framing.  Any member-naming, grouping,
padding, byte-fidelity, or pivot defect on EITHER side of the
container seam hash-mismatches.  Library logic in
sparkgraft/tarshard.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import tarshard as TS
from ..io import read_table
from ..relational import spread
from .registry import register


@register(
    "tar_shard_corpus_roundtrip",
    # ACTIVE (r13 second rotation): newest tier takes a driver slot
    # per the coverage policy; dedup_exact_keep_first retired to fund it
    # the oracle states only what ingestion must recover from the
    # documents table: byte counts are UTF-8 byte lengths (strlen),
    # every sample carries exactly its two members
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           coalesce(text, '') AS text,
           lang,
           source,
           CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_txt_bytes,
           CAST(2 AS BIGINT) AS n_members
    FROM documents
    """,
)
def tar_shard_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group documents into 16 tar shards (``pmod(doc_id, 16)`` —
    deterministic, balanced), serialize each shard executor-side with
    ``build_tar_shard`` (keys = zero-padded doc_ids, members
    ``.txt`` + ``.json``), crack every shard with ``tar_samples``,
    pivot with ``samples_wide``, and decode ``(doc_id, text, lang,
    source, n_txt_bytes, n_members)`` back out of the container.

    Plan: spread + ONE shuffle into shard groups (applyInPandas) +
    one Arrow crack pass + the sample-pivot groupBy — bytes never
    transit the driver, shard payloads bounded by the shard count.
    """
    import pandas as pd

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        samples = []
        for doc_id, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            did = int(doc_id)
            meta = json.dumps(
                {
                    "doc_id": did,
                    "lang": None if lang is None else str(lang),
                    "source": None if source is None else str(source),
                },
                sort_keys=True,
            )
            samples.append(
                (
                    f"{did:012d}",
                    [
                        ("txt", (text or "").encode("utf-8")),
                        ("json", meta.encode("utf-8")),
                    ],
                )
            )
        shard = int(pdf["__shard"].iloc[0])
        return pd.DataFrame(
            {"shard_id": [shard], "payload": [TS.build_tar_shard(samples)]}
        )

    docs = spread(read_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.pmod(F.col("doc_id"), F.lit(16)).cast("int").alias("__shard"),
    )
    shards = docs.groupBy("__shard").applyInPandas(
        build, "shard_id long, payload binary"
    )
    wide = TS.samples_wide(TS.tar_samples(shards), exts=["txt", "json"])
    meta = F.decode(F.col("json"), "UTF-8")
    return wide.select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.decode(F.col("txt"), "UTF-8").alias("text"),
        F.get_json_object(meta, "$.lang").alias("lang"),
        F.get_json_object(meta, "$.source").alias("source"),
        F.length(F.col("txt")).cast("bigint").alias("n_txt_bytes"),
        F.col("n_members").cast("bigint").alias("n_members"),
    )
