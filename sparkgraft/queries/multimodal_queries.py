"""Multimodal extension queries with a REAL driver-checked oracle.

No binary table exists in testdata, so both engines construct the same
payload deterministically in-plan (the conformance_pipeline_versioned
technique): ``md5(text) || '|MM01|' || doc_id`` encoded as UTF-8 — pure
ASCII, so DuckDB's per-character ``ascii()`` equals the byte value and
the two engines agree byte-for-byte. Contrived payloads, real
operators: the Spark side runs the actual production plumbing
(``attach_media_metadata`` -> Arrow ``mapInPandas`` decode in
:mod:`sparkgraft.multimodal`, and the declarative byte-slicing
``sample_frames``), which is exactly what a real deployment would run
with a non-fake decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import multimodal as M
from ..io import read_table
from ..relational import spread
from .registry import register

# Shared payload construction (both engines build the identical string).
_PAYLOAD_SQL = "md5(text) || '|MM01|' || CAST(doc_id AS VARCHAR)"


def _payload_col() -> F.Column:
    return F.concat(
        F.md5(F.col("text")),
        F.lit("|MM01|"),
        F.col("doc_id").cast("string"),
    )


@register(
    "multimodal_features",
    f"""
    WITH p AS (
        SELECT doc_id AS media_id, {_PAYLOAD_SQL} AS s FROM documents
    )
    SELECT media_id,
           CAST(length(s) AS BIGINT) AS feat_n_bytes,
           round(CAST(list_sum(list_transform(range(1, length(s) + 1),
                     i -> ascii(substr(s, CAST(i AS INT), 1))))
                 AS DOUBLE) / length(s), 4) AS feat_mean_byte,
           CAST(ascii(substr(s, 1, 1)) AS BIGINT) AS feat_first_byte
    FROM p
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction end-to-end: payload bytes built
    in-plan, canonical media shape, Arrow-batched ``mapInPandas``
    decode (the stub decoder's byte statistics ARE the oracle-checkable
    features: exact integer byte sum -> one double division, rounded
    identically on both engines)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    media = M.attach_media_metadata(
        docs.select(
            "doc_id", F.encode(_payload_col(), "UTF-8").alias("payload")
        ),
        payload_col="payload",
        modality="image",
        format="fake",
        id_col="doc_id",
    )
    feats = M.extract_features(media)
    return feats.select(
        "media_id",
        "feat_n_bytes",
        F.round(F.col("feat_mean_byte"), 4).alias("feat_mean_byte"),
        "feat_first_byte",
    )


@register(
    "multimodal_frame_sample",
    f"""
    WITH p AS (
        SELECT doc_id AS media_id, {_PAYLOAD_SQL} AS s FROM documents
    )
    SELECT media_id, CAST(t.i AS BIGINT) AS frame_idx,
           substr(s, CAST(floor(t.i * greatest(length(s) - 16, 1) / 3.0)
                          AS INT) + 1, 16) AS frame_text
    FROM p, range(0, 4) t(i)
    WHERE length(substr(s, CAST(floor(t.i * greatest(length(s) - 16, 1) / 3.0)
                               AS INT) + 1, 16)) > 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative frame sampling over the same synthetic payloads: 4
    evenly-spaced 16-byte slices per payload via posexplode over a
    generated offset sequence — no Python in the plan. Frames decode
    back to UTF-8 for the value hash (ASCII payloads make the bytes ==
    chars equivalence exact)."""
    docs = spread(read_table(spark, sf_dir, "documents"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(_payload_col(), "UTF-8").alias("payload"),
    )
    frames = M.sample_frames(media, n_frames=4, frame_bytes=16)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.decode(F.col("frame"), "UTF-8").alias("frame_text"),
    )
