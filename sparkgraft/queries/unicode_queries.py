"""Unicode canonical-equivalence dedup keys (r13 extension).

Plants BOTH byte spellings of the same user-visible string — composed
(``café Å``, U+00E9/U+00C5) and decomposed (``cafe`` + U+0301, ``A``
+ U+030A) — appended to every document's real text, then checks that
``unicodenorm.nfc_text`` collapses them to one canonical key while
the raw bytes stay distinct.  The DuckDB oracle recomputes every
column with its own UAX #15 implementation (``nfc_normalize``), so
the query hash-verifies engine-portable NFC over the REAL corpus text
plus the planted matrix: any divergence between Python's unicodedata
and DuckDB's normalizer — or any defect in the UDF (missed
normalization, mangled non-ASCII, NULL mishandling) — mismatches.
Library logic in sparkgraft/unicodenorm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..relational import spread
from ..unicodenorm import nfc_text
from .registry import register

# composed spelling (U+00E9, U+00C5) and its canonical decomposition
_COMPOSED = " caf\u00e9 \u00c5"
_DECOMPOSED = " cafe\u0301 A\u030a"


@register(
    "nfc_canonical_dedup",
    # ACTIVE (r13 second rotation): newest tier takes a driver slot
    # per the coverage policy; simhash_by_doc retired to fund it
    # chr(233)=é chr(197)=Å chr(769)=U+0301 chr(778)=U+030A
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             coalesce(text, '') || ' caf' || chr(233) || ' ' || chr(197)
               AS s_c,
             coalesce(text, '') || ' cafe' || chr(769) || ' A' || chr(778)
               AS s_d
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           (s_c = s_d) AS raw_equal,
           (nfc_normalize(s_c) = nfc_normalize(s_d)) AS nfc_equal,
           CAST(length(nfc_normalize(s_d)) AS BIGINT) AS key_chars,
           CAST(length(s_d) - length(nfc_normalize(s_d)) AS BIGINT)
             AS nfc_len_delta
    FROM planted
    """,
)
def nfc_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append the composed and decomposed spellings to each document's
    text, key both through ``nfc_text``, and emit ``(doc_id,
    raw_equal, nfc_equal, key_chars, nfc_len_delta)`` — raw bytes
    differ, NFC keys must not.  Row-local (rides the scan, spread
    only); the NFC pass is one Arrow-batched UDF per variant.
    """
    docs = spread(read_table(spark, sf_dir, "documents"))
    base = F.coalesce(F.col("text"), F.lit(""))
    s_c = F.concat(base, F.lit(_COMPOSED))
    s_d = F.concat(base, F.lit(_DECOMPOSED))
    k_c = nfc_text(s_c)
    k_d = nfc_text(s_d)
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        (s_c == s_d).alias("raw_equal"),
        (k_c == k_d).alias("nfc_equal"),
        F.length(k_d).cast("bigint").alias("key_chars"),
        (F.length(s_d) - F.length(k_d)).cast("bigint").alias("nfc_len_delta"),
    )
