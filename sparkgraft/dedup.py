"""Exact and near-duplicate detection for LLM training corpora.

Five operators, all expressed as DataFrame plans (no UDFs):

- exact:    md5-fingerprint groupBy (``text.fingerprint``)
- jaccard:  word-shingle inverted index self-join -> exact n-gram
            Jaccard >= threshold
- minhash:  md5-based MinHash signatures + LSH banding -> candidate
            pairs via band-bucket join -> exact-Jaccard verification
- simhash:  32-bit md5-derived SimHash per document (near-dup =
            small Hamming distance)

Scale shape: everything pivots on ``explode`` + equi-join — the
inverted-index pattern. The all-pairs O(n^2) comparison never appears;
candidate generation is |docs| x shingles (jaccard) or |docs| x bands
(LSH), and the shuffle key is the shingle/band hash, which AQE
re-splits if a hot shingle skews (stopword-heavy shingles are capped
by ``max_df`` document-frequency pruning, the standard trick).

Cross-engine determinism: every hash is md5 (identical hex everywhere),
and MinHash minimizes the md5 *hex string* lexicographically — a valid
uniform min-hash that needs no engine-specific 64-bit integer coercion.
Reference parity note: the reference has no dedup at all; this is the
north-star extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens

__all__ = [
    "word_shingles",
    "exact_dup_groups",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_signature",
    "lsh_bands",
    "minhash_near_dups",
    "simhash32",
]


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles ('n-grams') of the normalized text.
    Documents shorter than k tokens yield their full token join (one
    shingle) so short docs still participate."""
    tok = tokens(text)
    n = F.size(tok)
    # greatest(..., 1): docs with n <= k produce one full-text shingle;
    # also keeps sequence()/slice() args valid — when/otherwise does NOT
    # short-circuit, so the transform is evaluated even for empty docs
    shingled = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tok, i, k)),
    )
    return F.when(n > 0, F.array_distinct(shingled)).otherwise(
        F.array().cast("array<string>")
    )


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical (modulo case/whitespace) documents:
    ``(fingerprint, n_docs, canonical_id)`` for groups with >= 2 docs."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one document per fingerprint (lowest id wins) — the
    hash-groupBy exact dedup. One shuffle on the fingerprint."""
    from .relational import top_k_per_group

    with_fp = df.withColumn("fingerprint", fingerprint(text_col))
    return top_k_per_group(
        with_fp, ["fingerprint"], [F.asc(id_col)], k=1
    ).drop("fingerprint")


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, k)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via shingle inverted index.

    ``|A ∩ B|`` comes from the self-join on shingle; ``|A ∪ B|`` =
    |A| + |B| - common. Only pairs sharing >= 1 shingle are ever
    materialized. ``max_df`` drops shingles appearing in more than
    that many documents (stop-shingles produce quadratic candidate
    blowup for near-zero signal — prune before the join).

    Returns ``(doc_a, doc_b, common, size_a, size_b, jaccard)`` with
    ``doc_a < doc_b`` and jaccard rounded to 6.
    """
    sh = _doc_shingles(df, text_col, id_col, k)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "common", "size_a", "size_b", "jaccard")


def minhash_signature(
    text: Column | str, k: int = 3, num_hashes: int = 16
) -> Column:
    """MinHash signature: for seed i, ``min(md5(i || '|' || shingle))``
    over the document's shingle set, as an array of hex strings.

    Lexicographic min over md5 hex is a uniform min-hash; using the hex
    string avoids engine-specific integer narrowing, so an external SQL
    engine reproduces the signature byte-for-byte.
    """
    sh = word_shingles(text, k)
    return F.array(
        *[
            F.array_min(
                F.transform(
                    sh, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s))
                )
            )
            for i in range(num_hashes)
        ]
    )


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: array of ``(band_idx, band_hash)``
    structs where band_hash = md5 of the concatenated band slice. Two
    docs sharing any band hash become a candidate pair."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", F.slice(signature, b * rows_per_band + 1, rows_per_band)
                    )
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-Jaccard verified.

    Pipeline: signature -> band -> explode bands -> self-join on
    ``(band, band_hash)`` (candidate generation — the ONLY join, keyed
    on a hash so it shuffles evenly) -> distinct pairs -> verify with
    exact Jaccard on the shingle sets (the usual LSH false-positive
    filter). At 100 TB the candidate set is ~linear in corpus size for
    sane banding; nothing quadratic exists in the plan.
    """
    rows = num_hashes // num_bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"),
        lsh_bands(
            minhash_signature(text_col, k, num_hashes), num_bands, rows
        ).alias("bands"),
    )
    banded = sigs.select(
        "doc_id", F.explode("bands").alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash"))

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = jaccard_pairs(df, text_col, id_col, k=k, threshold=threshold)
    return candidates.join(verified, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash over whitespace tokens.

    Each token hashes to 32 bits (first 8 hex chars of its md5); bit j
    of the result is the sign of ``sum over tokens of ±1`` at that
    position. Near-duplicates differ in few bits (Hamming distance).
    Pure HOF arithmetic — reproducible in any engine with md5 + bit ops.
    """
    tok = tokens(text)
    hashes = F.transform(
        tok,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
    )
    def bit_sum(j: int) -> Column:
        # closure over j, not a default arg (Spark reads lambda arity)
        def step(acc: Column, v: Column) -> Column:
            return acc + (F.shiftright(v, j).bitwiseAND(F.lit(1)) * 2 - 1)

        return F.aggregate(hashes, F.lit(0).cast("bigint"), step)

    out = F.lit(0).cast("bigint")
    for j in range(32):
        out = out + F.when(bit_sum(j) > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return F.when(F.size(tok) > 0, out).otherwise(F.lit(None).cast("bigint"))
