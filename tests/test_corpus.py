"""Corpus-statistics tier: vocabulary building, corpus-level
duplicated-n-gram stats, and the docs<->embeddings cross-modal profile
(queries/corpus.py). Hand-computed fixtures verify the math; the
oracle twins verify the same queries against DuckDB at driver scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkgraft import dedup as D
from sparkgraft import queries as Q
from sparkgraft import text as T


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),  # exact dup of 1
            (3, "a dog ran through the park"),  # unique
            (4, "THE  cat   sat somewhere else"),  # shares 'the cat sat'
            (5, ""),  # empty: no tokens, no shingles
            (6, None),  # NULL text
        ],
        "doc_id long, text string",
    )


def test_vocabulary_counts(spark, docs):
    rows = {
        r.word: (r.term_freq, r.doc_freq)
        for r in T.vocabulary(docs, "text", "doc_id").collect()
    }
    # 'the': docs 1,2 twice each + docs 3,4 once each = 6 occurrences, 4 docs
    assert rows["the"] == (6, 4)
    assert rows["cat"] == (3, 3)
    assert rows["park"] == (1, 1)
    # empty/NULL docs contribute nothing, and no empty-string token leaks
    assert "" not in rows


def test_vocabulary_normalizes_case_and_whitespace(spark, docs):
    rows = {r.word for r in T.vocabulary(docs, "text", "doc_id").collect()}
    assert "THE" not in rows and "the" in rows


def test_dup_ngram_stats_planted(spark, docs):
    out = {
        r.doc_id: r
        for r in D.duplicated_shingle_stats(docs, "text", "doc_id", k=3).collect()
    }
    # docs 1 and 2 are identical: every shingle duplicated
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[1].n_shingles == 4  # 6 tokens -> 4 distinct 3-shingles
    # doc 3 shares nothing ('the' alone is not a 3-shingle)
    assert out[3].dup_frac == 0.0
    # doc 4 shares exactly 'the cat sat' out of its 3 shingles
    assert out[4].n_shingles == 3
    assert out[4].n_dup_shingles == 1
    assert out[4].dup_frac == pytest.approx(round(1 / 3, 6))
    # empty and NULL docs are absent (no shingles)
    assert 5 not in out and 6 not in out


def test_dup_ngram_fraction_bounds(spark, docs):
    out = D.duplicated_shingle_stats(docs, "text", "doc_id", k=3)
    bad = out.where(
        (F.col("dup_frac") < 0)
        | (F.col("dup_frac") > 1)
        | (F.col("n_dup_shingles") > F.col("n_shingles"))
    )
    assert bad.count() == 0


def test_doc_embedding_profile_hand_computed(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "aa", "en", "s1", 10), (2, "bb", "en", "s1", 20), (3, "cc", "en", "s2", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    emb = spark.createDataFrame(
        [(1, [0.5, -0.5], 0), (2, [1.0, 2.0], 0), (3, None, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path)
    docs.write.parquet(d + "/documents.parquet")
    emb.write.parquet(d + "/embeddings.parquet")
    rows = {
        (r.source, r.label): r
        for r in Q.RETIRED_QUERIES["doc_embedding_profile"](spark, d).collect()
    }
    s1 = rows[("s1", 0)]
    assert (s1.n_docs, s1.sum_chars, s1.avg_chars, s1.sum_pos_dims) == (2, 30, 15.0, 3)
    s2 = rows[("s2", 1)]  # NULL embedding -> 0 positive dims, row kept
    assert (s2.n_docs, s2.sum_chars, s2.sum_pos_dims) == (1, 7, 0)


def test_vocab_topk_deterministic_boundary(spark, sf_dir):
    # the (term_freq DESC, word ASC) key is unique per row, so two runs
    # produce the identical ordered set even at the LIMIT boundary
    a = [tuple(r) for r in Q.QUERIES["corpus_vocab_topk"](spark, sf_dir).collect()]
    b = [tuple(r) for r in Q.QUERIES["corpus_vocab_topk"](spark, sf_dir).collect()]
    assert a == b
    freqs = [r[1] for r in a]
    assert freqs == sorted(freqs, reverse=True)


def test_heavy_hitters_equal_full_aggregation(spark, sf_dir):
    """The two-pass heavy-hitters answer must EQUAL the full-vocabulary
    aggregation filtered at the same threshold — the MG pass may only
    bound memory, never lose a true heavy hitter."""
    from sparkgraft.io import read_table
    from sparkgraft.text import heavy_hitter_words, vocabulary

    docs = read_table(spark, sf_dir, "documents")
    share = 0.01
    got = {
        (r.word, r.term_freq)
        for r in heavy_hitter_words(docs, "text", min_share=share).collect()
    }
    vocab = vocabulary(docs, "text", "doc_id").collect()
    n = sum(r.term_freq for r in vocab)
    want = {
        (r.word, r.term_freq) for r in vocab if r.term_freq >= n * share
    }
    assert got == want and got


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    """Even a pathologically small MG capacity (heavy eviction churn)
    must keep every true heavy hitter via the pigeonhole guarantee +
    exact second pass."""
    from sparkgraft.text import heavy_hitter_words

    rows = [(i, "common " * 5 + f"rare{i}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.word: r for r in heavy_hitter_words(
        docs, "text", min_share=0.2, candidate_factor=1).collect()}
    assert "common" in out
    assert out["common"].term_freq == 1000
    assert all(not w.startswith("rare") for w in out)
