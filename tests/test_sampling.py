from __future__ import annotations

from sparkgraft.queries.sampling import (
    doc_train_split,
    stratified_sample_docs,
    weighted_sample_docs,
)

SF = "/root/testdata/sf0.001"


def test_sample_is_deterministic_and_stratified(spark):
    a = {r.doc_id for r in stratified_sample_docs(spark, SF).collect()}
    b = {r.doc_id for r in stratified_sample_docs(spark, SF).collect()}
    assert a == b and a  # same draw every run, non-empty
    rows = stratified_sample_docs(spark, SF).collect()
    assert all(r.bucket < r.thr for r in rows)


def test_split_covers_corpus_near_ratios(spark):
    rows = doc_train_split(spark, SF).collect()
    n = len(rows)
    by = {s: sum(1 for r in rows if r.split == s) for s in ("train", "val", "test")}
    assert sum(by.values()) == n  # total partition, no doc dropped
    assert 0.7 < by["train"] / n < 0.9  # ~80/10/10 within binomial noise
    assert by["val"] > 0 and by["test"] > 0


def test_weighted_sample_deterministic_and_bounded(spark):
    a = {r.doc_id for r in weighted_sample_docs(spark, SF).collect()}
    b = {r.doc_id for r in weighted_sample_docs(spark, SF).collect()}
    assert a == b and a
    rows = weighted_sample_docs(spark, SF).collect()
    # the keep predicate held for every emitted row
    assert all(r.bucket < min(1.0, r.n_chars / 500.0) * 65536.0 for r in rows)
    assert all(0.0 < r.weight <= 1.0 for r in rows)


def test_weighted_sample_upweights_long_docs(spark):
    from sparkgraft.io import read_table

    docs = read_table(spark, SF, "documents")
    kept = weighted_sample_docs(spark, SF)
    short_total = docs.where("n_chars < 250").count()
    long_total = docs.where("n_chars >= 400").count()
    short_kept = kept.where("n_chars < 250").count()
    long_kept = kept.where("n_chars >= 400").count()
    if short_total and long_total:
        # docs at/above 400 chars have keep prob >= 0.8; short docs < 0.5
        assert long_kept / long_total > short_kept / short_total


def test_weighted_draw_independent_of_split(spark):
    # the 'w:' salt decorrelates the sampler from the split assignment:
    # the drawn set's split mix should mirror the corpus's, not skew
    kept = {r.doc_id for r in weighted_sample_docs(spark, SF).collect()}
    split = {r.doc_id: r.split for r in doc_train_split(spark, SF).collect()}
    kept_train = sum(1 for d in kept if split[d] == "train")
    # train is ~80% of the corpus; the drawn subset stays in that band
    assert 0.6 < kept_train / len(kept) < 0.95
