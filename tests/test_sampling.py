from __future__ import annotations

from sparkgraft.queries.sampling import doc_train_split, stratified_sample_docs

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
