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


def test_weighted_exact_k_properties(spark):
    """Exactly k rows, weight-proportional inclusion (a huge-weight row
    is always in, a near-zero-weight row never beats it), zero weights
    never sampled, per-stratum variant sizes every stratum at k, and
    the draw is partitioning-deterministic."""
    from sparkgraft.packing import weighted_sample_exact_k

    rows = [(i, "a" if i % 2 == 0 else "b", 1.0) for i in range(200)]
    rows.append((900, "a", 1e9))   # effectively certain inclusion
    rows.append((901, "b", 0.0))   # never sampled
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")

    top = weighted_sample_exact_k(df, "w", 10)
    got = [r.doc_id for r in top.collect()]
    assert len(got) == 10
    assert 900 in got and 901 not in got

    per = weighted_sample_exact_k(df, "w", 5, strata=["src"])
    by = {}
    for r in per.collect():
        by.setdefault(r.src, []).append(r.doc_id)
    assert sorted(len(v) for v in by.values()) == [5, 5]
    assert 900 in by["a"] and 901 not in by["b"]

    again = [r.doc_id for r in weighted_sample_exact_k(df.repartition(13), "w", 10).collect()]
    assert sorted(got) == sorted(again)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k >= 1"):
        weighted_sample_exact_k(df, "w", 0)


def test_weighted_exact_k_inclusion_tracks_weight(spark):
    """Statistical sanity across many independent seeds: a weight-9
    row should be sampled far more often than a weight-1 row (A-ES
    inclusion probability is proportional to weight for k=1)."""
    from sparkgraft.packing import weighted_sample_exact_k

    df = spark.createDataFrame(
        [(1, 9.0), (2, 1.0)], "doc_id long, w double"
    )
    wins = {1: 0, 2: 0}
    for s in range(40):
        top = weighted_sample_exact_k(df, "w", 1, seed=f"s{s}:").collect()
        wins[top[0].doc_id] += 1
    assert wins[1] > wins[2] * 2  # expected 9:1; 2:1 is a loose floor


def test_quantile_normalize_calibrates_disparate_scales(spark):
    """Property (VERDICT r6 task 7): after normalization, per-source
    quantiles of norm_score agree across sources whose RAW scorers run
    at wildly different scales — that is the operator's entire claim.
    Resolution is one bin width on each axis (source + global), so the
    tolerance is two global bin widths."""
    from sparkgraft.packing import quantile_normalize

    rows = []
    # source A: uniform on [0, 1); source B: same SHAPE on
    # [1000, 11000) — x5000 the scale, offset 1000; source C: uniform
    # but negative, [-50, -40)
    for i in range(200):
        rows.append((3 * i, "a", i / 200.0))
        rows.append((3 * i + 1, "b", 1000.0 + 50.0 * i))
        rows.append((3 * i + 2, "c", -50.0 + i / 20.0))
    df = spark.createDataFrame(rows, "doc_id long, src string, score double")
    bins = 32
    out = quantile_normalize(df, "score", "src", bins=bins).collect()
    ghi = max(r[2] for r in rows)
    glo = min(r[2] for r in rows)
    gwidth = (ghi - glo) / bins
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, []).append(r.norm_score)
    assert all(len(v) == 200 for v in by_src.values())
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        vals = []
        for s in ("a", "b", "c"):
            xs = sorted(by_src[s])
            vals.append(xs[int(q * len(xs))])
        assert max(vals) - min(vals) <= 2 * gwidth, (q, vals, gwidth)
    # and normalized scores live on the GLOBAL domain
    allv = [x for v in by_src.values() for x in v]
    assert glo - gwidth <= min(allv) and max(allv) <= ghi + gwidth


def test_weighted_exact_k_chi_square_inclusion(spark):
    """Statistical gate (VERDICT r6 task 7): for k=1, A-ES inclusion
    probability is exactly weight-proportional; 120 independent seeded
    draws over weights 1:3:6 must pass a chi-square test at p=0.001
    (the draw is deterministic per seed, so this never flakes). Also
    covers the r6 saturation regime: weights in the hundreds — where
    the old 16-bit power key rounded to 1.0 and degraded to
    id-ascending selection — must stay proportional too."""
    from sparkgraft.packing import weighted_sample_exact_k

    def chi2(df, weights, n_seeds):
        wins = {i: 0 for i in weights}
        for s in range(n_seeds):
            top = weighted_sample_exact_k(df, "w", 1, seed=f"cs{s}:").collect()
            wins[top[0].doc_id] += 1
        total_w = sum(weights.values())
        stat = 0.0
        for i, w in weights.items():
            exp = n_seeds * w / total_w
            stat += (wins[i] - exp) ** 2 / exp
        return stat, wins

    small = {1: 1.0, 2: 3.0, 3: 6.0}
    df = spark.createDataFrame(
        [(i, w) for i, w in small.items()], "doc_id long, w double"
    )
    stat, wins = chi2(df, small, 120)
    assert stat < 13.82, (stat, wins)  # chi2(2 dof) at p=0.001

    # saturation regime: same 1:3:6 ratios, x200 magnitude
    big = {1: 200.0, 2: 600.0, 3: 1200.0}
    dfb = spark.createDataFrame(
        [(i, w) for i, w in big.items()], "doc_id long, w double"
    )
    statb, winsb = chi2(dfb, big, 120)
    assert statb < 13.82, (statb, winsb)
    # the high-weight keys must be DISTINCT (no tie collapse to id asc)
    keys = weighted_sample_exact_k(dfb, "w", 3).select("aes_key").collect()
    vals = [r.aes_key for r in keys]
    assert len(set(vals)) == 3, vals
