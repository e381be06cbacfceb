"""SemDeDup (semantic dedup over embeddings): planted-duplicate recall,
the keep-the-least-central rule, soundness under clustering, shard
backstop, zero-vector handling, and determinism.

The registered query is rows-only (a trained k-means quantizer has no
engine-independent SQL twin), so these tests carry the correctness
burden the oracle carries elsewhere.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkgraft.io import read_table
from sparkgraft.semdedup import semantic_dedup

DIM = 16


def _planted_corpus(spark, n_groups=3, group_size=4, n_singletons=8):
    """Duplicate groups of near-identical vectors plus well-separated
    singletons. Members of a group have pairwise cosine >= 0.999;
    cross-group / singleton cosines stay far below 0.9 (random
    directions in d=16, checked at build time so the test can't go
    flaky on an unlucky seed)."""
    rng = np.random.RandomState(7)
    vecs: list[np.ndarray] = []
    group_of: list[int] = []
    for g in range(n_groups):
        base = rng.randn(DIM)
        base /= np.linalg.norm(base)
        for m in range(group_size):
            noise = rng.randn(DIM) * 0.005
            vecs.append(base + noise)
            group_of.append(g)
    for s in range(n_singletons):
        v = rng.randn(DIM)
        vecs.append(v / np.linalg.norm(v))
        group_of.append(-1)
    x = np.stack(vecs)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = xn @ xn.T
    same = np.equal.outer(group_of, group_of) & (np.array(group_of) >= 0)[:, None]
    off = ~np.eye(len(x), dtype=bool)
    assert cos[same & off].min() >= 0.999
    assert cos[~same & off].max() < 0.9, "unlucky seed: separation broken"
    rows = [
        (i, [float(v) for v in x[i]], group_of[i]) for i in range(len(x))
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, true_group int"
    )
    return df, group_of


def test_planted_groups_exact_recall(spark):
    """n_clusters=1 removes the clustering approximation: every planted
    group must collapse to one kept exemplar, every singleton must
    survive, and nothing else may be dropped."""
    df, group_of = _planted_corpus(spark)
    out = semantic_dedup(
        df, dim=DIM, eps=0.95, n_clusters=1, sample_size=1024
    ).toPandas().set_index("vec_id").sort_index()

    truth = {i: g for i, g in enumerate(group_of)}
    for g in set(group_of):
        members = [i for i, gg in truth.items() if gg == g]
        if g == -1:
            for i in members:
                assert out.loc[i, "keep"], f"singleton {i} dropped"
                assert out.loc[i, "group_id"] == i
        else:
            kept = [i for i in members if out.loc[i, "keep"]]
            assert len(kept) == 1, f"group {g}: kept {kept}"
            gids = {out.loc[i, "group_id"] for i in members}
            assert gids == {min(members)}, f"group {g}: group_ids {gids}"


def test_keep_rule_least_central(spark):
    """Within every duplicate group the kept member is the argmin of
    (centroid_sim, vec_id) — the paper's keep-the-outlier rule, checked
    self-consistently from the output columns."""
    df, _ = _planted_corpus(spark)
    out = semantic_dedup(
        df, dim=DIM, eps=0.95, n_clusters=1, sample_size=1024
    ).toPandas()
    for gid, grp in out.groupby("group_id"):
        kept = grp[grp["keep"]]
        assert len(kept) == 1
        best = grp.sort_values(["centroid_sim", "vec_id"]).iloc[0]
        assert kept.iloc[0]["vec_id"] == best["vec_id"], (
            f"group {gid}: kept {kept.iloc[0]['vec_id']}, "
            f"least-central is {best['vec_id']}"
        )


def test_soundness_under_clustering(spark, sf_dir):
    """With real clustering (K>1) the method may MISS cross-cluster
    duplicates (the published approximation) but must never invent one:
    every dropped row needs a same-cluster partner at cosine >= eps,
    every same-cluster pair at >= eps must share a group_id, and
    exactly one member per group is kept."""
    eps = 0.4
    emb = read_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, dim=64, eps=eps, n_clusters=8).toPandas()
    src = emb.select("vec_id", "embedding").toPandas()
    vec = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in src.itertuples()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return round(float(a @ b / (na * nb)), 6) if na and nb else 0.0

    by_cid = out.groupby("cid")
    for cid, grp in by_cid:
        ids = grp["vec_id"].tolist()
        gid = dict(zip(grp["vec_id"], grp["group_id"]))
        kept = dict(zip(grp["vec_id"], grp["keep"]))
        # completeness within the cluster + group consistency
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if cos(vec[a], vec[b]) >= eps:
                    assert gid[a] == gid[b], (cid, a, b)
        # soundness: dropped rows have a within-cluster dup partner
        for a in ids:
            if not kept[a]:
                assert any(
                    b != a and cos(vec[a], vec[b]) >= eps
                    for b in ids
                    if gid[b] == gid[a]
                ), f"row {a} dropped without a dup partner"
    # exactly one survivor per duplicate group
    per_group = out.groupby(["cid", "group_id"])["keep"].sum()
    assert (per_group == 1).all()


def test_max_cluster_shard_backstop(spark, sf_dir):
    """The skew backstop sub-shards oversized clusters: row count and
    the one-kept-per-group invariant must hold, and splitting can only
    KEEP more (pairs across shards are deliberately missed)."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = semantic_dedup(emb, dim=64, eps=0.4, n_clusters=8).toPandas()
    sharded = semantic_dedup(
        emb, dim=64, eps=0.4, n_clusters=8, max_cluster=16
    ).toPandas()
    assert len(sharded) == len(base)
    assert sharded["keep"].sum() >= base["keep"].sum()
    per_group = sharded.groupby(["cid", "group_id"])["keep"].sum()
    assert (per_group == 1).all()


def test_zero_vector_is_kept(spark):
    rows = [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1)),
            (2, [1.0] + [0.0] * (DIM - 1))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = (
        semantic_dedup(df, dim=DIM, eps=0.95, n_clusters=1, sample_size=16)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert bool(out.loc[0, "keep"])  # cos(0, anything) = 0: no dup edge
    assert out.loc[0, "centroid_sim"] == 0.0
    assert int(out.loc[1, "keep"]) + int(out.loc[2, "keep"]) == 1


def test_deterministic_across_runs(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")

    def run():
        return (
            semantic_dedup(emb, dim=64, eps=0.4, n_clusters=16)
            .orderBy("vec_id")
            .collect()
        )

    assert run() == run()


def test_rejects_empty_corpus(spark):
    df = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        semantic_dedup(df, dim=DIM).collect()


def test_auto_n_clusters_scale_rule():
    from sparkgraft.semdedup import auto_n_clusters

    # the paper regime: ~target_cluster rows per cluster
    assert auto_n_clusters(200_000_000, target_cluster=2000) == 100_000
    assert auto_n_clusters(10_000, target_cluster=2000) == 5
    # floors and caps
    assert auto_n_clusters(0) == 4
    assert auto_n_clusters(500) == 4          # tiny corpus -> floor
    assert auto_n_clusters(10**13) == 1_000_000  # broadcast cap
    # monotone in corpus size
    sizes = [10**3, 10**5, 10**7, 10**9]
    ks = [auto_n_clusters(n) for n in sizes]
    assert ks == sorted(ks)


def test_semantic_dedup_auto_sizes_from_hint(spark, sf_dir):
    """r10: n_clusters=None sizes K from the approx_rows hint via
    auto_n_clusters (the IVF-tier default convention); without a hint
    the pre-r10 16 applies, and explicit ints stay the escape hatch
    the registered queries pin."""
    from sparkgraft.semdedup import auto_n_clusters, semantic_dedup

    emb = read_table(spark, sf_dir, "embeddings")

    # hint-sized: 20k rows / 2000 target -> 10 clusters
    assert auto_n_clusters(20_000) == 10
    out = semantic_dedup(emb, dim=64, eps=0.4, approx_rows=20_000)
    cids = {r.cid for r in out.select("cid").distinct().collect()}
    assert cids <= set(range(10)) and len(cids) > 1

    # no hint: the 16-cluster pre-r10 default
    base = semantic_dedup(emb, dim=64, eps=0.4)
    assert {r.cid for r in base.select("cid").distinct().collect()} <= set(
        range(16)
    )
