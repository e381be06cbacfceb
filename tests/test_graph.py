from __future__ import annotations

import math

from sparkgraft.graph import degree_stats, pagerank


def numpy_pagerank(edges, damping=0.85, iters=10):
    """Full-precision twin of graph.pagerank's exact update rule."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0.0) + w
    r = [1.0 / n] * n
    d = damping
    for _ in range(iters):
        contrib = [0.0] * n
        for u, v, w in edges:
            contrib[idx[v]] += d * r[idx[u]] * w / outw[u]
        dangling = d * sum(r[idx[u]] for u in nodes if u not in outw)
        r = [(1.0 - d) / n + c + dangling / n for c in contrib]
    return dict(zip(nodes, r))


EDGES = [
    (1, 2, 1.0),
    (1, 3, 1.0),
    (2, 3, 2.0),
    (3, 1, 1.0),
    (4, 3, 1.0),
    (3, 5, 1.0),  # 5 has no out-edges -> dangling mass
]


def test_pagerank_matches_reference_and_sums_to_one(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long, w double")
    got = {
        r.node: r.rank
        for r in pagerank(df, weight_col="w", iters=10).collect()
    }
    want = numpy_pagerank(EDGES, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-6), (v, got[v], want[v])
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-5)
    # the heavily-cited node 3 must outrank everything
    assert got[3] == max(got.values())
    # a pure sink still collects rank; a pure source keeps the floor
    assert got[5] > (1.0 - 0.85) / 5


def test_pagerank_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long, w double")
    a = sorted(map(tuple, pagerank(df, weight_col="w", iters=6).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(
                df.repartition(7, "dst"), weight_col="w", iters=6
            ).collect(),
        )
    )
    assert a == b


def test_pagerank_unweighted_uniform_cycle(spark):
    # symmetric cycle -> uniform ranks exactly
    cyc = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=8).collect()}
    for v in got.values():
        assert math.isclose(v, 1.0 / 3, abs_tol=1e-6)


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long, w double")
    got = {
        r.node: (r.out_degree, r.in_degree) for r in degree_stats(df).collect()
    }
    assert got[1] == (2, 1)
    assert got[3] == (2, 3)
    assert got[5] == (0, 1)
    assert got[4] == (1, 0)


def test_pagerank_tol_early_stop_matches_full_run(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long, w double")
    full = {
        r.node: r.rank
        for r in pagerank(df, weight_col="w", iters=60).collect()
    }
    early = {
        r.node: r.rank
        for r in pagerank(df, weight_col="w", iters=60, tol=1e-9).collect()
    }
    # converged: the early-stopped ranks equal the full run at round-6
    assert early == full
