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


def test_pagerank_zero_weight_source_is_dangling(spark):
    """ADVICE r5: a node whose out-weights sum to 0 must count as
    DANGLING (its mass redistributes) rather than dividing by
    __ow = 0 and silently dropping rank mass. Ranks still sum to 1,
    and the result equals the same graph with the zero edge removed."""
    edges = [(1, 2, 1.0), (2, 1, 1.0), (3, 1, 0.0)]  # 3: zero out-weight
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r.node: r.rank for r in pagerank(df, weight_col="w", iters=8).collect()}
    assert set(got) == {1, 2, 3}
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)
    # same update rule as numpy twin with node 3 dangling
    want = numpy_pagerank([(1, 2, 1.0), (2, 1, 1.0)] , iters=8)
    # numpy twin lacks node 3; rebuild with it present but edge-less:
    # emulate by adding 3 to the node set via a self-describing run
    n = 3
    r = {1: 1 / n, 2: 1 / n, 3: 1 / n}
    d = 0.85
    for _ in range(8):
        dang = d * r[3]
        r = {
            1: (1 - d) / n + d * r[2] + dang / n,
            2: (1 - d) / n + d * r[1] + dang / n,
            3: (1 - d) / n + dang / n,
        }
    for k in (1, 2, 3):
        assert math.isclose(got[k], r[k], abs_tol=5e-6), (k, got[k], r[k])


def test_degree_stats_drops_null_endpoint_edges(spark):
    """ADVICE r5: degree_stats applies the same NULL-endpoint edge
    filter as pagerank — no NULL node row in the profile."""
    df = spark.createDataFrame(
        [(1, 2), (None, 2), (1, None)], "src long, dst long"
    )
    rows = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(df).collect()}
    assert None not in rows
    assert rows == {1: (1, 0), 2: (0, 1)}


def test_triangle_count_k4_plus_star(spark):
    """K4: every node sits in C(3,2)=3 triangles. A star hub (no
    spoke-spoke edges) has none, so star nodes are absent. Dirty
    input — self-loops, NULL endpoints, parallel/reversed duplicates —
    must not change the counts."""
    from sparkgraft.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    star = [(10, s) for s in range(11, 16)]
    dirty = [(1, 1), (None, 2), (3, None), (2, 1), (1, 2)]
    df = spark.createDataFrame(k4 + star + dirty, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_orientation_matches_naive(spark):
    """The degree-oriented wedge join equals the naive unordered
    enumeration on a skewed graph (one hub of degree n joined to a
    chain): per-node counts from first principles."""
    from sparkgraft.graph import triangle_count

    # hub 0 connected to 1..12; chain 1-2-3-...-12: triangle (0,i,i+1)
    edges = [(0, i) for i in range(1, 13)] + [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    naive = {}
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in edges for n in e})
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            for c_ in nodes:
                if c_ <= b:
                    continue
                if ((a, b) in es and (a, c_) in es and (b, c_) in es):
                    for n in (a, b, c_):
                        naive[n] = naive.get(n, 0) + 1
    assert got == naive
