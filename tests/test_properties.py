"""Property-based checks (SURVEY §5.4): conformance invariants hold for
arbitrary generated payload corpora, not just the hand-written fixtures.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkgraft import conformance as C

EVENTS = ["a", "b"]
PROPS = ["p", "q", "empty_me"]

payload = st.dictionaries(
    keys=st.sampled_from(PROPS + ["other"]),
    values=st.one_of(
        st.none(), st.just(""), st.text(alphabet="xyz", max_size=3), st.integers(0, 9)
    ),
    max_size=4,
)
row = st.tuples(st.sampled_from(EVENTS), payload)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=0, max_size=25))
def test_conformance_invariants_hold(spark, rows):
    catalog = spark.createDataFrame(
        [(e, json.dumps(p)) for e, p in rows] or [("a", None)],
        "event_name string, props string",
    )
    spec = spark.createDataFrame(
        [(e, p) for e in EVENTS for p in PROPS], "event_name string, prop_name string"
    )
    out = C.verify_events(catalog, spec, payload_cols=["props"]).collect()
    assert len(out) == len(EVENTS) * len(PROPS)  # every spec pair present
    for r in out:
        # FIXTURES.md §3 invariants
        assert r.value_null_count + r.value_not_null_count == r.total_records
        assert r.key_null_count + r.keys_not_null_count == r.total_records
        assert 0 <= r.key_null_count_percentage <= 100
        assert 0 <= r.value_null_count_percentage <= 100
        # a key may exist with an empty/null value, never the reverse
        assert r.keys_not_null_count >= r.value_not_null_count
        assert r.total_records >= 0


# ---- quantization invariants (quantize.py) --------------------------------

vec = st.lists(
    st.floats(
        min_value=-100.0,
        max_value=100.0,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=2,
    max_size=16,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(vec, min_size=1, max_size=8))
def test_quantize_invariants_hold(spark, vecs):
    """For arbitrary float32 vectors: q components stay in [-127, 127],
    round-trip error <= scale/2 per component, and quantized cosine
    against the first vector stays within [-1, 1] (+ float slack)."""
    from pyspark.sql import functions as F

    from sparkgraft import quantize as Qz

    dim = len(vecs[0])
    vecs = [v[:dim] + [0.0] * (dim - len(v)) for v in vecs]  # rectangular
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    probe = F.array(*[F.lit(float(x)) for x in vecs[0]]).cast("array<float>")
    rows = df.select(
        Qz.quantize_int8("embedding").alias("q"),
        F.array_max(
            F.zip_with(
                "embedding",
                Qz.dequantize_int8(Qz.quantize_int8("embedding")),
                lambda a, b: F.abs(a.cast("double") - b.cast("double")),
            )
        ).alias("max_err"),
        Qz.quantized_cosine(
            Qz.quantize_int8("embedding"), Qz.quantize_int8(probe)
        ).alias("qcos"),
    ).collect()
    for r in rows:
        assert all(-127 <= x <= 127 for x in r.q.q)
        assert r.max_err is None or r.max_err <= r.q.scale * 0.5001
        assert r.qcos is None or -1.0000001 <= r.qcos <= 1.0000001


# ---- PII redaction invariants (text.py) -----------------------------------

pii_text = st.text(
    alphabet=st.sampled_from(list("abc@. 0123456789-()+\n")), max_size=60
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(pii_text, min_size=1, max_size=10))
def test_redact_pii_idempotent_and_clean(spark, texts):
    """Redaction is idempotent (a second pass changes nothing) and the
    output never still matches any PII pattern — for adversarial
    digit/at-sign/dash soup, not just well-formed fixtures."""
    from pyspark.sql import functions as F

    from sparkgraft import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = df.select(
        T.redact_pii("text").alias("once"),
        T.redact_pii(T.redact_pii("text")).alias("twice"),
        *[v.alias(k) for k, v in T.pii_counts(T.redact_pii("text")).items()],
    ).collect()
    for r in out:
        assert r.once == r.twice
        for kind in T.PII_PATTERNS:
            assert getattr(r, f"n_{kind}") in (0, None), (kind, r.once)


# ---- semantic-dedup invariants (semdedup.py) ------------------------------

_sd_vec = st.lists(
    st.floats(
        min_value=-10.0,
        max_value=10.0,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=4,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(_sd_vec, min_size=1, max_size=16))
def test_semdedup_matches_numpy_oracle(spark, vecs):
    """For arbitrary small corpora, single-cluster semantic_dedup must
    match a from-scratch numpy reimplementation of the algorithm
    (same float32 ingest, float64 math, rounding and tie rules) on
    every output column."""
    import numpy as np

    from sparkgraft.semdedup import semantic_dedup

    eps, round_to = 0.9, 6
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    out = (
        semantic_dedup(
            df, dim=4, eps=eps, n_clusters=1, sample_size=64, round_to=round_to
        )
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # oracle: identical operation sequence, independent code
    x = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    cent = x.copy()[:1]
    for _ in range(3):  # K=1 Lloyd: centroid converges to the mean
        cent[0] = x.mean(axis=0)
    cnorm = np.linalg.norm(cent, axis=1)
    cn = (cent / np.where(cnorm == 0.0, 1.0, cnorm)[:, None]).T
    xnorm = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.where(xnorm == 0.0, 1.0, xnorm)
    centroid_sim = np.round(xn @ cn, round_to)[:, 0]
    s = np.round(xn @ xn.T, round_to)
    n = len(x)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if s[i, j] >= eps:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    roots = [find(i) for i in range(n)]
    exp_group = [min(j for j in range(n) if roots[j] == roots[i]) for i in range(n)]
    exp_keep = [False] * n
    for r in set(roots):
        members = [i for i in range(n) if roots[i] == r]
        members.sort(key=lambda i: (centroid_sim[i], i))
        exp_keep[members[0]] = True

    assert out["group_id"].tolist() == exp_group
    assert out["keep"].tolist() == exp_keep
    assert out["centroid_sim"].tolist() == centroid_sim.tolist()


# ---- corpus statistics invariants (text.vocabulary / dedup stats) ---------

doc_text = st.text(alphabet="ab c", max_size=30)  # tiny alphabet -> collisions


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(doc_text, min_size=0, max_size=12))
def test_vocabulary_matches_python_counter(spark, texts):
    from collections import Counter

    from sparkgraft.text import vocabulary

    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id long, text string"
    )
    got = {
        r.word: (r.term_freq, r.doc_freq)
        for r in vocabulary(docs, "text", "doc_id").collect()
    }
    tf: Counter = Counter()
    dfq: Counter = Counter()
    for t in texts:
        toks = (t or "").lower().split()
        tf.update(toks)
        dfq.update(set(toks))
    want = {w: (tf[w], dfq[w]) for w in tf}
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(doc_text, min_size=0, max_size=10))
def test_dup_shingle_stats_matches_bruteforce(spark, texts):
    from sparkgraft.dedup import duplicated_shingle_stats

    docs = spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_dup_shingles)
        for r in duplicated_shingle_stats(docs, "text", "doc_id", k=3).collect()
    }

    def shingles(t):
        toks = (t or "").lower().split()
        if not toks:
            return set()
        if len(toks) <= 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    want = {}
    for i, sh in sets.items():
        if not sh:
            continue  # shingle-less docs are absent by contract
        dup = sum(
            1 for s in sh if any(s in other for j, other in sets.items() if j != i)
        )
        want[i] = (len(sh), dup)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
def test_deterministic_shuffle_is_permutation(spark, ids):
    from sparkgraft.packing import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = [r.doc_id for r in deterministic_shuffle(df, "doc_id", "seed", 3).collect()]
    assert sorted(out) == sorted(ids)  # a permutation: nothing lost or dup'd


# ---- as-of join vs naive oracle (relational.as_of_join) -------------------

asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),  # (key, time)
    min_size=1,
    max_size=15,
)
asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
    min_size=0,
    max_size=15,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=asof_left, rrows=asof_right)
def test_as_of_join_matches_naive(spark, lrows, rrows):
    """The union-merge as-of join must equal the naive 'latest right
    row with r.t <= l.t per key' definition on arbitrary generated
    tables — including ties on time (tie-break id wins), duplicate
    left rows, and keys with no right rows at all."""
    from sparkgraft.relational import as_of_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "lid long, k long, lt long"
    )
    right = spark.createDataFrame(
        [(i, k, t, v) for i, (k, t, v) in enumerate(rrows)],
        "rid long, k long, rt long, v long",
    )
    got = {
        r.lid: (r.v, r.rid)
        for r in as_of_join(
            left, right, on="k", left_time="lt", right_time="rt",
            value_cols=["v", "rid"], right_tiebreak="rid",
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [
            (rt, rid, v)
            for rid, (rk, rt, v) in enumerate(rrows)
            if rk == k and rt <= t
        ]
        if cands:
            # latest time wins; ties broken by the HIGHEST tiebreak id
            # (last() over the union-merge ordering), matching the
            # deterministic contract the oracle query relies on
            rt, rid, v = max(cands, key=lambda c: (c[0], c[1]))
            assert got[i] == (v, rid), (i, k, t, cands, got[i])
        else:
            assert got[i] == (None, None)


# ---- sessionize vs naive gap grouping (relational.sessionize) -------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (user, seconds)
        min_size=1,
        max_size=25,
    ),
    gap=st.sampled_from([1, 10, 60]),
)
def test_sessionize_matches_naive(spark, rows, gap):
    """Gap sessionization must equal the naive per-user walk: sort by
    time (event id as the duplicate-timestamp tiebreak) and open a new
    session whenever the gap is exceeded — for arbitrary generated
    event sets and gaps, including duplicate timestamps."""
    import datetime

    from sparkgraft.relational import sessionize

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, u, base + datetime.timedelta(seconds=s))
        for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "eid long, user long, ts timestamp_ntz")
    got = {
        r.eid: (r.user, r.session_id)
        for r in sessionize(
            df, ["user"], "ts", gap_seconds=gap, order_extra=["eid"]
        ).collect()
    }
    # naive walk
    want = {}
    for u in {r[1] for r in data}:
        evs = sorted(
            [(ts, eid) for eid, uu, ts in data if uu == u]
        )
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                sid += 1
            want[eid] = (u, sid)
            prev = ts
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-50, 50)),
        min_size=0,
        max_size=40,
    ),
    cut=st.integers(0, 39),
)
def test_incremental_merge_matches_direct(spark, rows, cut):
    """merge(partial(A), partial(B)) == partial(A u B) for ARBITRARY
    data and an arbitrary split point — the monoid law the incremental
    rollup rests on, checked against a plain Python fold."""
    from sparkgraft.incremental import merge_aggregates, partial_aggregate

    specs = {"n": ("count", None), "s": ("sum", "v"),
             "lo": ("min", "v"), "hi": ("max", "v")}
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        # placeholder row (idx -1) keeps createDataFrame happy on empty
        # draws; the filter removes it before any aggregation
        [(k, float(v), i) for i, (k, v) in enumerate(rows)] or [(0, 0.0, -1)],
        "k long, v double, idx long",
    ).where(F.col("idx") >= 0)
    a = partial_aggregate(df.where(f"idx < {cut}"), ["k"], specs)
    b = partial_aggregate(df.where(f"idx >= {cut}"), ["k"], specs)
    merged = {
        r.k: (r.n, float(r.s), r.lo, r.hi)
        for r in merge_aggregates([a, b], ["k"], specs).collect()
    }
    expect = {}
    for i, (k, v) in enumerate(rows):
        n, s, lo, hi = expect.get(k, (0, 0.0, None, None))
        expect[k] = (
            n + 1,
            s + v,
            v if lo is None else min(lo, v),
            v if hi is None else max(hi, v),
        )
    expect = {
        k: (n, float(s), float(lo), float(hi))
        for k, (n, s, lo, hi) in expect.items()
    }
    assert merged == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),                # user
            st.integers(0, 30),               # ts offset (minutes)
            st.sampled_from(["s1", "s2", "s3", "noise"]),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_funnel_matches_naive_chain_of_mins(spark, rows):
    """funnel_steps' single-fold leftmost match equals the naive
    per-user chain-of-mins walk for arbitrary event streams (including
    duplicate timestamps, missing steps, and interleaved noise)."""
    import datetime

    from sparkgraft.analytics import funnel_steps

    base = datetime.datetime(2024, 1, 1)
    data = [
        (u, base + datetime.timedelta(minutes=m), t) for u, m, t in rows
    ]
    df = spark.createDataFrame(
        data or [(99, base, "noise")],
        "user_id long, ts timestamp_ntz, event_type string",
    )
    steps = ["s1", "s2", "s3"]
    got = {
        r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts, r.converted)
        for r in funnel_steps(df, steps).collect()
    }

    expect = {}
    for u in {u for u, _, _ in data}:
        evs = sorted((ts, t) for uu, ts, t in data if uu == u)
        prev = None
        hits = []
        for step in steps:
            nxt = next(
                (ts for ts, t in evs
                 if t == step and (prev is None or ts > prev)),
                None,
            )
            hits.append(nxt)
            if nxt is None:
                break
            prev = nxt
        while len(hits) < 3:
            hits.append(None)
        if hits[0] is not None:
            expect[u] = (hits[0], hits[1], hits[2], hits[2] is not None)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", max_size=60), min_size=1, max_size=8
    ),
    chunk=st.integers(1, 6),
)
def test_chunking_and_cdc_are_lossless_partitions(spark, texts, chunk):
    """For ARBITRARY texts: disjoint fixed chunks (stride == chunk)
    concatenate back to exactly the token stream, and content-defined
    segments always partition it (no loss, no overlap, order kept)."""
    from sparkgraft.packing import chunk_documents
    from sparkgraft.text import cdc_segments, tokens

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    toks = {
        r.doc_id: list(r.t)
        for r in df.select("doc_id", tokens("text").alias("t")).collect()
    }

    chunks = chunk_documents(df, "text", "doc_id", chunk_tokens=chunk, stride=chunk)
    rebuilt: dict[int, list[str]] = {}
    for r in sorted(chunks.collect(), key=lambda r: (r.doc_id, r.chunk_idx)):
        rebuilt.setdefault(r.doc_id, []).extend(r.chunk_text.split(" "))
    for d, t in toks.items():
        assert rebuilt.get(d, []) == t

    segs = df.select(
        "doc_id", cdc_segments("text", avg_tokens=4).alias("s")
    ).collect()
    for r in segs:
        total = sum(x.n_seg_tokens for x in r.s)
        assert total == len(toks[r.doc_id])
        assert [x.seg_idx for x in r.s] == list(range(len(r.s)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(st.integers(0, 99), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
def test_dedup_spans_matches_python_model(spark, docs):
    """dedup_spans == the obvious single-machine model: segment each
    token list with the same content-defined rule, keep the first
    (doc_id, seg_idx) occurrence of each segment corpus-wide, rejoin.
    Also proves losslessness: when no segment repeats, every rebuilt
    text equals its normalized input."""
    import hashlib

    from sparkgraft import dedup as D

    # doc i draws from vocab band i % 3 so some docs share vocab (and
    # can collide on segments) while others are disjoint
    texts = [
        " ".join(f"w{(i % 3) * 1000 + t}" for t in toks)
        for i, toks in enumerate(docs)
    ]

    def model():
        seen = set()
        out = {}
        for i, text in enumerate(texts):
            toks = text.split() if text else []
            segs, cur = [], []
            for t in toks:
                cur.append(t)
                h = hashlib.md5(t.encode()).hexdigest()
                if int(h[:4], 16) % 8 == 0:
                    segs.append(cur)
                    cur = []
            if cur:
                segs.append(cur)
            kept, n_rm_seg, n_rm_tok = [], 0, 0
            for seg in segs:
                key = hashlib.md5(" ".join(seg).encode()).hexdigest()
                if key in seen:
                    n_rm_seg += 1
                    n_rm_tok += len(seg)
                else:
                    seen.add(key)
                    kept.append(" ".join(seg))
            out[i] = (" ".join(kept), len(segs), n_rm_seg, n_rm_tok)
        return out

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_segs, r.n_segs_removed, r.n_tokens_removed)
        for r in D.dedup_spans(df, "text", "doc_id", avg_tokens=8).collect()
    }
    assert got == model()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 12),                      # key
            st.one_of(st.none(), st.text("ab", max_size=2)),  # payload a
            st.one_of(st.none(), st.integers(0, 3)),          # payload b
        ),
        max_size=15,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 12),
            st.one_of(st.none(), st.text("ab", max_size=2)),
            st.one_of(st.none(), st.integers(0, 3)),
        ),
        max_size=15,
    ),
)
def test_snapshot_diff_inverts_cdc_on_random_tables(spark, old_rows, new_rows):
    """For ANY pair of keyed snapshots (first row per key wins),
    applying the diff-derived change feed to `old` reproduces `new`
    exactly — insert/update/delete classification is total and
    correct, NULLs included."""
    from pyspark.sql import functions as SF

    from sparkgraft.relational import apply_cdc, snapshot_diff

    def dedup_first(rows):
        seen, out = set(), []
        for k, a, b in rows:
            if k not in seen:
                seen.add(k)
                out.append((k, a, b))
        return out

    schema = "k long, a string, b int"
    old = spark.createDataFrame(dedup_first(old_rows) or [(-(10**6), None, None)], schema)
    new = spark.createDataFrame(dedup_first(new_rows) or [(-(10**6) - 1, None, None)], schema)
    changes = (
        snapshot_diff(old, new, ["k"])
        .withColumnRenamed("change_type", "op")
        .withColumn(
            "op",
            SF.when(SF.col("op") == "delete", "D")
            .when(SF.col("op") == "insert", "I")
            .otherwise("U"),
        )
        .join(new, ["k"], "left")
        .withColumn("seq", SF.lit(1))
    )
    rebuilt = apply_cdc(old, changes, "k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9), st.integers(1, 4)),
        min_size=1,
        max_size=20,
    )
)
def test_pagerank_matches_numpy_on_random_graphs(spark, raw_edges):
    """Random small digraphs (self-loops and multi-edges folded):
    distributed PageRank tracks the full-precision numpy twin."""
    import math as _math

    from sparkgraft.graph import pagerank

    from test_graph import numpy_pagerank

    folded = {}
    for u, v, w in raw_edges:
        if u == v:
            continue
        folded[(u, v)] = folded.get((u, v), 0.0) + float(w)
    edges = [(u, v, w) for (u, v), w in folded.items()]
    if not edges:
        edges = [(0, 1, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r.node: r.rank
        for r in pagerank(df, weight_col="w", iters=6).collect()
    }
    want = numpy_pagerank(edges, iters=6)
    assert set(got) == set(want)
    for v in want:
        assert _math.isclose(got[v], want[v], abs_tol=1e-5), (v, got[v], want[v])
    assert _math.isclose(sum(got.values()), 1.0, abs_tol=1e-4)
