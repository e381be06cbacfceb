"""Training-batch assembly: packing, mixture epochs, percentile gate.

The packing assignment must be a pure function of (bucket, order,
token counts) — independent of partitioning — and the percentile gate
must agree with the straightforward percent_rank definition it
replaces for scale reasons.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparkgraft import packing as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


def test_pack_contiguous_carves_the_token_stream(spark):
    """One bucket, budget 10: docs of sizes 4,4,5,9,10 laid end-to-end
    start at offsets 0,4,8,13,22 -> (seq 0,0), (0,4), (0,8), (1,3),
    (2,2). Docs span boundaries (concat-then-chunk), they are never
    re-ordered or padded."""
    df = _docs(
        spark, [(1, 4), (2, 4), (3, 5), (4, 9), (5, 10)]
    ).withColumn("bucket", F.lit("00"))
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in P.pack_contiguous(df, "n_tokens", "doc_id", 10).collect()
    }
    assert out == {1: (0, 0), 2: (0, 4), 3: (0, 8), 4: (1, 3), 5: (2, 2)}


def test_pack_contiguous_partitioning_invariant(spark):
    """The assignment is a pure function of the data: any input
    partitioning yields byte-identical packing."""
    rows = [(i, (i * 37) % 23 + 1) for i in range(200)]
    df = _docs(spark, rows).withColumn("bucket", P.hex_bucket("doc_id", 1))
    a = P.pack_contiguous(df, "n_tokens", "doc_id", 64)
    b = P.pack_contiguous(
        df.repartition(7, "n_tokens"), "n_tokens", "doc_id", 64
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_contiguous_offset_arithmetic(spark):
    """seq_id * budget + seq_offset == tokens before the doc, per
    bucket — the invariant that lets a trainer reconstruct the stream."""
    rows = [(i, (i * 13) % 40 + 1) for i in range(300)]
    df = _docs(spark, rows).withColumn("bucket", P.hex_bucket("doc_id", 1))
    packed = P.pack_contiguous(df, "n_tokens", "doc_id", 128)
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    checked = packed.withColumn(
        "__start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    bad = checked.where(
        F.col("seq_id") * 128 + F.col("seq_offset") != F.col("__start")
    )
    assert bad.count() == 0


def test_epoch_replicate_counts_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "src%d" % (i % 4)) for i in range(400)], "doc_id bigint, source string"
    )
    plan = spark.createDataFrame(
        [("src0", 1, "0000"), ("src1", 2, "8000"), ("src2", 1, "ffff")],
        "source string, full_epochs int, extra_thr string",
    )
    out = P.epoch_replicate(docs, "doc_id", "source", plan)
    per_doc = out.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n"), F.max("epoch").alias("mx")
    )
    rows = per_doc.collect()
    # epochs are contiguous 1..n
    assert all(r["n"] == r["mx"] for r in rows)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # src0 pinned to exactly 1 epoch; src2 thr 'ffff' is ~always +1 -> ~2x;
    # src3 absent from the plan -> default 1; src1 = 2 full + ~half extra
    assert by_src["src0"] == 100
    assert by_src["src3"] == 100
    assert 180 <= by_src["src2"] <= 200
    assert 220 <= by_src["src1"] <= 280
    # deterministic: re-running draws the identical fractional set
    again = P.epoch_replicate(docs, "doc_id", "source", plan)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_percentile_keep_matches_percent_rank_definition(spark):
    """The histogram formulation must agree with the naive window:
    frac-strictly-below == (rank-1)/n over (group, score) with ties
    sharing a rank. Checked on data with deliberate ties."""
    rows = [(i, "g%d" % (i % 3), float((i * 7) % 10) / 10.0) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, grp string, score double")
    kept = set(
        r["id"] for r in P.percentile_keep(df, "grp", "score", 0.7).collect()
    )
    # naive reference: rank()-1 counts rows STRICTLY below (ties share
    # a rank), so frac-below = (rank-1)/n — the definition under test
    wr = Window.partitionBy("grp")
    naive = df.withColumn(
        "frac",
        F.round(
            (F.rank().over(wr.orderBy("score")) - 1)
            / F.count(F.lit(1)).over(wr),
            6,
        ),
    )
    expect = set(r["id"] for r in naive.where(F.col("frac") >= 0.7).collect())
    assert kept == expect and len(kept) > 0


def test_percentile_keep_is_tie_inclusive(spark):
    """All rows sharing the threshold-crossing score survive together —
    the gate never splits a tie nondeterministically."""
    rows = [(i, "g", 1.0 if i >= 70 else 0.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, grp string, score double")
    kept = P.percentile_keep(df, "grp", "score", 0.7).collect()
    assert len(kept) == 30 and all(r["score"] == 1.0 for r in kept)


@pytest.mark.parametrize("budget", [1, 7, 2048])
def test_pack_contiguous_budget_edges(spark, budget):
    """Every offset is in [0, budget); docs larger than the budget are
    allowed (they span sequences) and never break the arithmetic."""
    rows = [(i, (i % 5) * budget // 2 + 1) for i in range(50)]
    df = _docs(spark, rows).withColumn("bucket", F.lit("00"))
    packed = P.pack_contiguous(df, "n_tokens", "doc_id", budget).collect()
    assert all(0 <= r["seq_offset"] < budget for r in packed)
    assert len(packed) == 50


def test_deterministic_shuffle_reproducible_and_seed_sensitive(spark, sf_dir):
    from sparkgraft.io import read_table
    from sparkgraft.packing import deterministic_shuffle

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, "doc_id", "epoch1", 4).collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs, "doc_id", "epoch1", 4).collect()]
    c = [r.doc_id for r in deterministic_shuffle(docs, "doc_id", "epoch2", 4).collect()]
    assert a == b                      # same seed -> identical order
    assert sorted(a) == sorted(c)      # same rows...
    assert a != c                      # ...different epoch order
    assert a != sorted(a)              # and it actually shuffled


def test_deterministic_shuffle_is_totally_ordered(spark, sf_dir):
    from sparkgraft.io import read_table
    from sparkgraft.packing import deterministic_shuffle

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out = deterministic_shuffle(docs, "doc_id", "s", 4)
    keys = [r.shuffle_key for r in out.collect()]
    # range partitioning + local sort => collect order is the total order
    assert keys == sorted(keys)


def test_chunk_documents_sliding_window(spark):
    """Chunk boundaries, overlap, short final chunk, and empty-doc
    behavior — plus the zero-shuffle plan (chunking must stay
    row-local at any corpus size)."""
    import pytest as _pytest

    from sparkgraft.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 tokens
            (2, "a b"),                    # shorter than one chunk
            (3, ""),                       # empty -> no chunks
            (4, None),                     # null -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "text", "doc_id", chunk_tokens=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: starts 0, 3, 6 -> [t0..t3], [t3..t6] (overlap t3), [t6]
    assert (1, 0) in rows and rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t3 t4 t5 t6"
    assert rows[(1, 1)].chunk_start == 3
    assert rows[(1, 2)].chunk_text == "t6" and rows[(1, 2)].n_chunk_tokens == 1
    assert rows[(2, 0)].chunk_text == "a b" and rows[(2, 0)].n_chunk_tokens == 2
    assert {d for d, _ in rows} == {1, 2}  # empty/null docs absent

    # row-local: no Exchange in the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with _pytest.raises(ValueError):
        chunk_documents(docs, stride=0)


def test_ntile_by_histogram_deterministic_ties(spark):
    """Equi-depth tiles: ties share a tile (partition-order
    independent, unlike SQL NTILE), depths are balanced up to tie
    granularity, and n=1 puts everything in tile 0."""
    from sparkgraft.packing import ntile_by_histogram

    rows = [("g", float(i // 2)) for i in range(20)]  # scores 0..9, x2 each
    df = spark.createDataFrame(rows, "grp string, score double")
    out = ntile_by_histogram(df, "grp", "score", n=10)
    got = {(r.score, r.tile) for r in out.collect()}
    # score s (2 rows) has 2s rows strictly below of 20 -> tile s
    assert got == {(float(s), s) for s in range(10)}
    # every tile holds exactly its tied pair
    counts = out.groupBy("tile").count().collect()
    assert all(r["count"] == 2 for r in counts)

    assert (
        ntile_by_histogram(df, "grp", "score", n=1)
        .select(F.max("tile")).first()[0] == 0
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ntile_by_histogram(df, "grp", "score", n=0)


def test_winsorize_clamps_to_group_quantiles(spark):
    """Winsorize: values clamp to the group's [p-lo, p-hi] bounds
    (inclusive-cumulative-share quantiles — actual data values, no
    interpolation); interior values pass through; groups are
    independent."""
    import pytest as _pytest

    from sparkgraft.packing import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 500.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {
        (r.grp, r.v): r.v_w
        for r in winsorize(df, "grp", "v", lo_frac=0.10, hi_frac=0.90).collect()
    }
    # group a: p10 = 10 (share 0.10), p90 = 90 (share 0.90)
    assert out[("a", 1.0)] == 10.0
    assert out[("a", 9.0)] == 10.0
    assert out[("a", 50.0)] == 50.0
    assert out[("a", 91.0)] == 90.0
    assert out[("a", 100.0)] == 90.0
    # group b: with 2 values, p10 bound = 5 (share 0.5 >= 0.1),
    # p90 bound = 500 (share 1.0 >= 0.9) -> both survive unclamped
    assert out[("b", 5.0)] == 5.0
    assert out[("b", 500.0)] == 500.0

    with _pytest.raises(ValueError):
        winsorize(df, "grp", "v", lo_frac=0.9, hi_frac=0.1)


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """The leakage invariant: exact duplicates (modulo case/whitespace)
    always share a split; distinct texts bucket independently; all
    three splits are reachable."""
    from sparkgraft.packing import leakage_safe_split

    rows = []
    # 40 distinct texts, each duplicated at 3 ids (one case-mangled,
    # one whitespace-mangled) spread far apart in id space
    for i in range(40):
        rows.append((i, f"alpha beta gamma {i}"))
        rows.append((1000 + i, f"Alpha  Beta   GAMMA {i}"))
        rows.append((2000 + i, f"alpha beta gamma {i} "))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).toPandas()
    assert len(out) == 120
    by_cluster = out.groupby("cluster_id")["split"].nunique()
    assert (by_cluster == 1).all()
    # each trio resolved to the min id as canonical
    for i in range(40):
        sub = out[out.doc_id.isin([i, 1000 + i, 2000 + i])]
        assert set(sub.cluster_id) == {i}
    assert set(out.split) <= {"train", "val", "test"}
    assert out.split.nunique() >= 2  # thresholds actually partition


def test_domain_temperature_weights_numpy_twin(spark, sf_dir):
    import numpy as np

    from sparkgraft.queries.packing import domain_temperature_weights

    rows = domain_temperature_weights(spark, sf_dir).collect()
    n_tok = np.array([r.n_tokens for r in rows], dtype=np.float64)
    p = n_tok / n_tok.sum()
    pa = p**0.7
    w = pa / pa.sum()
    for i, r in enumerate(rows):
        assert r.p_raw == round(float(p[i]), 6)
        assert r.w_temp == round(float(w[i]), 6)
        assert r.boost == round(float(w[i] / p[i]), 6)
    # temperature flattens: every under-represented domain is boosted,
    # every over-represented one damped, and weights still sum to 1
    assert abs(sum(r.w_temp for r in rows) - 1.0) < 1e-5
    mean_p = 1.0 / len(rows)
    for i, r in enumerate(rows):
        if p[i] < mean_p * 0.8:
            assert r.boost > 1.0
        elif p[i] > mean_p * 1.25:
            assert r.boost < 1.0


def test_temperature_resampled_docs_up_and_down_paths(spark, tmp_path):
    """Skewed fixture: the dominant source lands r < 1 (hash-thinned to
    a single fractional epoch) while the tail source lands r > 1 (full
    replication + fractional extra) — and the realized rows match an
    exact hashlib recomputation of the md5 draw."""
    import hashlib
    import math

    rows = [(i, "tok " * 50, "en", "big", 200) for i in range(8)]
    rows += [(100 + i, "tok tok tok tok tok", "en", "small", 19) for i in range(2)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(path + "/documents.parquet")
    from sparkgraft.queries.packing import temperature_resampled_docs

    out = temperature_resampled_docs(spark, path).collect()
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1

    # exact twin of the rate arithmetic
    n_tok = {"big": 8 * 50, "small": 2 * 5}
    total = sum(n_tok.values())
    pa = {s: (n / total) ** 0.7 for s, n in n_tok.items()}
    w6 = {s: round(pa[s] / sum(pa.values()), 6) for s in pa}
    rate = {s: w6[s] * total / n_tok[s] for s in n_tok}
    assert rate["big"] < 1 < rate["small"]
    for doc_id, _, _, src, _ in [(r[0], 0, 0, r[3], 0) for r in rows]:
        full = math.floor(rate[src])
        thr = math.floor((rate[src] - full) * 65536)
        bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        expected = full + (1 if bucket < thr else 0)
        assert per_doc.get(doc_id, 0) == expected, (doc_id, src)
    # replication realized: every small doc >= 2 epochs, big docs <= 1
    assert all(per_doc.get(100 + i, 0) >= 2 for i in range(2))
    assert all(per_doc.get(i, 0) <= 1 for i in range(8))


def test_quantile_normalize_calibrates_across_scales(spark):
    """Two sources scoring the same underlying ranks on wildly
    different scales must land on comparable normalized scores; NULLs
    pass through; deterministic under repartitioning."""
    from sparkgraft.packing import quantile_normalize

    rows = []
    for i in range(100):
        rows.append((i, "small", float(i)))            # scores 0..99
        rows.append((1000 + i, "big", 1000.0 + 10 * i))  # scores 1000..1990
    rows.append((5000, "small", None))
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = quantile_normalize(df, "score", "source", bins=40)
    got = {r.doc_id: r.norm_score for r in out.collect()}
    assert got[5000] is None
    # same within-source rank -> normalized scores within one global bin
    # width ((1990-0)/40 = 49.75) of each other, despite the 10x scale
    for i in (10, 50, 90):
        assert abs(got[i] - got[1000 + i]) <= 49.75 + 1e-9, (i, got[i], got[1000 + i])
    # normalized scores are monotone in the original within-source rank
    small = [got[i] for i in range(0, 100, 7)]
    assert small == sorted(small)
    again = {
        r.doc_id: r.norm_score
        for r in quantile_normalize(
            df.repartition(9), "score", "source", bins=40
        ).collect()
    }
    assert again == got

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bins"):
        quantile_normalize(df, "score", "source", bins=0)


def test_bin_pack_documents_invariants(spark):
    """FFD whole-document packing: every bin's fill equals the sum of
    its members and never exceeds the budget; over-budget docs
    dead-letter (overflow, NULL bin); per-shard bin count respects
    FFD's 11/9 OPT + 1 guarantee against the token-mass lower bound;
    and the assignment is partitioning-independent."""
    import math

    from sparkgraft.packing import bin_pack_documents

    rows = [(i, 1 + (i * 37) % 900) for i in range(400)]
    rows += [(1000, 5000), (1001, 1024)]  # one overflow, one exact-fit
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = bin_pack_documents(df, "n_tokens", budget=1024).collect()
    assert len(out) == len(rows)
    by_id = {r.doc_id: r for r in out}
    assert by_id[1000].overflow and by_id[1000].bin_id is None
    assert not by_id[1001].overflow and by_id[1001].bin_fill == 1024

    bins: dict[int, list] = {}
    for r in out:
        if r.overflow:
            continue
        bins.setdefault(r.bin_id, []).append(r)
    for bid, members in bins.items():
        total = sum(m.n_tokens for m in members)
        assert total <= 1024, (bid, total)
        assert all(m.bin_fill == total for m in members)
        assert len({m.shard for m in members}) == 1  # bins never span shards

    # FFD guarantee per shard vs the token-mass lower bound
    shards: dict[int, list] = {}
    for r in out:
        if not r.overflow:
            shards.setdefault(r.shard, []).append(r)
    for sh, members in shards.items():
        n_bins = len({m.bin_id for m in members})
        lb = math.ceil(sum(m.n_tokens for m in members) / 1024)
        assert n_bins <= math.ceil(11 / 9 * lb) + 1, (sh, n_bins, lb)

    # partitioning independence
    again = bin_pack_documents(
        df.repartition(13), "n_tokens", budget=1024
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        bin_pack_documents(df, "n_tokens", budget=0)


def test_bin_pack_documents_null_rows_dead_letter(spark):
    """NULL id / NULL token-count rows dead-letter (overflow=true,
    bin_id NULL) instead of crashing the packing loop (ADVICE r8: a
    NULL token count became NaN in the applyInPandas batch and int(n)
    raised; a NULL id produced a NULL shard and the shard read raised)
    — and their presence must not perturb the good rows' assignment."""
    from sparkgraft.packing import bin_pack_documents

    good = [(i, 1 + (i * 37) % 900) for i in range(50)]
    df_clean = spark.createDataFrame(good, "doc_id long, n_tokens long")
    df_dirty = spark.createDataFrame(
        good + [(None, 123), (7000, None), (None, None)],
        "doc_id long, n_tokens long",
    )
    clean = sorted(
        map(tuple, bin_pack_documents(df_clean, "n_tokens", budget=1024).collect())
    )
    out = bin_pack_documents(df_dirty, "n_tokens", budget=1024).collect()
    dead = [r for r in out if r.doc_id is None or r.n_tokens is None]
    assert len(dead) == 3
    for r in dead:
        assert r.overflow and r.bin_id is None and r.bin_fill is None
        assert r.shard is None
    survivors = sorted(
        map(tuple, (r for r in out if r.doc_id is not None and r.n_tokens is not None))
    )
    assert survivors == clean


def test_auto_shard_width_guidance_rule(spark):
    """r10: the r9 FFD probe's docs-per-shard guidance as the default
    — shard_width=None sizes 16**width shards to keep expected
    occupancy <= ~10k docs; no hint -> the pre-r10 width 2; explicit
    widths pass through."""
    from sparkgraft.packing import auto_shard_width, bin_pack_documents

    assert auto_shard_width(0) == 2          # no hint: old default
    assert auto_shard_width(-1) == 2
    assert auto_shard_width(5_000) == 1      # 16 shards cover it
    assert auto_shard_width(100_000) == 1    # 6.3k/shard <= 10k
    assert auto_shard_width(1_000_000) == 2  # 256 shards -> 3.9k/shard
    # 50M/10k = 5000 shards needed -> log16(5000) = 3.07 -> width 4
    assert auto_shard_width(50_000_000) == 4
    widths = [auto_shard_width(10**e) for e in range(3, 12)]
    assert widths == sorted(widths)          # monotone
    assert auto_shard_width(10**14) == 8     # ceiling binds

    # wired: hint-sized packing still satisfies every invariant
    rows = [(i, 100 + (i % 7) * 50) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = bin_pack_documents(df, "n_tokens", budget=1024, approx_rows=500)
    got = out.collect()
    assert len(got) == 500
    assert all(not r.overflow for r in got)
    # width 1 -> shards in [0, 16)
    assert {r.shard for r in got} <= set(range(16))
