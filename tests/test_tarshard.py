"""Tar-shard container tier (sparkgraft/tarshard.py): deterministic
build, recovering parse, the Arrow crack pass, the wide pivot, and the
disk sink/source with its manifest commit point."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from sparkgraft import tarshard as TS


SAMPLES = [
    ("000002", [("txt", b"second doc"), ("json", b'{"lang":"en"}')]),
    ("000001", [("txt", b"first doc"), ("json", b'{"lang":"de"}')]),
    ("000003", [("txt", b""), ("json", b"{}")]),
]


def test_build_is_deterministic_and_sorted():
    a = TS.build_tar_shard(SAMPLES)
    b = TS.build_tar_shard(list(reversed(SAMPLES)))
    assert a == b  # sort_keys=True: partition order must not matter
    members, err = TS.parse_tar_shard(a)
    assert err is None
    assert [n for n, _ in members] == [
        "000001.txt",
        "000001.json",
        "000002.txt",
        "000002.json",
        "000003.txt",
        "000003.json",
    ]
    assert dict(members)["000002.txt"] == b"second doc"
    # caller order preserved when asked (curriculum shards)
    c = TS.build_tar_shard(SAMPLES, sort_keys=False)
    names = [n for n, _ in TS.parse_tar_shard(c)[0]]
    assert names[0] == "000002.txt"


def test_build_zeroes_metadata():
    payload = TS.build_tar_shard(SAMPLES)
    import io

    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
        for ti in tf:
            assert (ti.mtime, ti.uid, ti.gid, ti.mode) == (0, 0, 0, 0o644)


def test_build_rejects_bad_keys_and_exts():
    with pytest.raises(ValueError, match="key"):
        TS.build_tar_shard([("a.b", [("txt", b"")])])
    with pytest.raises(ValueError, match="extension"):
        TS.build_tar_shard([("a", [("", b"")])])
    with pytest.raises(ValueError, match="ustar"):
        TS.build_tar_shard([("k" * 99, [("txt", b"")])])


def test_parse_recovers_corrupt_tail():
    samples = [
        ("000001", [("txt", b"first doc")]),
        ("000002", [("txt", b"x" * 3000)]),
    ]
    payload = TS.build_tar_shard(samples)
    # layout: hdr(512)+data(512) for the first member, then hdr(512)
    # + 3000B data for the second — chop 1000 bytes into that data
    cut = payload[: 512 + 512 + 512 + 1000]
    members, err = TS.parse_tar_shard(cut)
    assert err is not None and "truncated" in err
    assert [n for n, _ in members] == ["000001.txt"]
    # garbage is unreadable, empty prefix
    members, err = TS.parse_tar_shard(b"\x01" * 2048)
    assert members == [] and err is not None


def test_split_name_first_dot():
    assert TS._split_name("a/b.seg.json") == ("a/b", "seg.json")
    assert TS._split_name("plain") == ("plain", "")


def test_tar_samples_and_wide(spark):
    payload = TS.build_tar_shard(SAMPLES)
    files = spark.createDataFrame(
        [(7, bytearray(payload)), (8, bytearray(b"not a tar" * 200))],
        "shard_id long, payload binary",
    )
    rows = TS.tar_samples(files).collect()
    good = [r for r in rows if r.tar_error is None]
    bad = [r for r in rows if r.tar_error is not None]
    assert len(good) == 6 and len(bad) == 1
    assert bad[0].shard_id == 8 and bad[0].key is None
    seqs = {
        (r.key, r.sample_seq) for r in good if r.shard_id == 7
    }
    assert seqs == {("000001", 0), ("000002", 1), ("000003", 2)}

    wide = TS.samples_wide(
        TS.tar_samples(files), exts=["txt", "json"]
    ).collect()
    assert len(wide) == 3
    by_key = {r.key: r for r in wide}
    assert bytes(by_key["000002"].txt) == b"second doc"
    assert by_key["000003"].n_members == 2
    assert bytes(by_key["000003"].txt) == b""


def test_tar_samples_noncontiguous_key_stays_two_samples(spark):
    # an illegally split sample must NOT merge across the gap
    samples = [
        ("a", [("txt", b"1")]),
        ("b", [("txt", b"2")]),
        ("a", [("json", b"3")]),
    ]
    payload = TS.build_tar_shard(samples, sort_keys=False)
    files = spark.createDataFrame(
        [(1, bytearray(payload))], "shard_id long, payload binary"
    )
    wide = TS.samples_wide(
        TS.tar_samples(files), exts=["txt", "json"]
    ).collect()
    assert len(wide) == 3
    a_rows = sorted(
        (r for r in wide if r.key == "a"), key=lambda r: r.sample_seq
    )
    assert a_rows[0].txt is not None and a_rows[0].json is None
    assert a_rows[1].txt is None and a_rows[1].json is not None


def test_write_read_roundtrip_with_manifest(spark, tmp_path):
    df = spark.range(40).select(
        F.lpad(F.col("id").cast("string"), 6, "0").alias("key"),
        F.encode(F.concat(F.lit("doc "), F.col("id")), "utf-8").alias("txt"),
        F.encode(F.lit('{"v":1}'), "utf-8").alias("meta"),
    )
    path = str(tmp_path / "corpus")
    manifest = TS.write_tar_shards(
        df, path, "key", [("txt", "txt"), ("meta.json", "meta")], n_shards=4
    )
    assert sum(m["n_samples"] for m in manifest) == 40
    assert {m["shard_id"] for m in manifest} <= set(range(4))
    # no tmp litter; manifest committed last and agrees with the files
    names = sorted(os.listdir(path))
    assert not [n for n in names if n.endswith(".tmp")]
    with open(os.path.join(path, "manifest.json")) as f:
        j = json.load(f)
    for m in j["shards"]:
        with open(os.path.join(path, m["file"]), "rb") as f:
            b = f.read()
        assert hashlib.sha256(b).hexdigest() == m["sha256"]
        assert len(b) == m["n_bytes"]

    back = TS.samples_wide(
        TS.read_tar_shards(spark, path), exts=["txt", "meta.json"]
    )
    out = back.select(
        "key", F.decode("txt", "utf-8").alias("t"), "n_members"
    ).collect()
    assert len(out) == 40
    assert all(r.n_members == 2 for r in out)
    assert {r.t for r in out} == {f"doc {i}" for i in range(40)}


def test_write_is_deterministic_across_reruns(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").cast("string").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
    )
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = TS.write_tar_shards(df, p1, "key", [("txt", "payload")], n_shards=3)
    m2 = TS.write_tar_shards(
        df.repartition(7), p2, "key", [("txt", "payload")], n_shards=3
    )
    assert [
        (m["shard_id"], m["sha256"], m["n_samples"]) for m in m1
    ] == [(m["shard_id"], m["sha256"], m["n_samples"]) for m in m2]


def test_read_verify_dead_letters_drifted_shard(spark, tmp_path):
    df = spark.range(12).select(
        F.col("id").cast("string").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
    )
    path = str(tmp_path / "c")
    manifest = TS.write_tar_shards(
        df, path, "key", [("txt", "payload")], n_shards=2
    )
    victim = manifest[0]
    with open(os.path.join(path, victim["file"]), "r+b") as f:
        f.seek(0)
        f.write(b"\xff")  # flip bytes after commit
    rows = TS.read_tar_shards(spark, path).collect()
    bad = [r for r in rows if r.tar_error == "tar: checksum mismatch"]
    assert len(bad) == 1 and bad[0].shard_id == victim["shard_id"]
    good_keys = {r.key for r in rows if r.tar_error is None}
    assert len(good_keys) == 12 - victim["n_samples"]
    # verify=False scavenges whatever still parses
    rows2 = TS.read_tar_shards(spark, path, verify=False).collect()
    assert len(rows2) >= len(good_keys)


def test_read_refuses_uncommitted_dir(spark, tmp_path):
    path = str(tmp_path / "d")
    os.makedirs(path)
    with open(os.path.join(path, "shard-000000.tar"), "wb") as f:
        f.write(TS.build_tar_shard([("k", [("txt", b"x")])]))
    with pytest.raises(FileNotFoundError, match="manifest"):
        TS.read_tar_shards(spark, path)
    rows = TS.read_tar_shards(spark, path, verify=False).collect()
    assert [r.key for r in rows] == ["k"]


def test_overwrite_retracts_manifest_first(spark, tmp_path):
    df = spark.range(5).select(
        F.col("id").cast("string").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
    )
    path = str(tmp_path / "e")
    TS.write_tar_shards(df, path, "key", [("txt", "payload")], n_shards=1)
    m2 = TS.write_tar_shards(
        df.where(F.col("key") != "3"),
        path,
        "key",
        [("txt", "payload")],
        n_shards=1,
    )
    assert sum(m["n_samples"] for m in m2) == 4
    keys = {
        r.key
        for r in TS.read_tar_shards(spark, path).collect()
        if r.tar_error is None
    }
    assert keys == {"0", "1", "2", "4"}


def test_stream_tar_shards_matches_batch(spark, tmp_path):
    """Streaming ingest parity: the binaryFile STREAM over a shard dir
    (one file per micro-batch) cracks to exactly the batch reader's
    member rows, checksum gate included."""
    df = spark.range(30).select(
        F.lpad(F.col("id").cast("string"), 4, "0").alias("key"),
        F.encode(F.concat(F.lit("doc "), F.col("id")), "utf-8").alias("txt"),
    )
    path = str(tmp_path / "stream")
    manifest = TS.write_tar_shards(df, path, "key", [("txt", "txt")], 4)
    assert len(manifest) >= 2  # parity must span multiple micro-batches
    # corrupt one shard post-commit: the stream must dead-letter it too
    victim = manifest[0]
    with open(os.path.join(path, victim["file"]), "r+b") as f:
        f.write(b"\xff")

    q = (
        TS.stream_tar_shards(spark, path, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("tar_stream_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select shard_id, sample_seq, key, ext, content, tar_error"
        " from tar_stream_parity"
    ).collect()
    want = TS.read_tar_shards(spark, path).collect()

    def canon(rows):
        return sorted(
            (
                r.shard_id,
                r.sample_seq,
                r.key,
                r.ext,
                None if r.content is None else bytes(r.content),
                r.tar_error,
            )
            for r in rows
        )

    assert canon(got) == canon(want)
    assert sum(1 for r in got if r.tar_error == "tar: checksum mismatch") == 1


def test_tar_shards_compose_with_media_tier(spark, tmp_path):
    """The WebDataset use case end to end: image+caption samples
    through tar shards, cracked members feeding perceptual_hash —
    hashes must equal the direct (container-free) path bit for bit."""
    import numpy as np

    from sparkgraft import multimodal as M

    rows = []
    for i in range(6):
        img = (np.arange(64 * 64, dtype=np.uint64) * (i + 3) % 251).astype(
            "uint8"
        ).reshape(64, 64)
        rows.append(
            (
                f"{i:04d}",
                bytearray(M.jpeg_encode_gray(img)),
                bytearray(f"caption {i}".encode()),
            )
        )
    df = spark.createDataFrame(rows, "key string, jpg binary, txt binary")
    path = str(tmp_path / "wds")
    TS.write_tar_shards(df, path, "key", [("jpg", "jpg"), ("txt", "txt")], 2)

    wide = TS.samples_wide(
        TS.read_tar_shards(spark, path), exts=["jpg", "txt"]
    )
    via_tar = M.perceptual_hash(
        wide.select(
            F.col("key").cast("long").alias("media_id"),
            F.col("jpg").alias("payload"),
        )
    )
    direct = M.perceptual_hash(
        df.select(
            F.col("key").cast("long").alias("media_id"),
            F.col("jpg").alias("payload"),
        )
    )
    got = {r.media_id: r.phash for r in via_tar.collect()}
    want = {r.media_id: r.phash for r in direct.collect()}
    assert got == want and len(got) == 6
    # captions ride the same samples
    caps = {
        r.key: bytes(r.txt).decode()
        for r in wide.select("key", "txt").collect()
    }
    assert caps["0003"] == "caption 3"
