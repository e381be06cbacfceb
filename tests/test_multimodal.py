from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkgraft import multimodal as M


@pytest.fixture()
def media(spark):
    rows = [
        (1, bytearray(b"\x00\x01\x02\x03" * 16)),
        (2, bytearray(b"\xff" * 8)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, raw binary")
    return M.attach_media_metadata(df, "raw", modality="image", format="fake", id_col="id")


def test_attach_media_metadata(media):
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].n_bytes == 64 and rows[1].modality == "image"
    assert rows[3].n_bytes is None


def test_extract_features_batched(media):
    out = {r.media_id: r for r in M.extract_features(media).collect()}
    assert out[1].feat_n_bytes == 64
    assert out[1].feat_mean_byte == pytest.approx(1.5)
    assert out[2].feat_first_byte == 255
    # decode failure -> NULL features, row survives (dead-letter, not crash)
    assert out[3].feat_n_bytes is None


def test_sample_frames_declarative(media):
    out = M.sample_frames(media.where(F.col("media_id") == 1), n_frames=4, frame_bytes=8)
    rows = sorted((r.frame_idx, bytes(r.frame)) for r in out.collect())
    assert len(rows) == 4
    assert all(len(f) == 8 for _, f in rows)
    assert rows[0][1] == b"\x00\x01\x02\x03\x00\x01\x02\x03"
