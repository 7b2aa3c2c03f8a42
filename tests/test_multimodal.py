"""Multimodal plumbing tests: binary payload + metadata schema, Arrow
mapInPandas feature extraction, frame sampling (deterministic fake
codec — real codecs are stubbed, SURVEY/task brief)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_bigdata_jobs_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    rows = [(i, bytes([i]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    return M.attach_media_meta(df, "payload", "image", "image/png")


def test_media_meta_schema(media):
    row = media.where(F.col("media_id") == 3).first()
    assert row["meta"]["media_type"] == "image"
    assert row["meta"]["size_bytes"] == 103
    assert row["meta"]["width"] is None


def test_image_features_deterministic(media):
    feats = M.extract_image_features(media).orderBy("media_id").collect()
    assert len(feats) == 20
    payload = bytes([3]) * 103
    assert feats[3]["sha256"] == hashlib.sha256(payload).hexdigest()
    w, h, luma = M._fake_decode(payload)
    assert (feats[3]["width"], feats[3]["height"], feats[3]["mean_luma"]) == (w, h, luma)
    # run twice → identical (no hidden randomness)
    again = M.extract_image_features(media).orderBy("media_id").collect()
    assert [tuple(r) for r in feats] == [tuple(r) for r in again]


def test_real_codec_path_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        M.extract_image_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling(media):
    frames = M.sample_frames(media).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == set(range(20))
    for mid, rows in by_id.items():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == list(
            range(len(rows))
        )
        assert 1 <= len(rows) <= 8
        assert len({r["frame_sha256"] for r in rows}) == len(rows)


def test_resize_images_deterministic_and_composes(media):
    resized = M.resize_images(media, target_width=128, target_height=96)
    rows = {r["media_id"]: r for r in resized.collect()}
    assert set(rows) == set(range(20))
    for r in rows.values():
        assert (r["width"], r["height"]) == (128, 96)
        assert len(bytes(r["payload"])) == (128 * 96) // 4096
    # pure function of (payload, dims): rerun identical, other dims differ
    again = {r["media_id"]: r for r in M.resize_images(
        media, target_width=128, target_height=96).collect()}
    assert all(bytes(rows[i]["payload"]) == bytes(again[i]["payload"]) for i in rows)
    other = {r["media_id"]: r for r in M.resize_images(
        media, target_width=64, target_height=64).collect()}
    assert bytes(other[0]["payload"]) != bytes(rows[0]["payload"])
    # composes: resize → feature extract over the resized payloads
    feats = M.extract_image_features(resized).collect()
    assert len(feats) == 20


def test_audio_features_deterministic(media):
    feats = M.extract_audio_features(media).orderBy("media_id").collect()
    assert len(feats) == media.count()
    for r in feats:
        assert r["sample_rate"] in (8000, 16000, 22050, 44100)
        assert r["duration_ms"] > 0
        assert 0.0 <= r["rms"] <= 1.0
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
    again = M.extract_audio_features(media).orderBy("media_id").collect()
    assert feats == again


def test_audio_real_codec_path_is_stubbed(media):
    import pytest as _pytest

    with _pytest.raises(Exception, match="audio codecs"):
        M.extract_audio_features(media, deterministic_fake=False).collect()
