"""REAL video codec path: YUV4MPEG2 payloads decode through the
pure-numpy Y4M parser inside the Arrow-batched stages — actual header
parsing, FRAME-marker walking, and planar 4:2:0 picture layout, not the
deterministic fake.  Ground truth is arithmetic: solid frames whose Y
level ramps by b per frame have mean_luma = ramp midpoint / 255 and
motion = b/255 exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kafka_bigdata_jobs_spark.operators.multimodal import (
    _parse_y4m,
    extract_video_features,
    sample_frames,
)


def _y4m_bytes(w: int, h: int, num: int, den: int, y_frames,
               cfmt: str = "420") -> bytes:
    head = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{cfmt}\n".encode()
    chroma = bytes([128]) * (2 * ((w // 2) * (h // 2)))
    out = [head]
    for y in y_frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, dtype=np.uint8).tobytes())
        out.append(chroma)
    return b"".join(out)


def _solid(w: int, h: int, level: int) -> np.ndarray:
    return np.full(h * w, level, dtype=np.uint8)


@pytest.fixture(scope="module")
def decoded(spark):
    cases = []
    # (media_id, w, h, num, den, luma levels)
    params = [
        (1, 16, 8, 30, 1, [40, 50, 60, 70]),       # ramp step 10
        (2, 20, 12, 24, 1, [100]),                  # single frame
        (3, 18, 10, 30000, 1001, [80, 90, 100]),    # NTSC rate
    ]
    for mid, w, h, num, den, levels in params:
        payload = _y4m_bytes(w, h, num, den,
                             [_solid(w, h, v) for v in levels])
        cases.append((mid, w, h, num, den, levels, payload))
    df = spark.createDataFrame(
        [(mid, p) for mid, _w, _h, _n, _d, _l, p in cases],
        "media_id long, payload binary",
    )
    # deterministic_fake=False: ONLY the real Y4M path may run.
    got = {
        r["media_id"]: r
        for r in extract_video_features(df, deterministic_fake=False).collect()
    }
    return {"cases": cases, "got": got}


def test_header_fields_are_decoded(decoded):
    for mid, w, h, num, den, levels, _p in decoded["cases"]:
        r = decoded["got"][mid]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["fps_num"], r["fps_den"]) == (num, den)
        assert r["n_frames"] == len(levels)
        assert r["duration_ms"] == len(levels) * 1000 * den // num


def test_luma_and_motion_match_arithmetic(decoded):
    for mid, _w, _h, _n, _d, levels, _p in decoded["cases"]:
        r = decoded["got"][mid]
        want_luma = sum(levels) / len(levels) / 255.0
        assert abs(r["mean_luma"] - want_luma) < 1e-6, mid
        if len(levels) > 1:
            diffs = [abs(b - a) for a, b in zip(levels, levels[1:])]
            want_motion = sum(diffs) / len(diffs) / 255.0
            assert abs(r["motion"] - want_motion) < 1e-6, mid
        else:
            assert r["motion"] == 0.0


def test_parser_walks_frames_exactly(spark):
    w, h = 16, 8
    frames = [_solid(w, h, v) for v in (10, 200, 30)]
    parsed = _parse_y4m(_y4m_bytes(w, h, 25, 1, frames))
    assert parsed[:4] == (w, h, 25, 1)
    assert [np.frombuffer(f, dtype=np.uint8)[0] for f in parsed[4]] == [
        10, 200, 30,
    ]
    assert all(len(f) == w * h for f in parsed[4])


def test_sample_frames_real_path_uses_container_rate(spark):
    w, h = 16, 8
    levels = list(range(30, 90, 2))  # 30 frames
    payload = _y4m_bytes(w, h, 30, 1, [_solid(w, h, v) for v in levels])
    df = spark.createDataFrame(
        [(7, payload)], "media_id long, payload binary"
    )
    rows = sorted(
        sample_frames(df, every_ms=500, deterministic_fake=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    # 30 fps, 500 ms -> every 15th source frame of 30 -> 2 samples
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert rows[0]["frame_sha256"] == hashlib.sha256(
        _solid(w, h, levels[0]).tobytes()
    ).hexdigest()
    assert rows[1]["frame_sha256"] == hashlib.sha256(
        _solid(w, h, levels[15]).tobytes()
    ).hexdigest()


def test_non_y4m_payload_still_raises_without_fake(spark):
    df = spark.createDataFrame(
        [(99, b"\x00\x00\x00\x18ftypmp42 definitely not y4m")],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="non-Y4M video codecs"):
        extract_video_features(df, deterministic_fake=False).collect()


def test_unsupported_chroma_format_raises(spark):
    payload = _y4m_bytes(16, 8, 25, 1, [_solid(16, 8, 50)], cfmt="444")
    df = spark.createDataFrame(
        [(98, payload)], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="C420"):
        extract_video_features(df, deterministic_fake=False).collect()


def test_fake_path_unchanged_for_non_y4m(spark):
    """Existing fixtures (synthetic non-Y4M blobs) must keep their
    digest-derived frame explosion — the real codec only claims Y4M."""
    payload = b"synthetic-blob-0"
    df = spark.createDataFrame([(5, payload)], "media_id long, payload binary")
    rows = sample_frames(df, deterministic_fake=True).collect()
    digest = hashlib.sha256(payload).digest()
    assert len(rows) == 1 + digest[3] % 8
