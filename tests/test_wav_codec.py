"""REAL audio codec path: RIFF/WAVE payloads decode through the stdlib
``wave`` module inside the Arrow-batched feature stage — actual header
parsing and PCM interpretation, not the deterministic fake.  Ground
truth is analytic: a sine at amplitude A has RMS A/√2 and zero-crossing
rate 2f/rate, so the features must land on physics, not on digests.
"""

from __future__ import annotations

import io
import math
import wave

import numpy as np
import pytest

from kafka_bigdata_jobs_spark.operators.multimodal import extract_audio_features


def _wav_bytes(rate: int, pcm: np.ndarray, n_channels: int = 1,
               width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            wf.writeframes(pcm.astype("<i2").tobytes())
        else:
            wf.writeframes(((pcm >> 8) + 128).astype("u1").tobytes())
    return buf.getvalue()


def _sine(rate: int, freq: float, seconds: float, amp: int) -> np.ndarray:
    t = np.arange(int(rate * seconds))
    return (amp * np.sin(2 * math.pi * freq * t / rate)).astype(np.int16)


@pytest.fixture(scope="module")
def decoded(spark):
    rows = [
        # (media_id, rate, freq, seconds, amplitude)
        (1, 8000, 440.0, 0.50, 16000),
        (2, 16000, 1000.0, 0.25, 8000),
        (3, 44100, 220.0, 0.10, 24000),
    ]
    payloads = [
        (mid, _wav_bytes(rate, _sine(rate, f, sec, amp)))
        for mid, rate, f, sec, amp in rows
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    # deterministic_fake=False: ONLY the real WAV path may run.
    got = {
        r["media_id"]: r
        for r in extract_audio_features(df, deterministic_fake=False).collect()
    }
    return {"params": rows, "got": got}


def test_header_fields_are_decoded(decoded):
    for mid, rate, _f, sec, _a in decoded["params"]:
        r = decoded["got"][mid]
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == int(int(rate * sec) * 1000 / rate)


def test_rms_matches_sine_physics(decoded):
    for mid, _rate, _f, _sec, amp in decoded["params"]:
        r = decoded["got"][mid]
        want = (amp / 32768.0) / math.sqrt(2)
        assert abs(r["rms"] - want) < 0.01 * want + 1e-4, (mid, r["rms"], want)


def test_zcr_matches_sine_frequency(decoded):
    for mid, rate, f, _sec, _a in decoded["params"]:
        r = decoded["got"][mid]
        want = 2 * f / rate  # a sine crosses zero twice per period
        assert abs(r["zero_crossing_rate"] - want) < 0.1 * want, (
            mid, r["zero_crossing_rate"], want)


def test_stereo_and_8bit_decode(spark):
    rate = 16000
    mono = _sine(rate, 500.0, 0.2, 12000)
    stereo = np.column_stack([mono, mono]).reshape(-1)
    df = spark.createDataFrame(
        [
            (10, _wav_bytes(rate, stereo, n_channels=2)),
            (11, _wav_bytes(rate, mono, width=1)),
        ],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r
           for r in extract_audio_features(df, deterministic_fake=False).collect()}
    # identical channels average back to the mono waveform
    want_rms = (12000 / 32768.0) / math.sqrt(2)
    assert abs(got[10]["rms"] - want_rms) < 0.01 * want_rms + 1e-4
    assert got[10]["sample_rate"] == rate
    # 8-bit round-trips with quantization error only (8-bit SNR ~ 1.5%)
    assert abs(got[11]["rms"] - want_rms) < 0.05 * want_rms + 1e-3


def test_non_wav_payload_still_raises_without_fake(spark):
    df = spark.createDataFrame(
        [(99, b"\x00\x01\x02 definitely not a RIFF container")],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="non-WAV audio codecs"):
        extract_audio_features(df, deterministic_fake=False).collect()


def test_fake_path_unchanged_for_non_wav(spark):
    """Existing fixtures (synthetic non-WAV blobs) must keep their
    digest-derived features — the real codec only claims RIFF/WAVE."""
    payload = b"synthetic-blob-0"
    df = spark.createDataFrame([(5, payload)], "media_id long, payload binary")
    r = extract_audio_features(df, deterministic_fake=True).collect()[0]
    import hashlib

    digest = hashlib.sha256(payload).digest()
    assert r["sample_rate"] == (8000, 16000, 22050, 44100)[digest[0] % 4]
