"""REAL image codec path: uncompressed 24-bit BI_RGB BMP payloads
decode through the pure-numpy parser inside the Arrow-batched feature
stage — actual header parsing, stride-padding handling, and BGR-plane
luma math, not the deterministic fake.  Ground truth is analytic: a
solid field of gray level g has mean BT.601 luma exactly g/255, and a
pure-red field has mean luma exactly 0.299 — the features must land on
pixel math, not on digests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from kafka_bigdata_jobs_spark.operators.multimodal import extract_image_features


def _bmp_bytes(bgr: np.ndarray, bottom_up: bool = True) -> bytes:
    """Encode an (h, w, 3) uint8 BGR array as an uncompressed 24-bit BMP."""
    h, w, _ = bgr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    if bottom_up:
        rows = rows[::-1]
    pixels = rows.tobytes()
    sign_h = h if bottom_up else -h
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + sign_h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = (
        b"BM"
        + (14 + 40 + len(pixels)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (54).to_bytes(4, "little")
    )
    return header + info + pixels


@pytest.fixture(scope="module")
def decoded(spark):
    cases = []
    # solid grays across every stride residue: widths 17..20 cover
    # w*3 % 4 in {3, 2, 1, 0}
    for i, (w, h, g) in enumerate([(17, 6, 40), (18, 7, 96), (19, 8, 160),
                                   (20, 9, 255)]):
        field = np.full((h, w, 3), g, dtype=np.uint8)
        cases.append((i, w, h, g / 255.0, _bmp_bytes(field)))
    # pure red (BGR plane order matters: R is the LAST byte)
    red = np.zeros((5, 10, 3), dtype=np.uint8)
    red[..., 2] = 255
    cases.append((100, 10, 5, 0.299, _bmp_bytes(red)))
    # top-down orientation (negative height) must decode identically
    gray = np.full((4, 9, 3), 120, dtype=np.uint8)
    cases.append((101, 9, 4, 120 / 255.0, _bmp_bytes(gray, bottom_up=False)))

    df = spark.createDataFrame(
        [(mid, payload) for mid, _w, _h, _l, payload in cases],
        "media_id long, payload binary",
    )
    # deterministic_fake=False: ONLY the real BMP path may run.
    got = {
        r["media_id"]: r
        for r in extract_image_features(df, deterministic_fake=False).collect()
    }
    return {"cases": cases, "got": got}


def test_dimensions_are_decoded(decoded):
    for mid, w, h, _luma, _p in decoded["cases"]:
        r = decoded["got"][mid]
        assert (r["width"], r["height"]) == (w, h), mid


def test_luma_matches_pixel_math(decoded):
    for mid, _w, _h, want, _p in decoded["cases"]:
        r = decoded["got"][mid]
        assert abs(r["mean_luma"] - want) < 1e-6, (mid, r["mean_luma"], want)


def test_sha_and_size_are_of_the_container(decoded):
    for mid, _w, _h, _l, payload in decoded["cases"]:
        r = decoded["got"][mid]
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert r["size_bytes"] == len(payload)


def test_gradient_luma_is_exact_mean(spark):
    """Non-constant pixels: a horizontal gray ramp's luma is the ramp mean."""
    w, h = 32, 4
    ramp = np.tile(np.arange(w, dtype=np.uint8) * 8, (h, 1))
    bgr = np.repeat(ramp[:, :, None], 3, axis=2)
    df = spark.createDataFrame(
        [(7, _bmp_bytes(bgr))], "media_id long, payload binary"
    )
    r = extract_image_features(df, deterministic_fake=False).collect()[0]
    want = float(ramp.mean()) / 255.0
    assert abs(r["mean_luma"] - want) < 1e-6


def test_non_bmp_payload_still_raises_without_fake(spark):
    # A GIF magic: BMP, PNG, and baseline JPEG are all real codec paths
    # as of r4, so the loud-failure probe must be none of the three.
    df = spark.createDataFrame(
        [(99, b"GIF89a definitely not a bitmap")],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="non-BMP/PNG/JPEG image codecs"):
        extract_image_features(df, deterministic_fake=False).collect()


def test_unsupported_bmp_variant_raises(spark):
    """8-bit palette BMPs are honestly out of scope — the guard must name
    the constraint rather than mis-decode."""
    field = np.full((3, 5, 3), 50, dtype=np.uint8)
    payload = bytearray(_bmp_bytes(field))
    payload[28:30] = (8).to_bytes(2, "little")  # claim 8bpp
    df = spark.createDataFrame(
        [(98, bytes(payload))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="24-bit BMP"):
        extract_image_features(df, deterministic_fake=False).collect()


def test_fake_path_unchanged_for_non_bmp(spark):
    """Existing fixtures (synthetic non-BMP blobs) must keep their
    digest-derived features — the real codec only claims BMP."""
    payload = b"synthetic-blob-0"
    df = spark.createDataFrame([(5, payload)], "media_id long, payload binary")
    r = extract_image_features(df, deterministic_fake=True).collect()[0]
    digest = hashlib.sha256(payload).digest()
    assert r["width"] == 64 + digest[0] % 192
    assert r["height"] == 64 + digest[1] % 192
