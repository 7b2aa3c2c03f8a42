"""REAL baseline-JPEG codec path: ITU T.81 SOF0 payloads decode through
the stdlib+numpy reader inside the Arrow-batched image feature stage —
marker walk, DQT/DHT parse, huffman entropy decode with byte stuffing
and restart markers, DC prediction + EXTEND, dequant, inverse zigzag,
float IDCT.

Ground truth is analytic: the test encodes INTEGER COEFFICIENT blocks
directly (all-ones quant table, so dequant is identity), computes the
expected pixels with the same T.81 IDCT formula, and the decoded mean
luma must land on that closed form — a DC-only block of value 8·(g−128)
decodes to the solid level g exactly, and AC blocks round-trip because
both sides round the identical float64 IDCT.
"""

from __future__ import annotations

import numpy as np
import pytest

from kafka_bigdata_jobs_spark.operators.multimodal import extract_image_features

ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

_u = np.arange(8)
_cosm = np.cos((2 * _u[:, None] + 1) * _u[None, :] * np.pi / 16)
_cu = np.where(_u == 0, 1 / np.sqrt(2), 1.0)
IDCT_A = _cosm * _cu[None, :] / 2.0  # pixels = A @ coef @ A.T


def idct_pixels(coef: np.ndarray) -> np.ndarray:
    """Decoded pixel block for an integer coefficient block (identity
    quant): the exact math the reader must reproduce."""
    return np.clip(np.round(IDCT_A @ coef @ IDCT_A.T + 128.0), 0, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def pad_align(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s per T.81


def _canonical(symbols: list[int]):
    """One-length canonical table holding every symbol (all-ones code
    left unused); returns (counts16, symbols, {sym: (len, code)})."""
    length = 1
    while (1 << length) <= len(symbols):
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    enc = {}
    code = 0
    for ln in range(1, 17):
        if ln == length:
            for s in symbols:
                enc[s] = (ln, code)
                code += 1
        code <<= 1
    return counts, symbols, enc


def _magnitude(v: int) -> tuple[int, int]:
    """(size, appended-bits) per T.81 EXTEND convention."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def jpeg_bytes(blocks, w: int, h: int, n_comp: int = 1,
               restart_interval: int = 0) -> bytes:
    """Encode a baseline JPEG from integer COEFFICIENT blocks.

    ``blocks``: list of MCUs; each MCU is a list of ``n_comp`` 8×8
    integer arrays (coefficient domain, identity quant).  All
    components are 1×1-sampled (grayscale or 4:4:4), so one MCU = one
    block per component, raster order.
    """
    dc_syms = list(range(12))
    ac_used = sorted({0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)})
    dc_counts, dc_vals, dc_enc = _canonical(dc_syms)
    ac_counts, ac_vals, ac_enc = _canonical(ac_used)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # identity quant
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([n_comp])
    for c in range(n_comp):
        sof += bytes([c + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * n_comp
    rst = 0
    for mi, mcu in enumerate(blocks):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.pad_align()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * n_comp
        for c in range(n_comp):
            coef = mcu[c]
            diff = int(coef[0, 0]) - pred[c]
            pred[c] = int(coef[0, 0])
            s, bits = _magnitude(diff)
            ln, code = dc_enc[s]
            bw.write(code, ln)
            if s:
                bw.write(bits, s)
            zz = [int(coef[ZZ[k]]) for k in range(64)]
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    ln, code = ac_enc[0x00]  # EOB
                    bw.write(code, ln)
                    break
                while run > 15:
                    ln, code = ac_enc[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s, bits = _magnitude(zz[k])
                ln, code = ac_enc[(run << 4) | s]
                bw.write(code, ln)
                bw.write(bits, s)
                k += 1
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_one(spark, payload: bytes):
    df = spark.createDataFrame([(0, payload)], "media_id long, payload binary")
    return extract_image_features(df, deterministic_fake=False).collect()[0]


def _dc_block(g: int) -> np.ndarray:
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[0, 0] = 8 * (g - 128)
    return coef


def test_jpeg_solid_gray(spark):
    """One DC-only block: level g decodes to mean_luma == g/255 exactly."""
    row = _decode_one(spark, jpeg_bytes([[_dc_block(120)]], 8, 8))
    assert (row["width"], row["height"]) == (8, 8)
    assert row["mean_luma"] == round(120 / 255.0, 6)


def test_jpeg_dc_prediction_chain(spark):
    """3×2 blocks with distinct levels: DC differences accumulate across
    the scan; the mean is the block average (dims are multiples of 8)."""
    levels = [40, 90, 140, 190, 240, 20]
    mcus = [[_dc_block(g)] for g in levels]
    row = _decode_one(spark, jpeg_bytes(mcus, 24, 16))
    assert (row["width"], row["height"]) == (24, 16)
    assert row["mean_luma"] == round(sum(levels) / 6 / 255.0, 6)


def test_jpeg_mcu_padding_cropped(spark):
    """20×12 image needs 3×2 padded MCUs: padding blocks share the same
    level, so a wrong crop cannot hide — but width/height must come from
    SOF0, not the MCU grid."""
    g = 77
    mcus = [[_dc_block(g)] for _ in range(6)]
    row = _decode_one(spark, jpeg_bytes(mcus, 20, 12))
    assert (row["width"], row["height"]) == (20, 12)
    assert row["mean_luma"] == round(g / 255.0, 6)


def test_jpeg_ac_coefficients_roundtrip(spark):
    """Blocks with AC energy (runs, ZRL, EOB all exercised): expected
    mean computed from the SAME T.81 IDCT the decoder must implement."""
    rng = np.random.RandomState(7)
    mcus = []
    expect = []
    for _ in range(4):
        coef = np.zeros((8, 8), dtype=np.int64)
        coef[0, 0] = 8 * (rng.randint(90, 160) - 128)
        # sparse ACs, small enough to stay inside [0, 255] after IDCT
        for _k in range(5):
            r, c = rng.randint(0, 8, 2)
            if (r, c) != (0, 0):
                coef[r, c] = int(rng.randint(-60, 60))
        # a long zero run before a late coefficient forces ZRL
        coef[7, 6] = 9
        mcus.append([coef])
        expect.append(idct_pixels(coef))
    row = _decode_one(spark, jpeg_bytes(mcus, 32, 8))
    want = float(np.mean([e.mean() for e in expect]))
    assert row["mean_luma"] == round(want / 255.0, 6)


def test_jpeg_restart_markers(spark):
    """DRI + RSTn every 2 MCUs: predictors reset and the stream
    re-aligns; values chosen so a missed reset shifts the mean."""
    levels = [60, 70, 200, 210, 30, 40]
    mcus = [[_dc_block(g)] for g in levels]
    row = _decode_one(spark, jpeg_bytes(mcus, 48, 8, restart_interval=2))
    assert row["mean_luma"] == round(sum(levels) / 6 / 255.0, 6)


def test_jpeg_color_444_luma_only(spark):
    """3-component 4:4:4: chroma blocks must be entropy-decoded (to
    advance the stream) but only Y feeds the luma; constant-128 chroma
    (zero coefficients) is gray."""
    y_levels = [100, 180]
    zero = np.zeros((8, 8), dtype=np.int64)
    mcus = [[_dc_block(g), zero, zero] for g in y_levels]
    row = _decode_one(spark, jpeg_bytes(mcus, 16, 8, n_comp=3))
    assert (row["width"], row["height"]) == (16, 8)
    assert row["mean_luma"] == round(sum(y_levels) / 2 / 255.0, 6)


def jpeg_bytes_420(y_blocks, w: int, h: int) -> bytes:
    """Encode a 4:2:0 baseline JPEG: one MCU per 4 Y blocks (2×2 grid,
    raster order) + one Cb + one Cr (both zero = neutral gray).
    ``y_blocks``: list of MCUs, each a list of 4 coefficient blocks."""
    dc_syms = list(range(12))
    dc_counts, dc_vals, dc_enc = _canonical(dc_syms)
    ac_counts, ac_vals, ac_enc = _canonical([0x00])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])  # Cb/Cr: 1x1
    out += seg(0xC0, sof)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}

    def emit_dc_only(cid: int, dc: int):
        diff = dc - pred[cid]
        pred[cid] = dc
        s, bits = _magnitude(diff)
        ln, code = dc_enc[s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
        ln, code = ac_enc[0x00]
        bw.write(code, ln)

    for mcu in y_blocks:
        for blk in mcu:  # 4 Y blocks, raster order within the MCU
            emit_dc_only(1, int(blk[0, 0]))
        emit_dc_only(2, 0)  # Cb neutral
        emit_dc_only(3, 0)  # Cr neutral
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_subsampled_mcu(spark):
    """4:2:0 (the dominant real-world sampling): 4 Y blocks per MCU in
    a 2×2 grid plus entropy-decoded-and-discarded chroma.  Distinct
    levels per quadrant make any block-placement or interleave error
    shift the mean."""
    levels = [50, 110, 170, 230]  # TL, TR, BL, BR within the MCU
    mcus = [[_dc_block(g) for g in levels]]
    row = _decode_one(spark, jpeg_bytes_420(mcus, 16, 16))
    assert (row["width"], row["height"]) == (16, 16)
    assert row["mean_luma"] == round(sum(levels) / 4 / 255.0, 6)
    # And a 2-MCU image (32px wide): Y DC prediction runs ACROSS MCUs.
    mcus2 = [[_dc_block(g) for g in levels],
             [_dc_block(g + 10) for g in levels]]
    row2 = _decode_one(spark, jpeg_bytes_420(mcus2, 32, 16))
    want = (sum(levels) + sum(g + 10 for g in levels)) / 8
    assert row2["mean_luma"] == round(want / 255.0, 6)


def test_jpeg_progressive_raises(spark):
    """SOF2 (progressive) fails loudly, never silently wrong."""
    payload = bytearray(jpeg_bytes([[_dc_block(50)]], 8, 8))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    df = spark.createDataFrame(
        [(0, bytes(payload))], "media_id long, payload binary")
    with pytest.raises(Exception, match="non-baseline|SOF0"):
        extract_image_features(df, deterministic_fake=False).collect()


def test_jpeg_non_interleaved_scan_raises(spark):
    """A frame component absent from the first SOS (legal
    non-interleaved baseline JPEG) raises the explicit
    NotImplementedError, not a raw huff-table KeyError (r5 ADVICE)."""
    blocks = [[_dc_block(90), _dc_block(100), _dc_block(110)]]
    payload = bytearray(jpeg_bytes(blocks, 8, 8, n_comp=3))
    idx = payload.find(b"\xff\xda")
    # Replace the 3-component SOS (14 bytes incl. marker+length) with a
    # 2-component one: component 3 stays in the SOF but leaves the scan.
    assert payload[idx + 2:idx + 4] == (12).to_bytes(2, "big")
    payload[idx:idx + 14] = (
        b"\xff\xda" + (10).to_bytes(2, "big")
        + bytes([2, 1, 0x00, 2, 0x00, 0, 63, 0]))
    df = spark.createDataFrame(
        [(0, bytes(payload))], "media_id long, payload binary")
    with pytest.raises(Exception, match="absent from the first SOS"):
        extract_image_features(df, deterministic_fake=False).collect()


def test_jpeg_resize_to_grayscale_png(spark):
    """r5: resize_images accepts baseline-JPEG input — the shared T.81
    reader yields the Y plane, nearest-neighbor resample, grayscale-PNG
    re-encode.  A two-level image (left block 60, right block 200)
    downsampled 16x8 -> 4x4 keeps the left/right split, so the
    re-decoded mean is the exact 50/50 mix — pixel-level proof the
    resample indexed the decoded plane, not a fake payload."""
    from kafka_bigdata_jobs_spark.operators.multimodal import resize_images

    payload = jpeg_bytes([[_dc_block(60)], [_dc_block(200)]], 16, 8)
    df = spark.createDataFrame([(7, payload)], "media_id long, payload binary")
    out = resize_images(df, target_width=4, target_height=4,
                        deterministic_fake=False).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    assert bytes(out["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    feat = _decode_one(spark, bytes(out["payload"]))
    assert (feat["width"], feat["height"]) == (4, 4)
    assert feat["mean_luma"] == round((60 + 200) / 2 / 255.0, 6)


def test_jpeg_resize_upsample_identity_levels(spark):
    """Nearest-neighbor upsample of a solid JPEG stays solid at the
    exact level — and the PNG round-trip keeps integer pixels."""
    from kafka_bigdata_jobs_spark.operators.multimodal import resize_images

    payload = jpeg_bytes([[_dc_block(123)]], 8, 8)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    out = resize_images(df, target_width=13, target_height=9,
                        deterministic_fake=False).collect()[0]
    feat = _decode_one(spark, bytes(out["payload"]))
    assert (feat["width"], feat["height"]) == (13, 9)
    assert feat["mean_luma"] == round(123 / 255.0, 6)
