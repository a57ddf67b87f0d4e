"""Baseline JPEG codec (functions/jpeg.py) — spec-anchored tests.

The container has no libjpeg/PIL to cross-check against, so beyond roundtrips these
tests pin the codec to ITU T.81 itself: a hand-computed entropy bitstream for the
flat-gray MCU (Annex K code values), an analytic DC-only reconstruction, marker
structure, byte-stuffing invariants, and a decoder driven by a JPEG hand-assembled
in the test from spec constants (so the decoder is anchored independently of the
encoder).
"""
import numpy as np
import pytest

from augdiff_pipeline_ray.functions import image as IMG
from augdiff_pipeline_ray.functions import jpeg as J
from augdiff_pipeline_ray.functions.jpeg import (
    DCT_M,
    ZIG,
    jpeg_decode,
    jpeg_encode,
    quality_tables,
)


def _segments(data: bytes) -> list[tuple[int, bytes]]:
    """(marker, payload) list; entropy-coded data appended as (0xDA_scan, bytes)."""
    out = []
    pos = 2
    assert data[:2] == b"\xff\xd8"
    while pos < len(data):
        assert data[pos] == 0xFF
        m = data[pos + 1]
        if m == 0xD9:
            out.append((0xD9, b""))
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        out.append((m, data[pos + 4 : pos + 2 + ln]))
        pos += 2 + ln
        if m == 0xDA:  # scan data runs to EOI
            end = data.rfind(b"\xff\xd9")
            out.append((0x100, data[pos:end]))
            pos = end
    return out


# ---------------------------------------------------------------------------
# Spec anchors
# ---------------------------------------------------------------------------

def test_flat_gray_scan_bits_match_annex_k_hand_computation():
    # All-128 RGB → Y=Cb=Cr=128 exactly → all coefficients 0 in every component.
    # Per T.81 + Annex K tables the interleaved MCU entropy-codes as:
    #   Y:  DC cat0 '00'  + EOB '1010'   (AC-lum EOB is the classic 4-bit 1010)
    #   Cb: DC cat0 '00'  + EOB '00'     (AC-chroma EOB is 2 bits)
    #   Cr: DC cat0 '00'  + EOB '00'
    # = 00101000 000000 + two 1-pad bits = 0x28 0x03.
    enc = jpeg_encode(np.full((8, 8, 3), 128, np.uint8), 90)
    segs = dict(_segments(enc))
    assert segs[0x100] == b"\x28\x03"


def test_dc_only_uniform_level_reconstructs_exactly():
    # Uniform gray 200: Y=200, level-shift 72, DC = 8*72 = 576 (orthonormal DCT).
    # qy[0] at q90 = floor((16*20+50)/100) = 3; 576 → 192 → 576 → 72+128 = 200 exact.
    qy, _ = quality_tables(90)
    assert qy[0] == 3
    img = np.full((16, 24, 3), 200, np.uint8)
    out = jpeg_decode(jpeg_encode(img, 90))
    assert (out == 200).all()


def test_marker_structure_and_tables():
    enc = jpeg_encode(IMG.synth_pixels("m", 32, 40), 90)
    segs = _segments(enc)
    order = [m for m, _ in segs]
    assert order[0] == 0xE0  # JFIF APP0 first
    assert order.count(0xDB) == 2 and order.count(0xC4) == 4
    assert 0xC0 in order and order[-1] == 0xD9
    sof = dict(segs)[0xC0]
    prec, h, w, nc = sof[0], int.from_bytes(sof[1:3], "big"), int.from_bytes(sof[3:5], "big"), sof[5]
    assert (prec, h, w, nc) == (8, 40, 32, 3)  # synth_pixels takes (id, w, h)
    assert all(sof[7 + 3 * c] == 0x11 for c in range(3))  # 4:4:4
    app0 = dict(segs)[0xE0]
    assert app0[:5] == b"JFIF\x00"
    # DQT payloads carry the q90-scaled Annex K tables in zigzag order
    qy, qc = quality_tables(90)
    dqts = {p[0]: np.frombuffer(p[1:], np.uint8) for m, p in segs if m == 0xDB}
    assert (dqts[0] == qy[ZIG]).all() and (dqts[1] == qc[ZIG]).all()


def test_entropy_data_is_byte_stuffed():
    # every 0xFF inside the entropy-coded segment must be followed by 0x00
    enc = jpeg_encode(IMG.synth_pixels("stuff", 128, 128), 95)
    scan = dict(_segments(enc))[0x100]
    arr = np.frombuffer(scan, np.uint8)
    ffs = np.flatnonzero(arr[:-1] == 0xFF)
    assert (arr[ffs + 1] == 0).all()
    assert arr[-1] != 0xFF


def test_decoder_anchored_by_hand_assembled_grayscale_stream():
    # Build a 1-component 8×8 JPEG from raw spec constants (not via jpeg_encode):
    # quant table all-16 for the DC, DC cat 4 value +10 (bits '1010' — cat 4 spans
    # ±8..15, low-half patterns EXTEND to negatives), no ACs.
    # DC coef = 10*16 = 160 → spatial = 160/8 + 128 = 148 everywhere.
    import struct

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt = bytes([0]) + bytes(16 for _ in range(64))
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table bits=[0,1,4,0,...]: cat0='00'(2b), cats 1-4 = '010' '011' '100' '101' (3b)
    dht_dc = bytes([0x00, 0, 1, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]) + bytes([0, 1, 2, 3, 4])
    # AC table: single 2-bit EOB code ('00')
    dht_ac = bytes([0x10, 0, 1] + [0] * 14) + bytes([0x00])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    # scan bits: DC huff '101' (cat 4) + value '1010' (+10) + EOB '00'
    # = 1 0 1 1 0 1 0 0 0 → 0xB4 then 0 + seven 1-pad bits → 0x7F
    scan = bytes([0xB4, 0x7F])
    data = (b"\xff\xd8" + seg(0xFFDB, qt) + seg(0xFFC0, sof) + seg(0xFFC4, dht_dc)
            + seg(0xFFC4, dht_ac) + seg(0xFFDA, sos) + scan + b"\xff\xd9")
    out = jpeg_decode(data)
    assert out.shape == (8, 8, 3)
    assert (out == 148).all()


# ---------------------------------------------------------------------------
# Roundtrip properties
# ---------------------------------------------------------------------------

def test_roundtrip_psnr_on_synthetic_tiles():
    for i in range(8):
        px = IMG.synth_pixels(f"jt{i}", 96, 96)
        out = jpeg_decode(jpeg_encode(px, 90))
        assert out.shape == px.shape and out.dtype == np.uint8
        assert IMG.psnr(px, out) >= 40.0


def test_roundtrip_odd_sizes_and_tiny():
    for (h, w) in ((13, 21), (1, 1), (8, 9), (17, 8)):
        px = IMG.synth_pixels(f"sz{h}x{w}", w, h)
        out = jpeg_decode(jpeg_encode(px, 90))
        assert out.shape == (h, w, 3)
        assert IMG.psnr(px, out) >= 38.0


def test_quality_monotone_in_size():
    px = IMG.synth_pixels("qm", 64, 64)
    sizes = [len(jpeg_encode(px, q)) for q in (50, 75, 90, 97)]
    assert sizes == sorted(sizes)


def test_high_frequency_content_roundtrips():
    # checkerboard stresses every AC path (long runs, ZRL, high categories)
    px = np.zeros((24, 24, 3), np.uint8)
    px[::2, ::2] = 255
    px[1::2, 1::2] = 255
    out = jpeg_decode(jpeg_encode(px, 95))
    assert out.shape == px.shape
    # lossy but structurally preserved: corners of each cell keep their polarity
    assert out[0, 0].mean() > 128 and out[0, 1].mean() < 128


def test_errors_are_explicit():
    px = IMG.synth_pixels("err", 16, 16)
    enc = jpeg_encode(px, 90)
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")
    with pytest.raises(ValueError):
        jpeg_decode(enc[: len(enc) // 2])  # truncated mid-scan
    prog = bytearray(enc)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError):
        jpeg_decode(bytes(prog))
    with pytest.raises(ValueError):
        jpeg_encode(px.astype(np.uint16))  # type: ignore[arg-type]


def test_image_layer_dispatch():
    # fmt="jpeg" through the engine codec layer; signature-dispatched decode
    px = IMG.synth_pixels("disp", 48, 48)
    blob = IMG.encode(px, "jpeg")
    assert blob[:3] == b"\xff\xd8\xff"
    out, fmt = IMG.decode(blob)
    assert fmt == "jpeg"
    assert IMG.psnr(px, out) >= 40.0
    # Arrow binary scalars hand the decoder a memoryview with signed format — the
    # high-bit SOI lead (0xFF) must still dispatch (the PNG 0x89 lesson)
    import pyarrow as pa

    buf = pa.array([blob], pa.binary())[0].as_buffer()
    out2, fmt2 = IMG.decode(memoryview(buf))
    assert fmt2 == "jpeg" and (out2 == out).all()


def test_subsampled_roundtrips_and_444_unchanged():
    """4:2:0 / 4:2:2 encode+decode (VERDICT r3 missing #4): smooth content
    round-trips at high PSNR, odd (non-MCU-multiple) dims crop exactly, and the
    default 4:4:4 path is unaffected by the subsampling machinery."""
    xx, yy = np.meshgrid(np.linspace(0, 1, 96), np.linspace(0, 1, 80))
    img = np.stack([xx * 255, yy * 255, (xx + yy) / 2 * 255], axis=2).astype(np.uint8)

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255**2 / mse) if mse else np.inf

    for ss, bar in (((2, 2), 40.0), ((2, 1), 42.0)):
        blob = jpeg_encode(img, 90, subsampling=ss)
        out = jpeg_decode(blob)
        assert out.shape == img.shape
        assert psnr(img, out) >= bar
        # header advertises the sampling factors
        idx = blob.find(b"\xff\xc0")
        assert blob[idx + 11] == (ss[0] << 4 | ss[1])  # Y component samp byte
    # smaller stream than 4:4:4 at the same quality (the point of subsampling)
    assert len(jpeg_encode(img, 90, subsampling=(2, 2))) < len(jpeg_encode(img, 90))
    # odd dims: crop is exact
    img2 = img[:77, :93]
    out2 = jpeg_decode(jpeg_encode(img2, 90, subsampling=(2, 2)))
    assert out2.shape == (77, 93, 3)
    # 4:4:4 default path byte-stable across the subsampling change
    assert jpeg_encode(img, 90) == jpeg_encode(img, 90, subsampling=(1, 1))


def test_subsampled_constant_chroma_matches_444_luma():
    """A grayscale-content RGB image has constant chroma: 4:2:0 decode must agree
    with the 4:4:4 decode almost exactly (subsampling loses nothing)."""
    g = np.repeat(np.linspace(0, 255, 64)[None, :], 48, axis=0).astype(np.uint8)
    img = np.repeat(g[:, :, None], 3, axis=2)
    d444 = jpeg_decode(jpeg_encode(img, 95))
    d420 = jpeg_decode(jpeg_encode(img, 95, subsampling=(2, 2)))
    assert np.abs(d444.astype(int) - d420.astype(int)).max() <= 2


# ---------------------------------------------------------------------------
# Progressive (SOF2) — VERDICT r4 #6
# ---------------------------------------------------------------------------


def test_progressive_pixel_parity_with_baseline():
    """The 10-scan successive-approximation script must reconstruct EXACTLY the
    quantized coefficients of the sequential encoder → identical pixels."""
    for i, (wd, ht, sub, q) in enumerate([
        (64, 48, (1, 1), 85), (128, 128, (1, 1), 95), (72, 40, (1, 1), 30),
        (64, 64, (2, 2), 85), (120, 88, (2, 2), 60), (17, 23, (1, 1), 85),
        (8, 8, (1, 1), 85), (24, 24, (2, 2), 90),
    ]):
        px = IMG.synth_pixels(f"img-{i:08d}", wd, ht)
        base = J.jpeg_decode(J.jpeg_encode(px, q, subsampling=sub))
        prog = J.jpeg_decode(J.jpeg_encode_progressive(px, q, subsampling=sub))
        assert np.array_equal(base, prog), (wd, ht, sub, q)


def test_progressive_scan_types_in_isolation():
    """Each scan shape pinned separately: plain spectral selection, DC
    successive approximation, AC successive approximation, band splits."""
    px = IMG.synth_pixels("img-00000042", 64, 48)
    base = J.jpeg_decode(J.jpeg_encode(px, 85))
    scripts = {
        "spectral_only": [("dc", [0, 1, 2], 0, 0)]
        + [("ac", c, 1, 63, 0, 0) for c in (0, 1, 2)],
        "dc_refine": [("dc", [0, 1, 2], 0, 1), ("dc", [0, 1, 2], 1, 0)]
        + [("ac", c, 1, 63, 0, 0) for c in (0, 1, 2)],
        "ac_refine": [("dc", [0, 1, 2], 0, 0)]
        + [("ac", c, 1, 63, 0, 1) for c in (0, 1, 2)]
        + [("ac", c, 1, 63, 1, 0) for c in (0, 1, 2)],
        "band_split": [("dc", [0, 1, 2], 0, 0), ("ac", 0, 1, 5, 0, 0),
                       ("ac", 0, 6, 63, 0, 0), ("ac", 1, 1, 63, 0, 0),
                       ("ac", 2, 1, 63, 0, 0)],
        "two_level_aa": [("dc", [0, 1, 2], 0, 0),
                         ("ac", 0, 1, 63, 0, 2), ("ac", 0, 1, 63, 2, 1),
                         ("ac", 0, 1, 63, 1, 0)]
        + [("ac", c, 1, 63, 0, 0) for c in (1, 2)],
    }
    for name, script in scripts.items():
        prog = J.jpeg_decode(J.jpeg_encode_progressive(px, 85, script=script))
        assert np.array_equal(base, prog), name


def test_progressive_rejects_remain_for_exotic_sofs():
    """Lossless/arithmetic SOFs still raise — only SOF2 gained a path."""
    data = bytearray(J.jpeg_encode_progressive(
        IMG.synth_pixels("img-00000001", 16, 16), 85))
    i = bytes(data).find(b"\xff\xc2")
    data[i + 1] = 0xC3  # SOF3 (lossless)
    with pytest.raises(ValueError):
        J.jpeg_decode(bytes(data))


def test_progressive_noise_images_parity():
    """Uniform noise maximizes coefficient magnitudes and code-size spread —
    the adversarial case for the EOB-run and correction-bit paths."""
    rng = np.random.default_rng(0)
    for wh in ((64, 64), (40, 56), (16, 8)):
        px = rng.integers(0, 256, (wh[1], wh[0], 3), np.uint8)
        for q in (30, 95):
            for sub in ((1, 1), (2, 2)):
                b = J.jpeg_decode(J.jpeg_encode(px, q, subsampling=sub))
                p = J.jpeg_decode(J.jpeg_encode_progressive(px, q, subsampling=sub))
                assert np.array_equal(b, p), (wh, q, sub)


def test_progressive_malformed_streams_raise_cleanly():
    """Truncation anywhere and missing Huffman tables must raise ValueError —
    never IndexError/KeyError — so foreign-corpus ingest fails typed."""
    import struct

    px = IMG.synth_pixels("img-00000001", 48, 32)
    data = J.jpeg_encode_progressive(px, 85)
    rng = np.random.default_rng(0)
    for cut in rng.integers(2, len(data), 40).tolist():
        with pytest.raises(ValueError):
            J.jpeg_decode(data[:cut])
    # strip the progressive AC DHT (0xFFC4 id 0x10) → clean missing-table error
    pos, out = 2, bytearray(data[:2])
    while pos < len(data):
        if data[pos] == 0xFF and data[pos + 1] == 0xC4:
            ln = struct.unpack_from(">H", data, pos + 2)[0]
            if data[pos + 4] == 0x10:
                pos += 2 + ln
                continue
        out.append(data[pos])
        pos += 1
    with pytest.raises(ValueError, match="Huffman table"):
        J.jpeg_decode(bytes(out))
