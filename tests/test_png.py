"""Real-PNG codec (functions/png.py): structure, round-trips, foreign-file decode.

The encoder's output must be consumable by ANY external PNG reader, so the tests
check the byte-level container contract (signature, chunk layout, CRCs, zlib
stream) independently of the library decoder, and decode files constructed by an
INDEPENDENT in-test writer (filter-0-only, its own chunk assembly) so an encoder
bug cannot be masked by a mirrored decoder bug.
"""

import struct
import zlib

import numpy as np
import pytest

from augdiff_pipeline_ray.functions import image as IMG
from augdiff_pipeline_ray.functions import png as PNG


def _rand(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


# ---------------------------------------------------------------------------
# round-trips through the library pair
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (5, 1), (16, 16), (37, 61), (128, 96)])
def test_roundtrip_random(h, w):
    px = _rand(h, w, seed=h * 1000 + w)
    out = PNG.png_decode(PNG.png_encode(px))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert np.array_equal(out, px)


def test_roundtrip_synth_tiles_lossless():
    for iid in ("img-00000000", "img-00000313"):
        px = IMG.synth_pixels(iid, 96, 64)
        out = PNG.png_decode(PNG.png_encode(px))
        assert np.array_equal(out, px)
        assert IMG.psnr(px, out) == float("inf")  # lossless by construction


def test_gradient_compresses_better_than_raw():
    # the adaptive Sub/Up filters must actually engage on smooth content
    px = IMG.synth_pixels("img-compress", 128, 128)
    enc = PNG.png_encode(px)
    assert len(enc) < px.nbytes  # gradient+noise still compresses under filtering
    raw = PNG.png_decode(enc)
    assert np.array_equal(raw, px)


# ---------------------------------------------------------------------------
# container contract (checked without the library decoder)
# ---------------------------------------------------------------------------


def _walk_chunks(data):
    assert data[:8] == PNG.PNG_SIG
    pos, chunks = 8, []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert zlib.crc32(payload, zlib.crc32(tag)) & 0xFFFFFFFF == crc, tag
        chunks.append((tag, payload))
        pos += 12 + ln
    return chunks


def test_container_layout_and_crcs():
    px = _rand(23, 41, seed=7)
    chunks = _walk_chunks(PNG.png_encode(px))
    tags = [t for t, _ in chunks]
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", chunks[0][1])
    assert (w, h, depth, color, comp, filt, inter) == (41, 23, 8, 2, 0, 0, 0)
    # the IDAT payload is one valid zlib stream of h*(1+3w) filtered bytes
    raw = zlib.decompress(chunks[1][1])
    assert len(raw) == 23 * (1 + 3 * 41)
    assert all(raw[r * (1 + 3 * 41)] in (0, 1, 2) for r in range(23))  # encoder's filters


def test_crc_tamper_detected():
    enc = bytearray(PNG.png_encode(_rand(8, 8)))
    enc[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        PNG.png_decode(bytes(enc))


# ---------------------------------------------------------------------------
# foreign files: an independent writer + shapes our encoder never emits
# ---------------------------------------------------------------------------


def _foreign_png(px: np.ndarray, color: int, filters: list[int]) -> bytes:
    """Minimal independent PNG writer (filter math straight from the RFC, written
    per pixel, sharing no code with the library encoder)."""
    h, w, ch = px.shape
    lines = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        lines.append(f)
        cur = px[y].astype(np.int32)
        for x in range(w):
            for c in range(ch):
                a = int(cur[x - 1, c]) if x > 0 else 0
                b = int(prev[x, c])
                cc = int(prev[x - 1, c]) if x > 0 else 0
                v = int(cur[x, c])
                if f == 0:
                    o = v
                elif f == 1:
                    o = v - a
                elif f == 2:
                    o = v - b
                elif f == 3:
                    o = v - ((a + b) >> 1)
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    o = v - pred
                lines.append(o & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(tag, payload):
        crc = zlib.crc32(payload, zlib.crc32(tag)) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)

    return (PNG.PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_foreign_rgb_all_filters(filters):
    px = _rand(9, 13, seed=sum(filters) + 11)
    out = PNG.png_decode(_foreign_png(px, color=2, filters=filters))
    assert np.array_equal(out, px)


def test_decode_foreign_gray_and_rgba():
    g = np.random.default_rng(3).integers(0, 256, (6, 5, 1), np.uint8)
    out = PNG.png_decode(_foreign_png(g, color=0, filters=[0, 2]))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))
    rgba = np.random.default_rng(4).integers(0, 256, (6, 5, 4), np.uint8)
    out = PNG.png_decode(_foreign_png(rgba, color=6, filters=[4, 1]))
    assert np.array_equal(out, rgba[:, :, :3])


# ---------------------------------------------------------------------------
# dispatch through the engine codec layer
# ---------------------------------------------------------------------------


def test_image_encode_decode_dispatch_png():
    px = IMG.synth_pixels("img-dispatch", 48, 32)
    enc = IMG.encode(px, "png")
    assert enc[:8] == PNG.PNG_SIG  # a REAL png stream, not the ADT1 container
    out, fmt = IMG.decode(enc)
    assert fmt == "png" and np.array_equal(out, px)
    # the per-row invariant used by the tile verify stage holds exactly
    assert IMG.psnr_vs_synth("img-dispatch", out) == float("inf")


def test_decode_arrow_buffer_memoryview():
    """Arrow binary scalars expose SIGNED-format memoryviews; the signature compare
    must still see 0x89 (regression: PNG rows failed decode_ok inside TileDecoder
    while plain-bytes decode passed)."""
    import pyarrow as pa

    px = IMG.synth_pixels("img-mv", 16, 16)
    arr = pa.array([IMG.encode(px, "png")], pa.binary())
    mv = memoryview(arr[0].as_buffer())
    out, fmt = IMG.decode(mv)
    assert fmt == "png" and np.array_equal(out, px)
