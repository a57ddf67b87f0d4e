"""Deterministic image codec + tile decode kernels (the multimodal column support).

This container ships no PIL/libjpeg, so the engine carries self-contained codecs for
the behaviors the per-row invariant needs (BASELINE.json ``input_hint``:
"decoded-pixel allclose, PSNR ≥ 40 dB for lossy formats"):

* ``fmt="rawz"`` — lossless: raw RGB8 pixels, zlib-compressed. Exact round-trip.
* ``fmt="qz"``  — lossy: pixels quantized to 64 levels per channel then zlib-compressed;
  max per-channel error ≤ 2 ⇒ PSNR ≥ 42 dB always (verified in tests).
* ``fmt="png"`` — REAL PNG (functions/png.py, pure zlib+numpy) — externally
  consumable streams, dispatched by signature.
* ``fmt="jpeg"`` — REAL baseline JFIF (functions/jpeg.py, pure numpy: vectorized
  DCT/RLE/bit-pack encode, LUT-driven Huffman decode) — externally consumable
  streams, dispatched by the SOI signature; q90 measures ≥ 41.7 dB over the
  synthetic tile corpus.

Header: ``b"ADT1" | fmt_code u8 | w u32 | h u32`` then the zlib stream. Everything is
numpy-vectorized; the decoder runs inside an actor-pool ``map_batches`` stage
(``TileDecoder``) so per-actor state (codec dispatch, scratch buffers) is set up once.

The synthetic pixel content for a tile is a seeded deterministic gradient + hash noise
(``synth_pixels``) — same image_id ⇒ byte-identical pixels, so golden tests and PSNR
checks are meaningful without any external data.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"ADT1"
FMT_CODES = {"rawz": 0, "qz": 1}
FMT_NAMES = {0: "rawz", 1: "qz"}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for an image id: smooth gradient + low noise.

    float32 single-pass on purpose: this kernel runs twice per tile (generate + verify)
    across every decode actor; float64 multi-pass versions saturate node memory
    bandwidth and cap actor-pool scaling.
    """
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    xs = (np.arange(w, dtype=np.float32) * (255.0 / max(1, w - 1)) * 0.5)[None, :, None]
    ys = (np.arange(h, dtype=np.float32) * (255.0 / max(1, h - 1)) * 0.3)[:, None, None]
    chan = np.array([seed % 64, seed % 64 + 17.0, seed % 64 + 34.0], np.float32)[None, None, :]
    noise = rng.standard_normal((h, w, 3), dtype=np.float32)
    out = xs + ys + chan + noise * np.float32(2.0)
    return np.clip(out, 0, 255, out=out).astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 → encoded bytes (``png`` → a real PNG stream, not ADT1)."""
    if fmt == "png":
        from . import png as PNG

        return PNG.png_encode(pixels)
    if fmt == "jpeg":
        from . import jpeg as JPEG

        # q90: ≥ 41.7 dB measured across the synthetic tile corpus (the engine's
        # decode-verify gate is 40 dB) at ~2.7 KB per 128² tile
        return JPEG.jpeg_encode(pixels, quality=90)
    h, w = pixels.shape[:2]
    hdr = MAGIC + struct.pack("<BII", FMT_CODES[fmt], w, h)
    if fmt == "rawz":
        return hdr + zlib.compress(pixels.tobytes(), 6)
    if fmt == "qz":
        q = (pixels >> 2).astype(np.uint8)  # 64 levels/channel: max err 2 ⇒ PSNR ≳ 42 dB
        return hdr + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt}")


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """encoded bytes → ((h, w, 3) uint8 pixels, fmt).

    rawz returns a READ-ONLY zero-copy view over the inflate buffer (the decode pool's
    consumers only read; writers copy-on-write) — the old unconditional ``.copy()`` was
    a full extra DRAM pass per tile, measurable as per-core retention loss at high
    actor counts.

    Dispatch is by signature: real PNG streams (functions/png.py — pure zlib+numpy,
    external-consumer-compatible) decode alongside the ADT1 container formats."""
    # bytes() cast: Arrow buffer memoryviews carry signed format 'b', under which a
    # bytes compare sees -119 != 0x89 and misses the PNG signature's high-bit lead
    if bytes(data[:8]) == _PNG_SIG:
        from . import png as PNG

        return PNG.png_decode(data), "png"
    if bytes(data[:3]) == b"\xff\xd8\xff":  # JPEG SOI + first marker lead
        from . import jpeg as JPEG

        return JPEG.jpeg_decode(data), "jpeg"
    if data[:4] != MAGIC:
        raise ValueError("not an ADT1 image")
    code, w, h = struct.unpack_from("<BII", data, 4)
    raw = zlib.decompress(data[13:])
    arr = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    fmt = FMT_NAMES[code]
    if fmt == "qz":
        out = np.empty_like(arr)  # dequant to bin center; 63<<2|2 = 254, stays in uint8
        np.left_shift(arr, 2, out=out)
        np.bitwise_or(out, 2, out=out)
        return out, fmt
    return arr, fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf when identical).

    float32 pipeline (bandwidth, see synth_pixels); max per-pixel error 255 ⇒ squared
    sums stay well within float32-accumulated-in-float64 mean precision for dB checks.
    """
    diff = a.astype(np.float32) - b.astype(np.float32)
    mse = float(np.mean(diff * diff, dtype=np.float64))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def psnr_vs_synth(image_id: str, px: np.ndarray, strip: int = 16) -> float:
    """PSNR of ``px`` against the deterministic reference, fused strip-wise.

    Equivalent to ``psnr(synth_pixels(id, w, h), px)`` (same float32 products,
    float64 accumulation) but never materializes the full reference or diff: the
    reference is generated ``strip`` rows at a time (numpy ``Generator.standard_normal``
    consumes its stream sequentially, so chunked draws are bit-identical to one full
    draw — asserted in tests) and squared error accumulates per strip. All temporaries
    stay L2-resident, which is what keeps per-core decode throughput flat as the
    actor pool fills the node — the verify pass was the stage's biggest DRAM term."""
    h, w = px.shape[:2]
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    xs = (np.arange(w, dtype=np.float32) * (255.0 / max(1, w - 1)) * 0.5)[None, :, None]
    chan = np.array([seed % 64, seed % 64 + 17.0, seed % 64 + 34.0], np.float32)[None, None, :]
    yscale = np.float32(255.0 / max(1, h - 1) * 0.3)
    sse = 0.0
    for y0 in range(0, h, strip):
        y1 = min(h, y0 + strip)
        ys = (np.arange(y0, y1, dtype=np.float32) * yscale)[:, None, None]
        out = rng.standard_normal((y1 - y0, w, 3), dtype=np.float32)
        out *= np.float32(2.0)
        out += xs + ys + chan
        np.clip(out, 0, 255, out=out)
        ref = out.astype(np.uint8)
        d = ref.astype(np.float32)
        d -= px[y0:y1]
        sse += float(np.sum(d * d, dtype=np.float64))
    mse = sse / px.size
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def tile_features(pixels: np.ndarray, passes: int = 32) -> np.ndarray:
    """Per-tile feature vector (8 float32): iterated 3×3 box-blur pyramid statistics +
    gradient energy — the multimodal "feature-extract" stage of the ingest pipeline.

    Deliberately cache-resident compute (the grayscale plane of a ≤256² tile fits L2):
    the decode stage's heavy step is arithmetic, not another pass over DRAM, which is
    what lets a node's full core count contribute (and mirrors real featurizers, which
    are model-compute-bound).
    """
    g = pixels.mean(axis=2, dtype=np.float32)
    # bulk compute runs on a ≤128² plane (64 KB — L2-resident even at high core counts)
    while g.shape[0] > 128 or g.shape[1] > 128:
        g = g[::2, ::2]
    acc_mean = np.empty(passes, np.float32)
    work = g.copy()
    for p in range(passes):
        # 3×3 box blur via shifted adds (no allocation churn beyond two planes)
        b = work.copy()
        b[1:, :] += work[:-1, :]
        b[:-1, :] += work[1:, :]
        c = b.copy()
        c[:, 1:] += b[:, :-1]
        c[:, :-1] += b[:, 1:]
        work = c * np.float32(1.0 / 9.0)
        acc_mean[p] = work.mean(dtype=np.float32)
    gx = np.diff(g, axis=1)
    gy = np.diff(g, axis=0)
    return np.array(
        [
            g.mean(dtype=np.float32),
            g.std(),
            work.mean(dtype=np.float32),
            work.std(),
            np.abs(gx).mean(dtype=np.float32),
            np.abs(gy).mean(dtype=np.float32),
            acc_mean[: passes // 2].mean(),
            acc_mean[passes // 2 :].mean(),
        ],
        np.float32,
    )


def phash64(pixels: np.ndarray) -> int:
    """Perceptual-hash-like int64: 8×8 mean-threshold bits of the grayscale downsample."""
    g = pixels.mean(axis=2)
    h, w = g.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i] : max(ys[i] + 1, ys[i + 1]), xs[j] : max(xs[j] + 1, xs[j + 1])].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    # keep it positive int64
    return v & 0x7FFF_FFFF_FFFF_FFFF


def resize_bilinear(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, 3) uint8 → (out_h, out_w, 3) uint8, bilinear with half-pixel centers
    (the OpenCV/PIL ``align_corners=False`` convention) — pure numpy gathers + lerps,
    no per-pixel Python. The multimodal "resize" stage kernel; a real pipeline would
    swap cv2/PIL behind the same signature (see decode_stub_real_codec)."""
    h, w = pixels.shape[:2]
    if (out_h, out_w) == (h, w):
        return pixels
    sy = np.float32(h / out_h)
    sx = np.float32(w / out_w)
    fy = np.clip((np.arange(out_h, dtype=np.float32) + 0.5) * sy - 0.5, 0, h - 1)
    fx = np.clip((np.arange(out_w, dtype=np.float32) + 0.5) * sx - 0.5, 0, w - 1)
    y0 = fy.astype(np.int64)
    x0 = fx.astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None].astype(np.float32)
    wx = (fx - x0)[None, :, None].astype(np.float32)
    p = pixels.astype(np.float32)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)  # round-half-up, no banker's


# ---------------------------------------------------------------------------
# multi-frame container ("video" as an opaque binary column) + frame sampling
# ---------------------------------------------------------------------------

VMAGIC = b"ADV1"


def pack_frames(frames: list[bytes]) -> bytes:
    """Encoded frames → one opaque blob: ``ADV1 | n u32 | byte-length u32 × n |
    payloads``. The index header is what makes :func:`frame_slice` O(1): a sampler
    reads ONLY its sampled frames' byte ranges, never inflating the rest."""
    hdr = VMAGIC + struct.pack("<I", len(frames))
    hdr += struct.pack(f"<{len(frames)}I", *(len(f) for f in frames))
    return hdr + b"".join(frames)


def frame_count(data: bytes) -> int:
    if data[:4] != VMAGIC:
        raise ValueError("not an ADV1 container")
    return struct.unpack_from("<I", data, 4)[0]


def frame_slice(data: bytes, i: int) -> bytes:
    """The i-th encoded frame's bytes — a header seek + one slice, no full-blob scan."""
    n = frame_count(data)
    if not 0 <= i < n:
        raise IndexError(i)
    lens = struct.unpack_from(f"<{n}I", data, 8)
    start = 8 + 4 * n + sum(lens[:i])
    return data[start : start + lens[i]]


def sample_frame_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic uniform frame sample: k center-of-strip indices (the standard
    video-sampling layout — frame i of strip i), distinct, sorted."""
    k = min(k, n_frames)
    if k <= 0:
        return np.empty(0, np.int64)
    return np.unique(((np.arange(k) + 0.5) * (n_frames / k)).astype(np.int64))


def decode_stub_real_codec(data: bytes):  # pragma: no cover
    """Historical stub, retained for API compatibility — both named formats are now
    REAL: PNG (functions/png.py) and baseline JPEG (functions/jpeg.py), each
    dispatched by signature in :func:`decode`. Only exotic variants (progressive
    JPEG, subsampled chroma, 16-bit PNG) remain out of scope and raise ValueError
    from their decoders with an explicit message.
    """
    return decode(data)
