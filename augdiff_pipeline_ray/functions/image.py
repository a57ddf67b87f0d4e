"""Deterministic image codec + tile decode kernels (the multimodal column support).

This container ships no PIL/libjpeg, so the engine carries a small self-contained codec
pair with the two behaviors the per-row invariant needs (BASELINE.json ``input_hint``:
"decoded-pixel allclose, PSNR ≥ 40 dB for lossy formats"):

* ``fmt="rawz"`` — lossless: raw RGB8 pixels, zlib-compressed. Exact round-trip.
* ``fmt="qz"``  — lossy: pixels quantized to 64 levels per channel then zlib-compressed;
  max per-channel error ≤ 2 ⇒ PSNR ≥ 42 dB always (verified in tests). This stands in
  for JPEG where the real pipeline would use libjpeg behind the same interface.

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


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for an image id: smooth gradient + low noise."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (xx * 255.0 / max(1, w - 1)) * 0.5
        + (yy * 255.0 / max(1, h - 1)) * 0.3
        + (seed % 64)
    )
    px = np.empty((h, w, 3), np.uint8)
    for c in range(3):
        chan = base + rng.normal(0.0, 2.0, size=(h, w)) + c * 17.0
        px[:, :, c] = np.clip(chan, 0, 255).astype(np.uint8)
    return px


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """(h, w, 3) uint8 → encoded bytes."""
    h, w = pixels.shape[:2]
    hdr = MAGIC + struct.pack("<BII", FMT_CODES[fmt], w, h)
    if fmt == "rawz":
        return hdr + zlib.compress(pixels.tobytes(), 6)
    if fmt == "qz":
        q = (pixels >> 2).astype(np.uint8)  # 64 levels/channel: max err 2 ⇒ PSNR ≳ 42 dB
        return hdr + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt}")


def decode(data: bytes) -> tuple[np.ndarray, str]:
    """encoded bytes → ((h, w, 3) uint8 pixels, fmt)."""
    if data[:4] != MAGIC:
        raise ValueError("not an ADT1 image")
    code, w, h = struct.unpack_from("<BII", data, 4)
    raw = zlib.decompress(data[13:])
    arr = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    fmt = FMT_NAMES[code]
    if fmt == "qz":
        arr = ((arr.astype(np.uint16) << 2) | 2).clip(0, 255).astype(np.uint8)  # dequant to bin center
    return arr.copy(), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf when identical)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


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


def decode_stub_real_codec(data: bytes):  # pragma: no cover
    """Where a real JPEG/PNG decoder would plug in (PIL/libjpeg absent in this container).

    The Ray-side plumbing (schema, actor signature, batch sizing) is identical — only this
    dispatch would change.
    """
    raise NotImplementedError("real JPEG/PNG decode requires PIL/libjpeg; use rawz/qz")
