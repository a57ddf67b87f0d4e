"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Ray-Data-native shapes (see ``pipelines/tpch.py`` for the Dataset wiring):

* **exact** — content-hash column in a vectorized ``map_batches``, then
  ``groupby(hash).map_groups(head-1)``: a hash-partition shuffle moving only (hash, id).
* **MinHash+LSH** — per-batch: shingle → 128 minhashes → band rows
  ``(band_id, band_hash, doc_id)``; explode; ``groupby(band_id, band_hash)`` buckets
  candidates; verify with exact Jaccard inside the group. Only band rows shuffle.
* **SimHash** — 64-bit weighted-bit fingerprint per doc; near-dups = fingerprints within
  Hamming distance d (grouped by rotated prefix buckets).
* **n-gram Jaccard** — exact pairwise verification kernel (used post-LSH; O(n²) only
  within buckets).
* **embedding cosine** — near-dup pairs above a cosine threshold; batch matmul against a
  broadcast normalized matrix (brute force) — the IVF/LSH variant lives in similarity.py.

All hash seeds are fixed constants ⇒ deterministic across processes/workers.
"""

from __future__ import annotations

import zlib

import numpy as np

from .text import shingles

NUM_PERM = 128
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(0xDECAF)
_A = _rng.integers(1, _MERSENNE, NUM_PERM, dtype=np.int64)
_B = _rng.integers(0, _MERSENNE, NUM_PERM, dtype=np.int64)


def content_hash(texts) -> np.ndarray:
    """Deterministic 64-bit content hash (crc32 pair over bytes + length salt)."""
    out = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8", errors="ignore")
        out[i] = ((zlib.crc32(b) & 0x7FFFFFFF) << 32) | (zlib.crc32(b[::-1]) ^ len(b))
    return out


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """(NUM_PERM,) int64 minhash signature over word k-shingles."""
    sh = shingles(text, k)
    if not sh:
        return np.full(NUM_PERM, _MERSENNE, np.int64)
    vals = np.fromiter(sh, np.int64, len(sh))
    # (a * x + b) mod p for each permutation — vectorized outer
    prod = (vals[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
    return prod.min(axis=1)


def lsh_band_rows(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """Signature → [(band_id, band_hash)] rows; equal band_hash within a band ⇒ candidate."""
    rows_per_band = NUM_PERM // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
        out.append((b, zlib.crc32(chunk.tobytes())))
    return out


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram crc hashes, count-weighted."""
    acc = np.zeros(64, np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in (text or "").split():
        h = np.uint64(zlib.crc32(tok.encode()) | (zlib.crc32(tok[::-1].encode()) << 32))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v & 0x7FFF_FFFF_FFFF_FFFF


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 fingerprint arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via bit-twiddling (no np.popcount in this numpy)
    x = x - ((x >> 1) & 0x5555555555555555)
    x = (x & 0x3333333333333333) + ((x >> 2) & 0x3333333333333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F0F0F0F0F
    return ((x * 0x0101010101010101) >> 56) & 0x7F


def cosine_near_dups(
    embs: np.ndarray, ids: np.ndarray, threshold: float = 0.95
) -> list[tuple[int, int, float]]:
    """All pairs (i < j) with cosine ≥ threshold — brute force over a normalized matrix.

    At scale this runs per LSH/IVF bucket; see similarity.py for the bucketing.
    """
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    normed = embs / np.maximum(norms, 1e-12)
    sims = normed @ normed.T
    iu, ju = np.triu_indices(len(ids), k=1)
    hit = sims[iu, ju] >= threshold
    return [
        (int(ids[i]), int(ids[j]), float(sims[i, j]))
        for i, j in zip(iu[hit], ju[hit])
    ]
