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


# ---------------------------------------------------------------------------
# vectorized batch kernels (VERDICT r2 #3): the corpus-scan stages must never
# cross the Arrow→Python boundary per row. These operate straight off the Arrow
# buffers (split → dictionary-encode → hash the DISTINCT vocabulary once per
# batch → numpy segment reductions). They are deliberately NOT bit-compatible
# with the per-row reference kernels above (different word hash): LSH bucketing
# only needs determinism — identical texts always collide (recall 1.0) and the
# downstream verify is exact — so the per-row kernels stay as the documented
# single-doc reference implementations.
# ---------------------------------------------------------------------------


def word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (uint64 hash per word, flat in doc order; per-doc word
    counts). Tokenization = whitespace runs with empty tokens dropped (``str.split``
    parity); each DISTINCT word is hashed once per batch via ``pd.util.hash_array``
    over the dictionary — no per-row Python."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    lens = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.list_flatten(words).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(enc.dictionary) == 0:
        return np.empty(0, np.uint64), np.zeros(len(lens), np.int64)
    dic = enc.dictionary.to_numpy(zero_copy_only=False)
    wh = pd.util.hash_array(dic, hash_key="augdiffminhash16").astype(np.uint64)
    keep = (
        pc.binary_length(enc.dictionary).to_numpy(zero_copy_only=False) > 0
    )[codes]
    doc_of = np.repeat(np.arange(len(lens)), lens)
    lens_clean = np.bincount(doc_of[keep], minlength=len(lens)).astype(np.int64)
    return wh[codes[keep]], lens_clean


_SHINGLE_PW = np.array(
    [pow(0x100000001B3, j, 1 << 64) for j in range(64)], np.uint64
)  # FNV-prime powers for the k-window polynomial rolling hash
_BAND_PW = np.array(
    [pow(0x9E3779B97F4A7C15, j + 1, 1 << 64) for j in range(64)], np.uint64
)  # golden-ratio powers folding a band's signature slice to one 64-bit hash


def minhash_signatures_batch(texts, k: int = 5) -> np.ndarray:
    """(n, NUM_PERM) int64 minhash signatures for a whole Arrow string column.

    Word k-window shingles via a polynomial hash over per-word hashes (short docs
    with 0 < words < k get one window over all words); per-permutation Carter-
    Wegman (a·x+b) mod p with the min taken by ``np.minimum.reduceat`` over doc
    segments. Empty docs get the MERSENNE fill (same convention as
    ``minhash_signature``)."""
    hv, lens = word_hashes(texts)
    n = len(lens)
    sig = np.full((n, NUM_PERM), _MERSENNE, np.int64)
    ng = np.where(lens > 0, np.maximum(lens - k + 1, 1), 0)
    total = int(ng.sum())
    if total == 0:
        return sig
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    doc_of = np.repeat(np.arange(n), ng)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(ng)[:-1]]), ng
    )
    gs = doc_starts[doc_of] + pos
    gend = np.minimum(gs + k, doc_starts[doc_of] + lens[doc_of])
    val = np.zeros(total, np.uint64)
    for j in range(k):
        m = gs + j < gend
        val[m] += hv[gs[m] + j] * _SHINGLE_PW[j]
    nz = ng > 0
    red_starts = np.concatenate([[0], np.cumsum(ng)[:-1]])[nz]
    a64 = _A.astype(np.uint64)
    b64 = _B.astype(np.uint64)
    m64 = np.uint64(_MERSENNE)
    out_nz = np.empty((int(nz.sum()), NUM_PERM), np.int64)
    for p in range(NUM_PERM):
        h = ((val * a64[p] + b64[p]) % m64).view(np.int64)
        out_nz[:, p] = np.minimum.reduceat(h, red_starts)
    sig[nz] = out_nz
    return sig


def lsh_band_matrix(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n, bands) int64 band hashes for a signature MATRIX — the vectorized
    counterpart of ``lsh_band_rows`` (polynomial fold instead of crc32; equal
    band hash within a band ⇒ candidate, exactly as before)."""
    n, perms = sig.shape
    rpb = perms // bands
    s = sig.reshape(n, bands, rpb).astype(np.uint64)
    return (s * _BAND_PW[None, None, :rpb]).sum(axis=2, dtype=np.uint64).view(np.int64)


def simhash64_batch(texts) -> np.ndarray:
    """(n,) int64 SimHash fingerprints for a whole Arrow string column — the
    vectorized counterpart of ``simhash64`` (per-word ±1 bit votes summed by
    ``np.add.reduceat`` over doc segments; bit 63 masked to stay int64-positive)."""
    hv, lens = word_hashes(texts)
    n = len(lens)
    out = np.zeros(n, np.uint64)
    if hv.size:
        shifts = np.arange(64, dtype=np.uint64)
        nz = lens > 0
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])[nz]
        acc = np.empty((int(nz.sum()), 64), np.int64)
        # chunk the BIT axis: the full (words, 64) ±1 matrix is ~256 B per word
        # occurrence — GBs of transient arena on long-document batches (review
        # r3 finding); 16 bits at a time bounds the transient to words×64 B
        for b0 in range(0, 64, 16):
            sh = shifts[b0 : b0 + 16]
            contrib = (
                ((hv[:, None] >> sh[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1
            )
            acc[:, b0 : b0 + 16] = np.add.reduceat(contrib, starts, axis=0)
        out[nz] = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    return (out & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).view(np.int64)


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
