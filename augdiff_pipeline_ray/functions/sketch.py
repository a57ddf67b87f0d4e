"""HyperLogLog count-distinct sketch — the mergeable-partial aggregate shape.

A distinct count over 10^12 rows can't shuffle the raw keys; the scale shape is a
fixed-size sketch built per batch (vectorized, no Python loop), merged with an
elementwise max — exactly Ray Data's partial-aggregate pattern: ``map_batches``
emits one (group, registers) row per group per batch, a tiny ``groupby`` merges
register vectors, and the estimator runs on the merged 4 KB state. Standard HLL
(Flajolet et al. 2007) with the linear-counting small-range correction.

Beyond-the-reference operator (driver mandate: "a novel sketch"); the reference
has no distinct-count operator (its dedups are exact, e.g.
ad/src/main/scala/AugmentedDiff.scala's distinct on augmented rows).
"""

from __future__ import annotations

import numpy as np

P = 12  # 2^12 = 4096 registers (4 KB/sketch), ~1.04/sqrt(m) = 1.6% std error
M = 1 << P
_W = 64 - P  # bits hashed into the register's rank


def hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64 over an int64/uint64 vector — deterministic across processes."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def partial(values: np.ndarray, registers: np.ndarray | None = None) -> np.ndarray:
    """Fold a batch of int64 keys into an (M,) uint8 register vector, vectorized.

    rho = leading-zero count of the low ``_W`` hash bits + 1; the highest-set-bit
    position comes from ``np.frexp`` (exact: w < 2^52 fits float64's mantissa).
    """
    reg = registers if registers is not None else np.zeros(M, np.uint8)
    if not len(values):
        return reg
    h = hash64(np.asarray(values))
    idx = (h >> np.uint64(_W)).astype(np.int64)
    w = h & np.uint64((1 << _W) - 1)
    rho = np.full(len(h), _W + 1, np.uint8)  # w == 0 → all _W bits are zeros
    nz = w != 0
    # highest set bit of w: frexp exponent e has 2^(e-1) <= w < 2^e
    e = np.frexp(w[nz].astype(np.float64))[1]
    rho[nz] = (_W - e + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two register vectors (the combiner): elementwise max."""
    return np.maximum(a, b)


# ---------------------------------------------------------------------------
# bottom-k uniform sample (mergeable, deterministic) — quantile / sample sketch
# ---------------------------------------------------------------------------
#
# Keeping the k rows with the SMALLEST hash of a unique row key is a uniform
# random sample that is (a) deterministic across runs/processes (hash-seeded,
# no RNG state), and (b) mergeable by "concat + keep k smallest" — the same
# partial/combine shape as HLL. Quantiles of the sample estimate quantiles of
# the distribution with rank error ~ sqrt(q(1-q)/k). Assumes row keys are
# unique (duplicate keys would be sampled together); use a composite key
# otherwise.

BOTTOMK_DEFAULT = 1024


def bottomk_partial(
    keys: np.ndarray, values: np.ndarray, k: int = BOTTOMK_DEFAULT
) -> tuple[np.ndarray, np.ndarray]:
    """Fold a batch into a (hashes, values) bottom-k sample, vectorized."""
    h = hash64(np.asarray(keys))
    v = np.asarray(values)
    if len(h) > k:
        idx = np.argpartition(h, k)[:k]
        h, v = h[idx], v[idx]
    return h, v


def bottomk_merge(
    h1: np.ndarray, v1: np.ndarray, h2: np.ndarray, v2: np.ndarray,
    k: int = BOTTOMK_DEFAULT,
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two bottom-k samples (the combiner): concat, keep the k smallest."""
    h = np.concatenate([h1, h2])
    v = np.concatenate([v1, v2])
    if len(h) > k:
        idx = np.argpartition(h, k)[:k]
        h, v = h[idx], v[idx]
    return h, v


def bottomk_quantile(values: np.ndarray, q: float) -> float:
    """Quantile estimate from the sample (inverted-CDF: an actual sample element)."""
    return float(np.quantile(values, q, method="inverted_cdf"))


_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def estimate(registers: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with the linear-counting correction."""
    reg = registers.astype(np.float64)
    e = _ALPHA * M * M / np.sum(np.exp2(-reg))
    if e <= 2.5 * M:
        v = int(np.count_nonzero(registers == 0))
        if v > 0:
            return M * np.log(M / v)
    return float(e)


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters) — mergeable frequency-overestimate state
# ---------------------------------------------------------------------------
#
# A frequency table over 10^12 rows can't shuffle raw keys either; the count-min
# sketch (Cormode & Muthukrishnan 2005) is the fixed-size partial: each batch
# folds its keys into a (CMS_D, CMS_W) int64 grid (vectorized np.add.at per
# row), grids merge by elementwise SUM, and a point query takes the MIN across
# rows — an OVERestimate, never an under-estimate. Heavy-hitter detection uses
# that one-sided error: probe the merged sketch per row, keep rows whose
# estimate clears the threshold (a superset of the true heavy keys), then run
# the exact groupby-count only over that pruned subset. Error bound:
# overcount <= 2N/CMS_W per row with prob 1 - 2^-CMS_D.

CMS_D = 4
CMS_W = 4096
_CMS_SEEDS = np.array(
    [0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0, 0x082EFA98EC4E6C89],
    np.uint64,
)  # pi digits — fixed, deterministic across processes


def cms_partial(keys: np.ndarray) -> np.ndarray:
    """Fold a batch of int64 keys into a fresh (CMS_D, CMS_W) int64 sketch,
    vectorized. Accumulation across batches goes through :func:`cms_merge`."""
    sk = np.zeros((CMS_D, CMS_W), np.int64)
    if not len(keys):
        return sk
    k = np.asarray(keys).astype(np.uint64)
    for r in range(CMS_D):
        idx = (hash64(k ^ _CMS_SEEDS[r]) % np.uint64(CMS_W)).astype(np.int64)
        np.add.at(sk[r], idx, 1)
    return sk


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two sketches (the combiner): elementwise sum."""
    return a + b


def cms_query(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Frequency over-estimate per key: min across the CMS_D hashed rows."""
    k = np.asarray(keys).astype(np.uint64)
    est = np.full(len(k), np.iinfo(np.int64).max, np.int64)
    for r in range(CMS_D):
        idx = (hash64(k ^ _CMS_SEEDS[r]) % np.uint64(CMS_W)).astype(np.int64)
        np.minimum(est, sketch[r][idx], out=est)
    return est


# ---------------------------------------------------------------------------
# weighted sample without replacement (deterministic Efraimidis–Spirakis race)
# ---------------------------------------------------------------------------
#
# A weighted k-sample over a join result that may be petabyte-scale (Streaming
# Weighted Sampling over Join Queries, EDBT 2023 — motivation only, the classic
# A-Res scheme here is Efraimidis & Spirakis 2006): each row draws u ∈ (0,1)
# and races with key u^(1/w); the k largest keys win, giving inclusion
# probability proportional to weight. Drawing u from a HASH of the row id
# (splitmix64 → unit interval) instead of an RNG makes the sample deterministic
# across runs, partitionings and cluster widths — so per-batch top-k partials
# merged by "concat + keep-k" (the bottom-k shape) reproduce the single-process
# result EXACTLY, which is also how it's tested. Race keys compare as
# ln(u)/w (monotone in u^(1/w), w > 0) to stay in float64 range.

def race_keys(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Deterministic per-row race key ln(u)/w (LARGEST k win; all values < 0)."""
    h = hash64(np.asarray(ids))
    # uniform in (0,1): (h + 0.5) / 2^64 — never exactly 0 or 1
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
    w = np.asarray(weights, np.float64)
    return np.log(u) / w


def weighted_topk_partial(
    ids: np.ndarray, weights: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fold a batch into its k best (race_key, id) rows (a mergeable partial)."""
    r = race_keys(ids, weights)
    if len(r) > k:
        idx = np.argpartition(-r, k)[:k]
        return r[idx], np.asarray(ids)[idx]
    return r, np.asarray(ids)


def weighted_topk_merge(
    r1: np.ndarray, i1: np.ndarray, r2: np.ndarray, i2: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two partials: concat, keep the k largest race keys."""
    r = np.concatenate([r1, r2])
    i = np.concatenate([i1, i2])
    if len(r) > k:
        idx = np.argpartition(-r, k)[:k]
        return r[idx], i[idx]
    return r, i
