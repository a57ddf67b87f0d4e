"""Similarity search over the embeddings table: brute-force cosine top-k + LSH-bucketed ANN.

* ``TopKSearcher`` — the actor-pool stage: normalizes the broadcast query matrix once per
  actor (``__init__``), then per batch computes cosine via one numpy matmul and emits
  per-batch partial top-k rows; a tiny final ``sort/limit`` per query merges partials.
  No full-dataset materialization; only (query_id, vec_id, score) rows move.
* ``random_hyperplane_buckets`` — the scale path: sign-LSH bucket ids so candidate
  generation groups by bucket (shuffle moves (bucket, vec_id) only), then exact cosine
  verifies within buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_rng = np.random.default_rng(0xC051)


def normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def embedding_matrix(col, dtype=np.float32) -> np.ndarray:
    """Unpack a ``list<float>`` Arrow column with uniform row lengths into an (n, d)
    matrix via ONE flat-values buffer view + reshape — no per-row Python loop (the r1
    ``np.stack([... for e in to_pylist()])`` shape cost a Python object per vector).
    Ragged/null rows fall back to the row loop (never hit by the embeddings table)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (
        isinstance(col, pa.FixedSizeListArray)
        and col.null_count == 0
        and len(col)
    ):
        d = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), d).astype(dtype, copy=False)
    if (
        isinstance(col, (pa.ListArray, pa.LargeListArray))
        and col.null_count == 0
        and len(col)
    ):
        offs = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if (lens == lens[0]).all():
            n, d = len(col), int(lens[0])
            flat = col.values.to_numpy(zero_copy_only=False)
            return flat[offs[0] : offs[0] + n * d].reshape(n, d).astype(dtype, copy=False)
    if len(col) == 0:
        return np.empty((0, 0), dtype)
    return np.stack([np.asarray(e, dtype) for e in col.to_pylist()])


class TopKSearcher:
    """map_batches actor: batch of (vec_id, embedding) → partial top-k per query."""

    def __init__(self, queries: np.ndarray, query_ids: np.ndarray, k: int = 10):
        self.q = normalize(np.asarray(queries, np.float32))
        self.qids = np.asarray(query_ids, np.int64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = normalize(embs) @ self.q.T  # (batch, nq)
        k = min(self.k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, nq)
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            sel = top[:, qi]
            out_q.extend([int(self.qids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(sims[sel, qi].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def merge_topk(partials: pa.Table, k: int) -> pa.Table:
    """Merge per-batch partial top-k rows into the global top-k per query (small)."""
    import pandas as pd

    df = partials.to_pandas()
    df = df.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount()
    return pa.Table.from_pandas(df, preserve_index=False)


def ivf_build(embs: np.ndarray, n_lists: int = 16, iters: int = 8, seed: int = 7):
    """IVF coarse quantizer: k-means centroids over normalized vectors (deterministic).

    Returns (centroids, assignments). The scale path: build on a sample, broadcast
    centroids, assign per batch; search probes the closest ``n_probe`` lists only.
    """
    x = normalize(np.asarray(embs, np.float32))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)].copy()
    assign = np.zeros(len(x), np.int64)
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = normalize(members.mean(axis=0, keepdims=True))[0]
    return cent, assign


def ivf_search(
    queries: np.ndarray,
    embs: np.ndarray,
    ids: np.ndarray,
    cent: np.ndarray,
    assign: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> list[list[tuple[int, float]]]:
    """Probe the n_probe nearest lists per query; exact cosine within probed lists."""
    q = normalize(np.asarray(queries, np.float32))
    x = normalize(np.asarray(embs, np.float32))
    out = []
    probe = (q @ cent.T).argsort(axis=1)[:, ::-1][:, :n_probe]
    for qi in range(len(q)):
        mask = np.isin(assign, probe[qi])
        cand = np.nonzero(mask)[0]
        sims = x[cand] @ q[qi]
        top = cand[np.argsort(-sims, kind="stable")[:k]]
        out.append([(int(ids[t]), float(x[t] @ q[qi])) for t in top])
    return out


class IVFSearcher:
    """map_batches actor — the distributed IVF probe search (the ANN scale path):
    centroids + the query matrix broadcast once per actor (``__init__``); per batch,
    one matmul assigns the batch's vectors to coarse lists, and each query scores only
    the rows landing in its ``n_probe`` nearest lists. Emits per-batch partial top-k
    rows; ``merge_topk`` finishes. No driver-side matrix, single pass over the table."""

    def __init__(self, cent: np.ndarray, queries: np.ndarray, query_ids: np.ndarray,
                 k: int = 10, n_probe: int = 4):
        self.cent = normalize(np.asarray(cent, np.float32))
        self.q = normalize(np.asarray(queries, np.float32))
        self.qids = np.asarray(query_ids, np.int64)
        self.k = k
        self.probe = (self.q @ self.cent.T).argsort(axis=1)[:, ::-1][:, :n_probe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        x = normalize(embs)
        assign = (x @ self.cent.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.q)):
            mask = np.isin(assign, self.probe[qi])
            cand = np.nonzero(mask)[0]
            if not len(cand):
                continue
            sims = x[cand] @ self.q[qi]
            k = min(self.k, len(cand))
            top = cand[np.argpartition(-sims, k - 1)[:k]] if k < len(cand) else cand
            out_q.extend([int(self.qids[qi])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend((x[top] @ self.q[qi]).astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def hyperplane_band_hashes(
    embs: np.ndarray, n_bands: int = 16, band_bits: int = 8, seed: int = 0xC052
) -> np.ndarray:
    """(n, n_bands) int64 sign-LSH band hashes (deterministic planes): band b matches
    iff all ``band_bits`` hyperplane signs agree. For cosine ≥ 0.999 (angle ≤ 2.6°)
    the per-band match probability is ≈ (1 - θ/π)^bits ≈ 0.89, so 16 bands miss a true
    near-dup with probability ≈ 1e-16 — and identical vectors always collide."""
    dim = embs.shape[1]
    planes = np.random.default_rng(seed).standard_normal(
        (n_bands * band_bits, dim)
    ).astype(np.float32)
    signs = (np.asarray(embs, np.float32) @ planes.T) > 0  # (n, n_bands*band_bits)
    weights = (1 << np.arange(band_bits)).astype(np.int64)
    return signs.reshape(len(embs), n_bands, band_bits) @ weights


def random_hyperplane_buckets(embs: np.ndarray, n_planes: int = 12) -> np.ndarray:
    """Sign-LSH bucket id per row (int64): bit b = sign(x · h_b). Deterministic planes.

    The sign decision runs in float64 regardless of input dtype so it is reproducible
    by any engine that evaluates the dot in double (the DuckDB conformance oracle
    inlines these planes and uses ``list_dot_product``): float64 dots of gaussian
    planes differ between summation orders only at ~1e-15 relative, far from 0."""
    dim = embs.shape[1]
    planes = np.random.default_rng(0xC051).standard_normal((n_planes, dim)).astype(np.float32)
    signs = (embs.astype(np.float64) @ planes.T.astype(np.float64)) > 0
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    return signs @ weights


def hyperplane_oracle_sql(table: str = "embeddings", vec_col: str = "embedding",
                          id_col: str = "vec_id", dim: int = 64,
                          n_planes: int = 12) -> str:
    """ANSI-SQL equivalent of :func:`random_hyperplane_buckets` with the deterministic
    planes inlined as list literals (float32 values round-trip exactly through their
    decimal repr into DOUBLE)."""
    planes = np.random.default_rng(0xC051).standard_normal((n_planes, dim)).astype(np.float32)
    terms = []
    for b in range(n_planes):
        vec = ", ".join(repr(float(v)) for v in planes[b])
        terms.append(
            f"(CASE WHEN list_dot_product({vec_col}, [{vec}]) > 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return (f"SELECT {id_col}, CAST(" + " + ".join(terms)
            + f" AS BIGINT) AS bucket FROM {table}")


# -- distributed k-means (semantic clustering over the embeddings table) --------------


def _min_ids_partial(t: pa.Table, k: int) -> pa.Table:
    """Per-batch combiner for the deterministic init: keep the k smallest vec_ids and
    their vectors (global init = fold of these tiny partials)."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.argsort(ids, kind="stable")[:k]
    return t.take(pa.array(keep))


def kmeans_init(ds, k: int) -> np.ndarray:
    """Deterministic seeds: the embeddings of the k smallest vec_ids (one streaming
    pass of per-batch min-k partials; the driver folds k rows per block)."""
    import pyarrow as _pa

    parts = ds.map_batches(
        lambda t: _min_ids_partial(t, k), batch_format="pyarrow"
    )
    t = _pa.concat_tables(
        list(parts.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel = np.argsort(ids, kind="stable")[:k]
    return normalize(embedding_matrix(t["embedding"]).astype(np.float64)[sel])


def kmeans_iterate(ds, cent: np.ndarray, iters: int = 8) -> np.ndarray:
    """Distributed Lloyd's on the cosine sphere: per iteration, broadcast the (k, d)
    centroid matrix (``ray.put`` once, read per task), one ``map_batches`` pass emits
    k partial rows per batch (cluster, count, float64 vector sum), the driver folds
    the (k × nblocks)-row partial table and renormalizes. Nothing but k-row partials
    ever leaves a worker; the embedding table streams k·iters times and never
    materializes."""
    import ray as _ray

    k, d = cent.shape
    for _ in range(iters):
        ref = _ray.put(np.ascontiguousarray(cent))

        def partial(t: pa.Table, _ref=ref, _k=k, _d=d) -> pa.Table:
            c = _ray.get(_ref)
            x = normalize(embedding_matrix(t["embedding"]).astype(np.float64))
            assign = (x @ c.T).argmax(axis=1)
            counts = np.bincount(assign, minlength=_k).astype(np.int64)
            sums = np.zeros((_k, _d), np.float64)
            for ci in range(_k):
                m = assign == ci
                if m.any():
                    sums[ci] = x[m].sum(axis=0)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = pa.concat_tables(
            list(
                ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        )
        cl = parts["cluster"].to_numpy(zero_copy_only=False)
        n = parts["n"].to_numpy(zero_copy_only=False)
        vs = embedding_matrix(parts["vsum"], dtype=np.float64)
        counts = np.zeros(k, np.int64)
        sums = np.zeros((k, d), np.float64)
        np.add.at(counts, cl, n)
        np.add.at(sums, cl, vs)
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = normalize(sums[nz] / counts[nz, None])
    return cent


def kmeans_assign(ds, cent: np.ndarray):
    """Final labeling pass: (vec_id, cluster) rows, centroids broadcast once."""
    import ray as _ray

    ref = _ray.put(np.ascontiguousarray(cent))

    def label(t: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        x = normalize(embedding_matrix(t["embedding"]).astype(np.float64))
        assign = (x @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "cluster": pa.array(assign)})

    return ds.map_batches(label, batch_format="pyarrow")


def kmeans_local_reference(
    embs: np.ndarray, ids: np.ndarray, k: int, iters: int = 8
) -> np.ndarray:
    """Single-process Lloyd's with the same init/update rules — the pytest oracle for
    the distributed path (same float64 math; per-cluster sums are order-stable)."""
    x = normalize(np.asarray(embs, np.float64))
    order = np.argsort(np.asarray(ids, np.int64), kind="stable")[:k]
    cent = x[order].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for ci in range(k):
            m = assign == ci
            if m.any():
                cent[ci] = normalize(x[m].sum(axis=0, keepdims=True) / m.sum())[0]
    return (x @ cent.T).argmax(axis=1).astype(np.int64)


# -- product quantization (the IVF-PQ memory-scale path) -------------------------------
#
# At 10^12 vectors the raw float32 embeddings (256 B/row at d=64) cannot live in
# serving memory; PQ stores an m-byte code per vector (32x smaller at m=8) and ranks
# with asymmetric distance computation (ADC: per-query lookup tables, one table-gather
# per row — no float math against the corpus). Jegou, Douze, Schmid, "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011. The exact-rerank refine step
# fetches true vectors for the tiny ADC shortlist only.


def pq_train(
    sample: np.ndarray, m: int = 8, ksub: int = 64, iters: int = 10, seed: int = 0xC053
) -> np.ndarray:
    """Train m per-subspace codebooks ((m, ksub, d/m), deterministic k-means) on a
    bounded sample of NORMALIZED vectors. d must be divisible by m."""
    x = normalize(np.asarray(sample, np.float32))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    ksub = min(ksub, n)
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ksub, dsub), np.float32)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            # ||a-b||^2 ranking needs only -2ab + ||b||^2 (||a||^2 is per-row constant)
            dist = -2.0 * sub @ cent.T + (cent * cent).sum(1)[None, :]
            a = dist.argmin(1)
            for c in range(ksub):
                msk = a == c
                if msk.any():
                    cent[c] = sub[msk].mean(0)
        books[j] = cent
    return books


def pq_encode(embs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: nearest sub-centroid per subspace (input normalized here)."""
    x = normalize(np.asarray(embs, np.float32))
    m, ksub, dsub = books.shape
    codes = np.empty((len(x), m), np.uint8)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = books[j]
        dist = -2.0 * sub @ cent.T + (cent * cent).sum(1)[None, :]
        codes[:, j] = dist.argmin(1).astype(np.uint8)
    return codes


def pq_adc_tables(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, ksub) lookup tables of q_sub · centroid for one normalized query: the ADC
    approximate cosine of row i is tables[j, code[i, j]] summed over j."""
    m, ksub, dsub = books.shape
    q = normalize(np.asarray(query, np.float32).reshape(1, -1))[0]
    return np.einsum("mkd,md->mk", books, q.reshape(m, dsub))


class PQSearcher:
    """map_batches actor over the CODES table (vec_id, m-byte code): codebooks +
    queries broadcast once per actor; per batch, one uint8 table-gather per query
    ranks the whole batch without touching a float vector. Emits per-batch partial
    top-``shortlist`` rows for the exact-rerank refine step."""

    def __init__(self, books: np.ndarray, queries: np.ndarray, query_ids: np.ndarray,
                 shortlist: int = 50):
        self.books = np.asarray(books, np.float32)
        self.qids = np.asarray(query_ids, np.int64)
        self.tables = np.stack(
            [pq_adc_tables(q, self.books) for q in np.asarray(queries, np.float32)]
        )  # (nq, m, ksub)
        self.shortlist = shortlist
        self.m = self.books.shape[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes_col = batch["code"]
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        flat = np.frombuffer(b"".join(codes_col.to_pylist()), np.uint8) if (
            not isinstance(codes_col, pa.FixedSizeBinaryArray)
        ) else np.frombuffer(codes_col.buffers()[1], np.uint8)[
            codes_col.offset * self.m : (codes_col.offset + len(codes_col)) * self.m
        ]
        codes = flat.reshape(len(codes_col), self.m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        cols = np.arange(self.m)[None, :]
        for qi in range(len(self.qids)):
            scores = self.tables[qi][cols, codes].sum(1)  # (n,)
            k = min(self.shortlist, len(ids))
            top = np.argpartition(-scores, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            out_q.extend([int(self.qids[qi])] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(scores[top].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )
