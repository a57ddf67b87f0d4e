"""Distributed k-means (functions/similarity.py): equivalence with the single-process
Lloyd's reference, determinism, and purity against the synthetic ground-truth labels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from augdiff_pipeline_ray.functions import similarity as SIM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"])


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_local_reference(emb_table):
    import ray.data as rd

    t = emb_table
    ds = rd.from_arrow(t.select(["vec_id", "embedding"])).repartition(4)
    cent = SIM.kmeans_init(ds, k=10)
    cent = SIM.kmeans_iterate(ds, cent, iters=8)
    out = pa.concat_tables(
        list(SIM.kmeans_assign(ds, cent).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    got = dict(zip(out["vec_id"].to_pylist(), out["cluster"].to_pylist()))

    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    embs = SIM.embedding_matrix(t["embedding"])
    ref = SIM.kmeans_local_reference(embs, ids, k=10, iters=8)
    agree = np.mean([got[int(i)] == int(r) for i, r in zip(ids, ref)])
    # same float64 math; partial-fold order can flip only exact-boundary points
    assert agree >= 0.995, f"distributed vs local agreement {agree}"
    assert len(got) == len(ids)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_objective_improves_and_is_deterministic(emb_table):
    """The synthetic ``label`` column is NOT geometric (k-means purity vs label ≈
    chance, 0.17 for 10 balanced labels), so the quality invariants are internal:
    Lloyd's objective (mean max-cosine to the assigned centroid) must improve over
    the init, and two independent distributed runs must agree exactly."""
    import ray.data as rd

    t = emb_table
    ds = rd.from_arrow(t.select(["vec_id", "embedding"])).repartition(4)
    x = SIM.normalize(SIM.embedding_matrix(t["embedding"]).astype(np.float64))

    cent0 = SIM.kmeans_init(ds, k=10)
    cent = SIM.kmeans_iterate(ds, cent0, iters=8)
    obj0 = (x @ cent0.T).max(axis=1).mean()
    obj1 = (x @ cent.T).max(axis=1).mean()
    assert obj1 > obj0, f"objective did not improve: {obj0} -> {obj1}"

    out1 = pa.concat_tables(
        list(SIM.kmeans_assign(ds, cent).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    cent_b = SIM.kmeans_iterate(ds, SIM.kmeans_init(ds, k=10), iters=8)
    out2 = pa.concat_tables(
        list(SIM.kmeans_assign(ds, cent_b).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    d1 = dict(zip(out1["vec_id"].to_pylist(), out1["cluster"].to_pylist()))
    d2 = dict(zip(out2["vec_id"].to_pylist(), out2["cluster"].to_pylist()))
    assert d1 == d2


@pytest.mark.usefixtures("ray_session")
def test_kmeans_init_is_min_ids(emb_table):
    import ray.data as rd

    t = emb_table
    ds = rd.from_arrow(t.select(["vec_id", "embedding"])).repartition(3)
    cent = SIM.kmeans_init(ds, k=5)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")[:5]
    want = SIM.normalize(SIM.embedding_matrix(t["embedding"]).astype(np.float64)[order])
    assert np.allclose(cent, want)
