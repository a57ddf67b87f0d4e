"""PageRank: distributed Dataset plan == local numpy power iteration, plus
closed-form sanity on a star graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from augdiff_pipeline_ray.stages import pagerank as PR


def test_star_graph_closed_form():
    # n spokes all linking to one hub; hub has no out-edges (dangling)
    n_spokes = 10
    a = np.arange(1, n_spokes + 1, dtype=np.int64)
    b = np.zeros(n_spokes, np.int64)
    nodes, rank = PR.pagerank_numpy(a, b, rounds=200)
    n = n_spokes + 1
    assert abs(rank.sum() - 1.0) < 1e-9  # rank is a distribution
    hub = rank[nodes == 0][0]
    spoke = rank[nodes == 1][0]
    assert hub > 5 * spoke  # all mass points at the hub
    # closed form: spoke = (1-d)/n + d*hub/n (hub's dangling mass redistributes)
    d = PR.DAMPING
    assert abs(spoke - ((1 - d) / n + d * hub / n)) < 1e-9


def test_rank_is_probability_distribution():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 200, 1000).astype(np.int64)
    b = rng.integers(0, 200, 1000).astype(np.int64)
    nodes, rank = PR.pagerank_numpy(a, b)
    assert abs(rank.sum() - 1.0) < 1e-9
    assert (rank > 0).all()


def test_dataset_plan_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    a = rng.integers(0, 300, 2000).astype(np.int64)
    b = rng.integers(0, 300, 2000).astype(np.int64)
    edges = rd.from_arrow(pa.table({"a": a, "b": b})).repartition(5)
    out = PR.pagerank_dataset(edges, rounds=8).to_pandas().sort_values("node")
    nodes, rank = PR.pagerank_numpy(a, b, rounds=8)
    assert (out["node"].to_numpy() == nodes).all()
    np.testing.assert_allclose(out["rank"].to_numpy(), rank, rtol=1e-9, atol=1e-12)


def test_auto_threshold_paths_agree(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 300).astype(np.int64)
    b = rng.integers(0, 50, 300).astype(np.int64)
    edges = rd.from_arrow(pa.table({"a": a, "b": b}))
    n1, r1 = PR.pagerank_auto(edges, local_threshold=10**9, rounds=6)
    n2, r2 = PR.pagerank_auto(edges, local_threshold=0, rounds=6)
    assert (n1 == n2).all()
    np.testing.assert_allclose(r1, r2, rtol=1e-9, atol=1e-12)
