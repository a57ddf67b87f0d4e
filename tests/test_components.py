"""Connected components (stages/components.py): local fixpoint vs brute-force BFS vs
the distributed Dataset plan, plus the dup_clusters query's transitivity contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from augdiff_pipeline_ray.stages import components as CC


def brute_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """BFS min-label per component — the trusted tiny-scale answer."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[int, int] = {}
    seen: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp = [start]
        seen.add(start)
        stack = [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            out[u] = m
    return out


def as_dict(nodes: np.ndarray, clus: np.ndarray) -> dict[int, int]:
    return {int(n): int(c) for n, c in zip(nodes, clus)}


def test_local_chain_is_transitive():
    # a-b, b-c but never a-c: a real CC, not a group-by-equality
    edges = [(10, 11), (11, 12), (12, 13), (20, 21)]
    nodes, clus = CC.local_components_np(
        np.array([e[0] for e in edges]), np.array([e[1] for e in edges])
    )
    assert as_dict(nodes, clus) == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_local_cycles_and_self_edges():
    edges = [(1, 2), (2, 3), (3, 1), (5, 5), (7, 8), (8, 7)]
    nodes, clus = CC.local_components_np(
        np.array([e[0] for e in edges]), np.array([e[1] for e in edges])
    )
    got = as_dict(nodes, clus)
    assert got[1] == got[2] == got[3] == 1
    assert got[5] == 5
    assert got[7] == got[8] == 7


def test_local_empty():
    nodes, clus = CC.local_components_np(np.array([], np.int64), np.array([], np.int64))
    assert len(nodes) == 0 and len(clus) == 0


def test_local_matches_brute_force_random():
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(5, 400))
        m = int(rng.integers(1, 4 * n))
        a = rng.integers(0, n, m).astype(np.int64)
        b = rng.integers(0, n, m).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        nodes, clus = CC.local_components_np(a, b)
        assert as_dict(nodes, clus) == brute_components(list(zip(a.tolist(), b.tolist())))


def test_local_long_path_hits_log_rounds():
    # a 4096-node path is the worst case for naive min propagation (diameter 4095);
    # pointer jumping must still converge — and to the right labels
    n = 4096
    a = np.arange(n - 1, dtype=np.int64) + 1_000
    b = a + 1
    nodes, clus = CC.local_components_np(a, b)
    assert np.all(clus == 1_000)
    assert len(nodes) == n


@pytest.mark.usefixtures("ray_session")
def test_dataset_plan_matches_local():
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, m = 500, 900
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    edges = pa.table({"a": pa.array(a), "b": pa.array(b)})
    want = as_dict(*CC.local_components_np(a, b))

    out = CC.components_dataset(rd.from_arrow(edges).repartition(4), num_partitions=4)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    got = as_dict(
        t["node"].to_numpy(zero_copy_only=False), t["cluster"].to_numpy(zero_copy_only=False)
    )
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_components_auto_plans():
    # table below threshold → local pa.Table; above → Dataset (forced tiny threshold)
    edges = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([2, 3], pa.int64())})
    local = CC.components_auto(edges)
    assert isinstance(local, pa.Table)
    assert as_dict(
        local["node"].to_numpy(zero_copy_only=False),
        local["cluster"].to_numpy(zero_copy_only=False),
    ) == {1: 1, 2: 1, 3: 1}

    import ray.data as rd

    dist = CC.components_auto(rd.from_arrow(edges), local_threshold=1)
    assert isinstance(dist, rd.Dataset)
    t = pa.concat_tables(list(dist.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert as_dict(
        t["node"].to_numpy(zero_copy_only=False), t["cluster"].to_numpy(zero_copy_only=False)
    ) == {1: 1, 2: 1, 3: 1}


@pytest.mark.usefixtures("ray_session")
def test_dup_clusters_query_transitivity(tmp_path):
    """dup_clusters on a corpus where duplicate evidence only chains (A=B and B=C as
    pair rows) still labels the whole chain with one canonical id."""
    from augdiff_pipeline_ray.stages import components as CCm

    # direct check on the query's composition primitive: pairs → labels → fill singletons
    pairs_a = np.array([100, 101], np.int64)
    pairs_b = np.array([101, 102], np.int64)
    nodes, clus = CCm.local_components_np(pairs_a, pairs_b)
    all_ids = np.array([99, 100, 101, 102, 103], np.int64)
    cluster = all_ids.copy()
    pos = np.clip(np.searchsorted(nodes, all_ids), 0, len(nodes) - 1)
    hit = nodes[pos] == all_ids
    cluster[hit] = clus[pos[hit]]
    assert cluster.tolist() == [99, 100, 100, 100, 103]


@pytest.mark.usefixtures("ray_session")
def test_dataset_plan_high_diameter_with_contraction():
    """A 300-node path plus a 50-spoke star: the path stresses pointer jumping and
    edge contraction across many rounds; the star contracts away in round one."""
    import ray.data as rd

    pa_ = np.arange(299, dtype=np.int64) + 500
    pb_ = pa_ + 1
    sa = np.full(50, 5_000, np.int64)
    sb = np.arange(50, dtype=np.int64) + 5_001
    a = np.concatenate([pa_, sa])
    b = np.concatenate([pb_, sb])
    want = as_dict(*CC.local_components_np(a, b))
    out = CC.components_dataset(
        rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(2),
        num_partitions=2,
    )
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    got = as_dict(
        t["node"].to_numpy(zero_copy_only=False), t["cluster"].to_numpy(zero_copy_only=False)
    )
    assert got == want
    assert got[799] == 500 and got[5_050] == 5_000
