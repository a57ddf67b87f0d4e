"""Brute-force invariants for the geospatial vector queries (distance pair join,
density clustering) and the EMA recurrence scan. The DuckDB oracle compare is the
primary gate; these re-derive the answers independently (all-pairs numpy, sequential
recurrence loop) so the grid-join replication/canonical-bucket logic and the
closed-form scan can't drift."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _df(x):
    import ray

    if isinstance(x, ray.data.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    return x


@pytest.fixture(scope="module")
def centroids():
    from augdiff_pipeline_ray import georef
    from augdiff_pipeline_ray.pipelines import tpch as TP

    d = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    lat, lon = georef.centroid(TP.image_params(d.astype(np.int64))["phash"])
    return d.astype(np.int64), lat, lon


def _brute_pairs(d, lat, lon, R):
    ii, jj = np.triu_indices(len(d), k=1)
    d2 = (lat[ii] - lat[jj]) ** 2 + (lon[ii] - lon[jj]) ** 2
    keep = d2 < R * R
    a, b = d[ii[keep]], d[jj[keep]]
    sw = a > b
    a2 = np.where(sw, b, a)
    b2 = np.where(sw, a, b)
    return pd.DataFrame({"a": a2, "b": b2, "d2": d2[keep]}).sort_values(
        ["a", "b"]).reset_index(drop=True)


def test_spatial_pairs_match_all_pairs_brute_force(ray_session, centroids):
    from augdiff_pipeline_ray.pipelines.tpch_queries import (
        _SPATIAL_R,
        q_spatial_neighbor_pairs,
    )

    d, lat, lon = centroids
    want = _brute_pairs(d, lat, lon, _SPATIAL_R)
    got = _df(q_spatial_neighbor_pairs(SF)).sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
    assert np.allclose(got["d2"].to_numpy(), want["d2"].to_numpy(), rtol=0, atol=0)
    # exactly-once emission: the canonical-bucket rule needs no distinct pass
    assert not got.duplicated(["a", "b"]).any()


def test_spatial_pairs_cross_bucket_coverage(ray_session):
    # pairs whose members live in DIFFERENT home buckets (incl. mixed-sign diagonal
    # offsets) must be found — this is the case a naive home-vs-home join misses
    from augdiff_pipeline_ray.pipelines.tpch_queries import (
        _SPATIAL_R,
        q_spatial_neighbor_pairs,
    )
    from augdiff_pipeline_ray import georef
    from augdiff_pipeline_ray.pipelines import tpch as TP

    got = _df(q_spatial_neighbor_pairs(SF))
    ph_a = TP.image_params(got["a"].to_numpy(np.int64))["phash"]
    ph_b = TP.image_params(got["b"].to_numpy(np.int64))["phash"]
    la, lo = georef.centroid(ph_a)
    lb, lob = georef.centroid(ph_b)
    bxa, bya = np.floor(lo / _SPATIAL_R), np.floor(la / _SPATIAL_R)
    bxb, byb = np.floor(lob / _SPATIAL_R), np.floor(lb / _SPATIAL_R)
    cross = (bxa != bxb) | (bya != byb)
    assert cross.any(), "fixture too easy: every pair shares a home bucket"


def test_spatial_clusters_match_local_components(ray_session, centroids):
    from augdiff_pipeline_ray.pipelines.tpch_queries import (
        _SPATIAL_R,
        q_spatial_clusters,
    )

    d, lat, lon = centroids
    pairs = _brute_pairs(d, lat, lon, _SPATIAL_R)
    # min-label fixpoint over the brute-force graph
    lab = {int(i): int(i) for i in d}
    changed = True
    while changed:
        changed = False
        for a, b in zip(pairs["a"], pairs["b"]):
            m = min(lab[int(a)], lab[int(b)])
            if lab[int(a)] != m or lab[int(b)] != m:
                lab[int(a)] = lab[int(b)] = m
                changed = True
    got = _df(q_spatial_clusters(SF))
    assert len(got) == len(d)
    gm = dict(zip(got["doc_id"].astype(int), got["cluster_id"].astype(int)))
    assert gm == lab
    # non-degenerate at this sf: some clusters of size ≥ 2, some singletons
    sizes = pd.Series(list(lab.values())).value_counts()
    assert (sizes >= 2).any() and (sizes == 1).any()


def test_ema_matches_sequential_recurrence(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_ema_per_user

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    ).to_pandas()
    got = _df(q_ema_per_user(SF)).set_index("user_id")
    alpha = 0.25
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        e = None
        for v in g["value"].to_numpy(np.float64):
            e = v if e is None else alpha * v + (1 - alpha) * e
        assert got.loc[uid, "n_events"] == len(g)
        assert got.loc[uid, "ema"] == pytest.approx(e, rel=1e-9)
    assert len(got) == ev["user_id"].nunique()


def test_window_self_join_matches_nested_loop(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_window_self_join

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts"]
    ).to_pandas()
    ev["ms"] = ev["ts"].astype("datetime64[ms]").astype(np.int64)
    want = set()
    for _, g in ev.groupby("user_id"):
        rows = list(g[["event_id", "ms"]].itertuples(index=False))
        for a in rows:
            for b in rows:
                later = b.ms > a.ms or (b.ms == a.ms and a.event_id < b.event_id)
                if later and b.ms - a.ms <= 1_800_000:
                    want.add((int(a.event_id), int(b.event_id), int(b.ms - a.ms)))
    got = _df(q_window_self_join(SF))
    have = set(zip(got["e1"].astype(int), got["e2"].astype(int), got["dt_ms"].astype(int)))
    assert have == want and len(have) > 0


def test_domain_mix_resample_shifts_the_mixture(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_domain_mix_resample

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    got = _df(q_domain_mix_resample(SF))
    # deterministic: exact re-derivation of the per-source thresholds + hash filter
    n = docs.groupby("source").size()
    wt = pd.Series({s: 3.0 if int(s[3:]) % 2 == 0 else 1.0 for s in n.index})
    rate = np.minimum(1.0, (len(docs) * (wt / wt.sum())) / n)
    thr = np.floor(rate * 4294967296.0).astype(np.int64)
    h = (docs["doc_id"].to_numpy(np.int64) * np.int64(2654435761)) % np.int64(4294967296)
    keep = h < thr.reindex(docs["source"]).to_numpy(np.int64)
    assert set(got["doc_id"]) == set(docs["doc_id"].to_numpy()[keep])
    # the mixture actually moved: even sources kept whole, odd sources downsampled
    kept = got.groupby("source").size()
    even = [s for s in n.index if int(s[3:]) % 2 == 0]
    odd = [s for s in n.index if int(s[3:]) % 2 == 1]
    assert all(kept.get(s, 0) == n[s] for s in even)
    assert kept.reindex(odd).sum() < n.reindex(odd).sum()
