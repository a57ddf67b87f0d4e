"""HLL sketch invariants + as-of / range join vs brute force on synthetic events."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from augdiff_pipeline_ray.functions import sketch as SK

# ---------------------------------------------------------------------------
# HLL kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_hll_error_bound(n):
    rng = np.random.default_rng(7)
    # distinct keys with duplicates folded in: cardinality must be n regardless
    keys = rng.choice(np.arange(n, dtype=np.int64), size=3 * n, replace=True)
    keys = np.concatenate([np.arange(n, dtype=np.int64), keys])
    est = SK.estimate(SK.partial(keys))
    assert abs(est - n) / n < 0.05  # p=12 → 1.6% std error; 5% is > 3 sigma


def test_hll_merge_equals_single_pass():
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 10_000, size=50_000).astype(np.int64)
    whole = SK.partial(keys)
    parts = [SK.partial(c) for c in np.array_split(keys, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged = SK.merge(merged, p)
    np.testing.assert_array_equal(whole, merged)  # merge is exact, not approximate


def test_hll_empty_and_singleton():
    assert SK.estimate(SK.partial(np.array([], np.int64))) == 0.0
    est = SK.estimate(SK.partial(np.array([42], np.int64)))
    assert round(est) == 1


# ---------------------------------------------------------------------------
# bottom-k sample sketch
# ---------------------------------------------------------------------------


def test_bottomk_merge_equals_single_pass():
    rng = np.random.default_rng(5)
    keys = np.arange(100_000, dtype=np.int64)
    vals = rng.lognormal(0, 2, size=len(keys))
    h1, v1 = SK.bottomk_partial(keys, vals)
    hm, vm = np.empty(0, np.uint64), np.empty(0, np.float64)
    for ks, vs in zip(np.array_split(keys, 9), np.array_split(vals, 9)):
        h, v = SK.bottomk_partial(ks, vs)
        hm, vm = SK.bottomk_merge(hm, vm, h, v)
    # same sample regardless of batching: compare as sorted-by-hash sets
    np.testing.assert_array_equal(np.sort(h1), np.sort(hm))
    np.testing.assert_array_equal(v1[np.argsort(h1)], vm[np.argsort(hm)])


@pytest.mark.parametrize("q", [0.5, 0.95])
def test_bottomk_quantile_rank_error(q):
    rng = np.random.default_rng(13)
    keys = np.arange(500_000, dtype=np.int64)
    vals = rng.lognormal(0, 1, size=len(keys))  # heavy-tailed on purpose
    _, sample = SK.bottomk_partial(keys, vals, k=1024)
    est = SK.bottomk_quantile(sample, q)
    true_rank = np.searchsorted(np.sort(vals), est) / len(vals)
    assert abs(true_rank - q) < 0.05  # ~3 sigma at k=1024


# ---------------------------------------------------------------------------
# synthetic events world (written as sf_dir/events.parquet so the query
# entrypoints run on it unmodified)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    rng = np.random.default_rng(3)
    n = 4_000
    base = np.int64(1_700_000_000_000_000)  # µs epoch
    ts = base + np.sort(rng.integers(0, 14 * 86_400_000_000, size=n))
    # duplicate timestamps on purpose: as-of tie-break must be exercised
    ts[100:110] = ts[99]
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, 25, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "purchase", "signup", "view", "error"], size=n
            ),
            "value": np.round(rng.uniform(0, 100, size=n), 2),
            "props": ['{"k": 1}'] * n,
        }
    )
    d = tmp_path_factory.mktemp("events_world")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "events.parquet")
    return str(d), df


def _brute_asof(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    p = df[df.event_type == "purchase"]
    c = df[df.event_type == "click"]
    for _, r in p.iterrows():
        cand = c[(c.user_id == r.user_id) & (c.ts <= r.ts)]
        if not len(cand):
            continue
        best = cand.sort_values(["ts", "event_id"]).iloc[-1]
        rows.append(
            (r.event_id, r.user_id, best.event_id, best.value)
        )
    return (
        pd.DataFrame(rows, columns=["p_event_id", "user_id", "c_event_id", "c_value"])
        .sort_values("p_event_id")
        .reset_index(drop=True)
    )


def test_asof_join_matches_bruteforce(ray_session, events_dir):
    d, df = events_dir
    from augdiff_pipeline_ray.pipelines import tpch_queries as TQ

    got = (
        TQ.q_asof_join(d)
        .to_pandas()
        .sort_values("p_event_id")
        .reset_index(drop=True)
        .astype({"c_event_id": np.int64})
    )
    want = _brute_asof(df).astype(
        {"p_event_id": np.int64, "user_id": np.int64, "c_event_id": np.int64}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_range(df: pd.DataFrame) -> pd.DataFrame:
    W = pd.Timedelta(minutes=30)
    rows = []
    for _, r in df[df.event_type == "signup"].iterrows():
        n = len(
            df[(df.user_id == r.user_id) & (df.ts >= r.ts) & (df.ts < r.ts + W)]
        )
        rows.append((r.event_id, r.user_id, n))
    return (
        pd.DataFrame(rows, columns=["signup_id", "user_id", "n_events"])
        .sort_values("signup_id")
        .reset_index(drop=True)
    )


def test_range_join_matches_bruteforce(ray_session, events_dir):
    d, df = events_dir
    from augdiff_pipeline_ray.pipelines import tpch_queries as TQ

    res = TQ.q_range_join(d)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res).sort_values(
        "signup_id"
    ).reset_index(drop=True)
    want = _brute_range(df).astype(
        {"signup_id": np.int64, "user_id": np.int64, "n_events": np.int64}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantile_sketch_rank_error(ray_session, events_dir):
    """The query now emits a rank-error CERTIFICATE (oracle upgrade): every group
    must certify |true_rank − q| ≤ 0.05, and sample_n must equal min(k, group)."""
    d, df = events_dir
    from augdiff_pipeline_ray.pipelines import tpch_queries as TQ

    res = TQ.q_quantile_sketch(d)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res).set_index("event_type")
    assert got["p50_ok"].all() and got["p95_ok"].all()
    for t, g in df.groupby("event_type"):
        assert got.loc[t, "sample_n"] == min(1024, g["event_id"].nunique())


def test_hll_query_close_to_exact(ray_session, events_dir):
    """The query now emits an error-bound CERTIFICATE (oracle upgrade): within_tol
    is the 5% HLL bound vs the exact count, and exact_users matches pandas."""
    d, df = events_dir
    from augdiff_pipeline_ray.pipelines import tpch_queries as TQ

    res = TQ.q_hll_users_per_type(d)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res).set_index("event_type")
    assert got["within_tol"].all()
    exact = df.groupby("event_type")["user_id"].nunique()
    for t, n in exact.items():
        assert got.loc[t, "exact_users"] == n


# ---------------------------------------------------------------------------
# count-min sketch (heavy hitters)
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_merge_equals_single_pass():
    rng = np.random.default_rng(7)
    # zipf-ish: a few heavy keys + a long tail
    keys = np.concatenate(
        [np.repeat(np.arange(20, dtype=np.int64), 500),
         rng.integers(0, 1_000_000, 20_000).astype(np.int64)]
    )
    rng.shuffle(keys)
    parts = np.array_split(keys, 7)
    merged = SK.cms_partial(parts[0])
    for p in parts[1:]:
        merged = SK.cms_merge(merged, SK.cms_partial(p))
    single = SK.cms_partial(keys)
    assert (merged == single).all()
    uniq, true = np.unique(keys, return_counts=True)
    est = SK.cms_query(merged, uniq)
    assert (est >= true).all()  # the one-sided guarantee heavy_hitters relies on
    # heavy keys (500+ rows) are cleanly separated from tail overcounts
    assert (est[np.isin(uniq, np.arange(20))] >= 500).all()
    # overcount bounded: E[over] <= 2N/W per row, min over D rows is far tighter
    assert (est - true).max() <= 2 * len(keys) // SK.CMS_W + 64


def test_cms_empty_batch_is_identity():
    z = SK.cms_partial(np.empty(0, np.int64))
    assert z.shape == (SK.CMS_D, SK.CMS_W) and z.sum() == 0


# ---------------------------------------------------------------------------
# zip_with_index (global rank without driver materialization)
# ---------------------------------------------------------------------------


def test_zip_with_index_matches_sort_order(ray_session):
    import ray.data as rd

    from augdiff_pipeline_ray.stages.shuffle import zip_with_index

    rng = np.random.default_rng(3)
    vals = rng.permutation(5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(11)
    out = zip_with_index(ds.sort("v"), "rank").to_pandas().sort_values("rank")
    assert (out["v"].to_numpy() == np.arange(5000)).all()
    assert (out["rank"].to_numpy() == np.arange(5000)).all()


# ---------------------------------------------------------------------------
# deterministic weighted sampling (Efraimidis–Spirakis race)
# ---------------------------------------------------------------------------


def test_weighted_race_merge_equals_single_pass_and_weights_bias():
    rng = np.random.default_rng(11)
    ids = rng.permutation(200_000).astype(np.int64)
    w = np.ones(len(ids))
    heavy = ids % 1000 == 0  # 200 heavy ids
    w[heavy] = 500.0
    parts = np.array_split(np.arange(len(ids)), 17)
    r, i = SK.weighted_topk_partial(ids[parts[0]], w[parts[0]], 64)
    for p in parts[1:]:
        r2, i2 = SK.weighted_topk_partial(ids[p], w[p], 64)
        r, i = SK.weighted_topk_merge(r, i, r2, i2, 64)
    rl, il = SK.weighted_topk_partial(ids, w, 64)
    assert set(i.tolist()) == set(il.tolist())  # distributed == local, exactly
    # heavy ids carry ~1/3 of total weight → strongly over-represented vs 0.1%
    assert (np.asarray(i) % 1000 == 0).sum() >= 10


def test_weighted_sample_join_query_deterministic(ray_session):
    from augdiff_pipeline_ray.pipelines import tpch_queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.QUERIES["weighted_sample_join"](sf)
    b = Q.QUERIES["weighted_sample_join"](sf)
    pa_a = a.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    pa_b = b.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    assert pa_a.equals(pa_b)
    assert len(pa_a) == 100
    # matches the single-process race over the full table exactly
    import pyarrow.parquet as _pq

    t = _pq.read_table(f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    ids = t["o_orderkey"].to_numpy(zero_copy_only=False)
    w = t["o_totalprice"].to_numpy(zero_copy_only=False)
    rl, il = SK.weighted_topk_partial(ids, w, 100)
    assert set(pa_a["o_orderkey"]) == set(il.tolist())
