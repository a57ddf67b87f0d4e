"""Brute-force invariants for the analytics-widening queries (cube / set ops /
sufficient-statistics correlation / histogram / interpolated median / star-join
top-k / gap fill / entropy / running total). The DuckDB oracle compare is the
primary gate (tools/check_oracles.py, driver CORRECTNESS); these pin the
distributed plans against independent pandas/numpy re-derivations so a refactor
that breaks a combiner fails fast in pytest."""

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
def events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_cube_grouping_sets_consistent(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_cube_events

    out = _df(q_cube_events(SF))
    total = out[(out.event_type == "<all>") & (out.cohort == -1)]["n"].iloc[0]
    assert total == len(events)
    fine = out[(out.event_type != "<all>") & (out.cohort != -1)]
    assert fine["n"].sum() == total
    # each marginal re-sums the finest level exactly
    by_type = out[(out.event_type != "<all>") & (out.cohort == -1)]
    got = dict(zip(by_type.event_type, by_type.n))
    want = events.groupby("event_type").size().to_dict()
    assert got == want
    by_coh = out[(out.event_type == "<all>") & (out.cohort != -1)]
    got = dict(zip(by_coh.cohort, by_coh.n))
    want = (events.user_id % 4).value_counts().to_dict()
    assert got == {k: v for k, v in want.items()}


def test_set_ops_partition_the_click_set(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_set_except, q_set_intersect

    inter = set(_df(q_set_intersect(SF))["user_id"])
    exc = set(_df(q_set_except(SF))["user_id"])
    big = events[events.value > 200]
    clicks = set(big[big.event_type == "click"]["user_id"])
    purch = set(big[big.event_type == "purchase"]["user_id"])
    assert inter == clicks & purch
    assert exc == clicks - purch
    assert not (inter & exc)  # disjoint by construction
    assert inter | exc == clicks  # together they partition the click set


def test_corr_matches_numpy_corrcoef(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_corr_dollars_hour

    out = _df(q_corr_dollars_hour(SF)).set_index("event_type")["corr_xy"]
    for et, g in events.groupby("event_type"):
        x = np.floor(g["value"].to_numpy(np.float64))
        y = g["ts"].dt.hour.to_numpy(np.float64)
        np.testing.assert_allclose(out[et], np.corrcoef(x, y)[0, 1], rtol=1e-12)


def test_histogram_total_and_bins(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_histogram_value

    out = _df(q_histogram_value(SF))
    assert out["n"].sum() == len(events)
    want = pd.Series(np.floor(events.value / 25).astype(np.int64)).value_counts()
    got = dict(zip(out.bin, out.n))
    assert got == want.to_dict()


def test_median_cont_matches_numpy_linear(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_median_cont

    out = _df(q_median_cont(SF)).set_index("event_type")["med_cents"]
    for et, g in events.groupby("event_type"):
        cents = np.floor(g["value"].to_numpy(np.float64) * 100).astype(np.int64)
        assert out[et] == np.quantile(cents, 0.5, method="linear")


def test_star_join_topk_matches_pandas(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_star_join_topk

    out = _df(q_star_join_topk(SF)).reset_index(drop=True)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cut = pd.Timestamp("1997-06-30")
    o = orders[
        (orders.o_orderdate < cut)
        & orders.o_custkey.isin(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
    ]
    l = li[li.l_shipdate > cut].copy()
    l["rev"] = np.floor(
        l.l_extendedprice.to_numpy() * (1 - l.l_discount.to_numpy()) * 100
    ).astype(np.int64)
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    want = (
        j.groupby(["l_orderkey", "o_orderdate"], as_index=False)["rev"]
        .sum()
        .rename(columns={"rev": "revenue_cents"})
        .sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["l_orderkey", "revenue_cents", "o_orderdate"]],
        want[["l_orderkey", "revenue_cents", "o_orderdate"]],
    )


def test_daily_gapfill_is_contiguous_and_total_preserving(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_daily_gapfill

    out = _df(q_daily_gapfill(SF))
    days = pd.to_datetime(out.day)
    assert (days.diff().dropna() == pd.Timedelta(days=1)).all()  # no gaps in the spine
    assert out["n"].sum() == len(events)
    assert days.min() == events.ts.min().normalize()
    assert days.max() == events.ts.max().normalize()


def test_entropy_bounds_and_exact_value(ray_session):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_entropy_by_source

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = _df(q_entropy_by_source(SF)).set_index("source")["lang_entropy"]
    n_lang = docs.lang.nunique()
    assert ((out >= 0) & (out <= np.log2(n_lang) + 1e-12)).all()
    for src, g in docs.groupby("source"):
        p = g.lang.value_counts(normalize=True).to_numpy()
        np.testing.assert_allclose(out[src], -(p * np.log2(p)).sum(), rtol=1e-12)


def test_running_total_last_row_equals_group_sum(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_running_total

    out = _df(q_running_total(SF))
    cents = np.floor(events.value.to_numpy(np.float64) * 100).astype(np.int64)
    want = pd.Series(cents).groupby(events.user_id).sum()
    # the max over a user's prefix sums is the final (full-history) sum
    got = out.groupby("user_id")["run_cents"].max()
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_full_outer_join_null_sides(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_full_outer_spenders

    out = _df(q_full_outer_spenders(SF))
    cents = np.floor(events.value.to_numpy(np.float64) * 100).astype(np.int64)
    df = events.assign(cents=cents)

    def heavy(et):
        s = df[df.event_type == et].groupby("user_id")["cents"].sum()
        return s[s > 70000]

    a, b = heavy("click"), heavy("purchase")
    assert set(out.user_id) == set(a.index) | set(b.index)
    for _, r in out.iterrows():
        uid = r.user_id
        assert (np.isnan(r.click_cents) and uid not in a.index) or r.click_cents == a[uid]
        assert (
            np.isnan(r.purchase_cents) and uid not in b.index
        ) or r.purchase_cents == b[uid]
    # both exclusive sides genuinely exercised
    assert out.click_cents.isna().any() and out.purchase_cents.isna().any()


def test_interval_coverage_matches_brute_force(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_interval_coverage

    out = _df(q_interval_coverage(SF)).set_index("user_id")["covered_ms"]
    FIVE = 5 * 60 * 1_000_000
    for uid, g in events.groupby("user_id"):
        us = np.sort(g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1_000)
        # brute force: merge intervals with a plain python sweep
        total, cur_s, cur_e = 0, None, None
        for s in us:
            e = s + FIVE
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total += cur_e // 1_000 - cur_s // 1_000
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        total += cur_e // 1_000 - cur_s // 1_000
        assert out[uid] == total
    # coverage can never exceed (count * 5 min) nor fall below 5 min
    n = events.groupby("user_id").size()
    assert (out <= n * 300_000).all() and (out >= 300_000).all()


def test_funnel_conversion_matches_brute_force(ray_session, events):
    from augdiff_pipeline_ray.pipelines.tpch_queries import q_funnel_conversion

    out = _df(q_funnel_conversion(SF)).set_index("user_id")["converted"]
    HOUR = 3_600 * 1_000_000
    for uid, g in events.groupby("user_id"):
        us = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1_000
        et = g["event_type"].to_numpy()
        want = int(
            any(
                (p > c) and (p <= c + HOUR)
                for c in us[et == "click"]
                for p in us[et == "purchase"]
            )
        )
        assert out[uid] == want
    assert set(out.unique()) == {0, 1}  # non-degenerate on this world
