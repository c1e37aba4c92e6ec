"""Robust-stats wave: partition invariance and direct (pandas/numpy)
parity for Tukey outliers, day-parity drift, streaks, dense rank."""

import numpy as np
import pandas as pd

from associationabacminer_ray.pipelines import sequence as sq
from associationabacminer_ray.pipelines import temporal as tm


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def _events(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_value_outliers_direct(ray_session, sf_dir):
    got = tm.value_outliers(sf_dir, num_buckets=4).to_pandas()
    got2 = tm.value_outliers(sf_dir, num_buckets=32).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(got2))

    ev = _events(sf_dir).dropna(subset=["event_type", "value"])
    rows = []
    for et, g in ev.groupby("event_type"):
        v = np.sort(np.floor(g["value"].to_numpy() * 10000 + 0.5)
                    .astype(np.int64))
        n = len(v)
        q1 = v[int(np.floor(25 / 100.0 * (n - 1)))]
        q3 = v[int(np.floor(75 / 100.0 * (n - 1)))]
        rows.append((et, q1, q3, int((2 * v < 5 * q1 - 3 * q3).sum()),
                     int((2 * v > 5 * q3 - 3 * q1).sum()), n))
    want = pd.DataFrame(rows, columns=["event_type", "q1_bp", "q3_bp",
                                       "n_low", "n_high", "n_total"])
    for c in want.columns[1:]:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # fences are outside the box by construction
    assert (got["n_low"] + got["n_high"] <= got["n_total"] // 2).all()


def test_user_streaks_direct(ray_session, sf_dir):
    got = sq.user_streaks(sf_dir, num_buckets=1).to_pandas()
    got16 = sq.user_streaks(sf_dir, num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(got16))

    ev = _events(sf_dir).dropna(subset=["user_id", "ts"])
    day = (ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    d = pd.DataFrame({"user_id": ev["user_id"].astype(np.int64),
                      "day": day}).drop_duplicates()
    rows = []
    for uid, g in d.groupby("user_id"):
        days = np.sort(g["day"].to_numpy(np.int64))
        breaks = np.ones(len(days), bool)
        breaks[1:] = days[1:] != days[:-1] + 1
        island = np.cumsum(breaks)
        lens = np.bincount(island)[1:]
        rows.append((uid, len(days), len(lens), int(lens.max())))
    want = pd.DataFrame(rows, columns=["user_id", "n_active_days",
                                       "n_streaks", "longest_streak"])
    for c in want.columns:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # streak structure sanity
    assert (got["longest_streak"] <= got["n_active_days"]).all()
    assert (got["n_streaks"] <= got["n_active_days"]).all()


def test_type_drift_shares_bounded(ray_session, sf_dir):
    got = tm.type_drift(sf_dir)
    assert (got["share_diff_bp"] >= 0).all()
    assert (got["share_diff_bp"] <= 10000).all()
    ev = _events(sf_dir).dropna(subset=["event_type", "ts"])
    assert got["n_even"].sum() + got["n_odd"].sum() == len(ev)


def test_spend_dense_rank_properties(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.stats import q_spend_dense_rank

    got = _norm(q_spend_dense_rank(sf_dir).to_pandas())
    # dense ranks are 1..m with no gaps; equal spend ⇒ equal rank
    m = got["dense_rank"].max()
    assert set(got["dense_rank"].unique()) == set(range(1, m + 1))
    per_val = got.groupby("spend_cents")["dense_rank"].nunique()
    assert (per_val == 1).all()
    # cume_bp is monotone non-increasing in spend and caps at 10000
    top = got.sort_values("spend_cents", ascending=False)
    assert (np.diff(top["cume_bp"].to_numpy()) >= 0).all()
    assert got["cume_bp"].max() == 10000


def test_weighted_median_direct(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.stats import q_weighted_median

    got = _norm(q_weighted_median(sf_dir).to_pandas())
    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    ).to_pandas().dropna()
    li["v"] = np.floor(li["l_extendedprice"] * 100.0 + 0.5).astype(np.int64)
    rows = []
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("v")
        w = g["l_quantity"].to_numpy(np.int64)
        cw = np.cumsum(w)
        tw = cw[-1]
        med = g["v"].to_numpy(np.int64)[np.searchsorted(2 * cw, tw, "left")]
        rows.append((flag, med, tw))
    want = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_cents",
                                       "total_qty"]).astype(
        {"wmedian_cents": np.int64, "total_qty": np.int64})
    pd.testing.assert_frame_equal(got, _norm(want))


def test_spend_gini_bounds(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.stats import q_spend_gini

    got = q_spend_gini(sf_dir)
    g = int(got["gini_bp"].iloc[0])
    assert 0 <= g < 10000
    # direct recomputation with floats (sanity within 1 bp of truncation)
    import pyarrow.parquet as pq

    spend = (pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"])
             .to_pandas())
    spend["c"] = np.floor(spend["o_totalprice"] * 100.0 + 0.5).astype(np.int64)
    x = np.sort(spend.groupby("o_custkey")["c"].sum().to_numpy(np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    gini = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    assert abs(g - int(gini * 10000)) <= 1


def test_event_pairs_brute_force(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.sequence import (
        event_pairs_within,
    )

    got = _norm(event_pairs_within(sf_dir, num_buckets=1).to_pandas())
    got16 = _norm(event_pairs_within(sf_dir, num_buckets=16).to_pandas())
    pd.testing.assert_frame_equal(got, got16)

    ev = _events(sf_dir).dropna(
        subset=["user_id", "event_type", "ts", "event_id"])
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = pd.DataFrame({"u": ev["user_id"].astype(np.int64),
                       "t": ev["event_type"], "ts": ts,
                       "id": ev["event_id"].astype(np.int64)})
    from collections import Counter

    pairs = Counter()
    for _, g in ev.groupby("u"):
        g = g.sort_values(["ts", "id"]).reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if g["ts"][j] - g["ts"][i] > 3_600_000_000:
                    break
                pairs[(g["t"][i], g["t"][j])] += 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in pairs.items()],
        columns=["type_a", "type_b", "n_pairs"])
    want["n_pairs"] = want["n_pairs"].astype(np.int64)
    pd.testing.assert_frame_equal(got, _norm(want))


def test_zscore_outliers_direct(ray_session, sf_dir):
    got = _norm(tm.value_zscore_outliers(sf_dir))
    ev = _events(sf_dir).dropna(subset=["event_type", "value"])
    ev["v"] = np.floor(ev["value"] * 10000 + 0.5).astype(np.int64)
    rows = []
    for et, g in ev.groupby("event_type"):
        v = g["v"].to_numpy(np.int64)
        n, s, q = len(v), int(v.sum()), int((v.astype(object) ** 2).sum())
        var_num = n * q - s * s
        n_out = int(sum(1 for vi in v
                        if (int(vi) * n - s) ** 2 > 9 * var_num))
        # cross-check against the float z-score definition, skipping
        # values within float rounding of the exact 3σ boundary (the
        # integer form exists precisely because the float compare is
        # unreliable there)
        mean, sd = v.mean(), v.std()
        if sd > 0:
            z = np.abs(v - mean) / sd
            clear = np.abs(z - 3.0) > 1e-9
            n_float = int(((z > 3.0) & clear).sum())
            n_int_clear = int(sum(
                1 for vi, zc in zip(v, clear)
                if zc and (int(vi) * n - s) ** 2 > 9 * var_num))
            assert n_int_clear == n_float
        rows.append((et, n, s, n_out))
    want = pd.DataFrame(rows, columns=["event_type", "n_total",
                                       "sum_bp", "n_outliers"]).astype(
        {"n_total": np.int64, "sum_bp": np.int64, "n_outliers": np.int64})
    pd.testing.assert_frame_equal(got, _norm(want))


def test_hourly_share_sums(ray_session, sf_dir):
    got = tm.q_hourly_share(sf_dir).to_pandas()
    # shares per type sum to ~10000 (truncation loses < 24 bp)
    per_type = got.groupby("event_type")["share_bp"].sum()
    assert ((per_type > 10000 - 24) & (per_type <= 10000)).all()
    ev = _events(sf_dir).dropna(subset=["event_type", "ts"])
    assert got["n"].sum() == len(ev)


def test_token_len_hist_direct(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.terms import q_token_len_hist

    got = _norm(q_token_len_hist(sf_dir).to_pandas())
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).to_pandas()
    lens = pd.Series(
        [len(t) for txt in docs["text"].fillna("")
         for t in txt.split()]).value_counts().sort_index()
    want = pd.DataFrame({"token_len": lens.index.to_numpy(np.int64),
                         "n_tokens": lens.to_numpy(np.int64)})
    pd.testing.assert_frame_equal(got, _norm(want))


def test_moving_sum_direct(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.sequence import q_moving_sum

    got = _norm(q_moving_sum(sf_dir, num_buckets=1).to_pandas())
    got16 = _norm(q_moving_sum(sf_dir, num_buckets=16).to_pandas())
    pd.testing.assert_frame_equal(got, got16)

    ev = _events(sf_dir).dropna(subset=["event_id", "user_id", "ts",
                                        "value"])
    ev["c"] = np.floor(ev["value"] * 100.0 + 0.5).astype(np.int64)
    ev["ts_us"] = (ev["ts"].to_numpy().astype("datetime64[us]")
                   .astype(np.int64))
    ev = ev.sort_values(["user_id", "ts_us", "event_id"])
    ms = (ev.groupby("user_id")["c"]
          .rolling(3, min_periods=1).sum().reset_index(level=0, drop=True))
    want = pd.DataFrame({
        "event_id": ev["event_id"].astype(np.int64),
        "user_id": ev["user_id"].astype(np.int64),
        "moving_sum_cents": ms.astype(np.int64),
    })
    pd.testing.assert_frame_equal(got, _norm(want))


def test_orders_above_cust_avg_direct(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.olap import (
        q_orders_above_cust_avg,
    )

    got = _norm(q_orders_above_cust_avg(sf_dir).to_pandas())
    import pyarrow.parquet as pq

    o = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"]).to_pandas()
    o = o.dropna()
    o["cents"] = np.floor(o["o_totalprice"] * 100.0 + 0.5).astype(np.int64)
    gr = o.groupby("o_custkey")["cents"]
    n = gr.transform("size")
    s = gr.transform("sum")
    o["above"] = (o["cents"] * n > s).astype(np.int64)
    want = o.groupby("o_custkey").agg(
        n_orders=("cents", "size"),
        n_above_avg=("above", "sum")).reset_index().rename(
        columns={"o_custkey": "c_custkey"})
    for c in ("c_custkey", "n_orders", "n_above_avg"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, _norm(want))
    # a customer's strictly-above-average orders are never ALL of them
    # (with >1 order, at least one is <= the average; with exactly one
    # order, none exceeds its own average)
    assert ((got["n_above_avg"] < got["n_orders"])
            | (got["n_orders"] == 1)).all()
    assert (got.loc[got["n_orders"] == 1, "n_above_avg"] == 0).all()


def test_value_hour_corr_vs_numpy(ray_session):
    """The shuffle-free moments correlation must equal np.corrcoef /
    polyfit on the same folded data (one float op sequence, exact
    integer sums underneath)."""
    from associationabacminer_ray.pipelines.stats import q_value_hour_corr

    sf = "/root/testdata/sf0.01"
    got = q_value_hour_corr(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["value", "ts"])
    x = ev["ts"].dt.hour.to_numpy(np.int64)
    y = np.floor(ev["value"].to_numpy() * 10000 + 0.5).astype(np.int64)
    ref_corr = np.corrcoef(x, y)[0, 1]
    ref_slope = np.polyfit(x, y, 1)[0]
    assert int(got["n"][0]) == len(ev)
    # same statistic to within one bp of the float-library reference
    assert abs(int(got["corr_bp"][0]) - round(ref_corr * 10000)) <= 1
    assert abs(int(got["slope_bp"][0]) - round(ref_slope * 10000)) <= 1
