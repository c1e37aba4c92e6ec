"""Semantics tests for pipelines.sequence (LAG gaps, trajectory
strings, prefix frequency) and pipelines.olap (per-group top-N, pivot,
anti-join, ROLLUP, set difference) on crafted corner-case corpora —
the gate parity at sf0.001/sf0.01 lives in test_oracle_parity.py;
these pin edge behaviors the natural data never exercises (ties,
singleton groups, bucket-count invariance, empty pivot cells)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("us")),
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_tpch(tmp_path, customers, orders):
    cdf = pd.DataFrame(customers, columns=["c_custkey", "c_name",
                                           "c_nationkey", "c_acctbal",
                                           "c_mktsegment"])
    pq.write_table(pa.Table.from_pandas(cdf, preserve_index=False),
                   str(tmp_path / "customer.parquet"))
    odf = pd.DataFrame(orders, columns=["o_orderkey", "o_custkey",
                                        "o_orderstatus", "o_totalprice",
                                        "o_orderdate", "o_orderpriority"])
    t = pa.Table.from_pandas(odf, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("o_orderdate"),
                     pa.field("o_orderdate", pa.timestamp("us")),
                     t["o_orderdate"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


TS0 = pd.Timestamp("2024-01-10")
SEC = pd.Timedelta(seconds=1)


# ------------------------------------------------------------------ sequence
def test_gaps_tiebreak_and_first_dropped(ray_session, tmp_path):
    """Equal timestamps order by event_id; each user's first event has
    no predecessor and is dropped."""
    from associationabacminer_ray.pipelines.sequence import user_event_gaps

    sf = _write_events(tmp_path, [
        (3, TS0, 1, "a", 1.0, "k1"),          # same ts as id 2 -> after it
        (2, TS0, 1, "a", 1.0, "k1"),
        (5, TS0 + SEC, 1, "a", 1.0, "k1"),
        (9, TS0, 2, "a", 1.0, "k1"),          # singleton user -> dropped
    ])
    got = (user_event_gaps(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [3, 5]
    assert got["prev_event_id"].tolist() == [2, 3]
    assert got["gap_us"].tolist() == [0, 1_000_000]


def test_gaps_bucket_count_invariance(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.sequence import user_event_gaps

    rows = [(i, TS0 + (i % 7) * SEC, i % 5, "a", 1.0, "k1")
            for i in range(40)]
    sf = _write_events(tmp_path, rows)
    a = (user_event_gaps(sf, num_buckets=1).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (user_event_gaps(sf, num_buckets=16).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_paths_order_and_singleton(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.sequence import user_paths

    sf = _write_events(tmp_path, [
        (2, TS0, 1, "view", 1.0, "k1"),
        (1, TS0, 1, "click", 1.0, "k1"),      # same ts: id 1 first
        (3, TS0 + SEC, 1, "buy", 1.0, "k1"),
        (9, TS0, 2, "solo", 1.0, "k1"),
    ])
    got = (user_paths(sf).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got["path"].tolist() == ["click>view>buy", "solo"]
    assert got["n_steps"].tolist() == [3, 1]


def test_top_paths_prefix_and_tiebreak(ray_session, tmp_path):
    """Paths longer than 5 steps count by their 5-step prefix; equal
    counts order by path ASC."""
    from associationabacminer_ray.pipelines.sequence import top_paths

    rows = []
    eid = 0
    # users 1,2: same 6-step sequence differing only at step 6
    for u, last in [(1, "x"), (2, "y")]:
        for i, t in enumerate(["a", "b", "c", "d", "e", last]):
            rows.append((eid, TS0 + i * SEC, u, t, 1.0, "k1"))
            eid += 1
    # user 3: short path 'z'
    rows.append((eid, TS0, 3, "z", 1.0, "k1"))
    sf = _write_events(tmp_path, rows)
    got = top_paths(sf).to_pandas().reset_index(drop=True)
    assert got["path"].tolist() == ["a>b>c>d>e", "z"]
    assert got["n_users"].tolist() == [2, 1]


# ---------------------------------------------------------------------- olap
def test_segment_top_orders_ties_and_small_groups(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import segment_top_orders

    sf = _write_tpch(
        tmp_path,
        customers=[(1, "ca", 0, 0.0, "SEG1"), (2, "cb", 0, 0.0, "SEG1"),
                   (3, "cc", 0, 0.0, "SEG2")],
        orders=[
            # SEG1: tie at 100.00 -> orderkey ASC; 4 orders -> top 3
            (11, 1, "O", 100.0, TS0, "P"),
            (12, 2, "O", 100.0, TS0, "P"),
            (13, 1, "O", 50.0, TS0, "P"),
            (14, 2, "O", 25.0, TS0, "P"),
            # SEG2: only one order -> rank 1 alone
            (21, 3, "O", 10.0, TS0, "P"),
        ])
    got = (segment_top_orders(sf).to_pandas()
           .sort_values(["c_mktsegment", "rank"]).reset_index(drop=True))
    seg1 = got[got["c_mktsegment"] == "SEG1"]
    assert seg1["o_orderkey"].tolist() == [11, 12, 13]
    assert seg1["rank"].tolist() == [1, 2, 3]
    seg2 = got[got["c_mktsegment"] == "SEG2"]
    assert seg2["o_orderkey"].tolist() == [21]


def test_type_hour_pivot_zero_cells(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import type_hour_pivot

    sf = _write_events(tmp_path, [
        (1, pd.Timestamp("2024-01-10 00:30:00"), 1, "a", 1.0, "k1"),
        (2, pd.Timestamp("2024-01-10 00:45:00"), 1, "a", 1.0, "k1"),
        (3, pd.Timestamp("2024-01-10 23:15:00"), 1, "b", 1.0, "k1"),
    ])
    got = (type_hour_pivot(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    assert got.shape == (2, 25)
    assert got.loc[0, "h0"] == 2 and got.loc[0, "h23"] == 0
    assert got.loc[1, "h23"] == 1 and got.loc[1, "h0"] == 0
    assert int(got[[f"h{h}" for h in range(24)]].to_numpy().sum()) == 3


def test_inactive_customers_cutoff(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import inactive_customers

    old = pd.Timestamp("1999-06-01")
    new = pd.Timestamp("2000-06-01")
    sf = _write_tpch(
        tmp_path,
        customers=[(1, "only-old", 0, 0.0, "S"),
                   (2, "has-recent", 0, 0.0, "S"),
                   (3, "no-orders", 0, 0.0, "S")],
        orders=[(11, 1, "O", 1.0, old, "P"),
                (12, 2, "O", 1.0, old, "P"),
                (13, 2, "O", 1.0, new, "P")])
    got = (inactive_customers(sf).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert got["c_custkey"].tolist() == [1, 3]
    assert got["c_name"].tolist() == ["only-old", "no-orders"]


def test_daily_rollup_levels_consistent(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import daily_rollup

    sf = _write_events(tmp_path, [
        (1, pd.Timestamp("2024-01-10 01:00"), 1, "a", 1.0, "k1"),
        (2, pd.Timestamp("2024-01-10 02:00"), 1, "a", 1.0, "k1"),
        (3, pd.Timestamp("2024-01-11 01:00"), 1, "a", 1.0, "k1"),
        (4, pd.Timestamp("2024-01-10 01:00"), 1, "b", 1.0, "k1"),
    ])
    got = daily_rollup(sf)
    finest = got[(got["event_type"] != "ALL") & (got["day_num"] >= 0)]
    subtot = got[(got["event_type"] != "ALL") & (got["day_num"] == -1)]
    total = got[got["event_type"] == "ALL"]
    assert len(finest) == 3 and len(subtot) == 2 and len(total) == 1
    assert int(total["n"].iloc[0]) == 4
    a_sub = int(subtot.loc[subtot["event_type"] == "a", "n"].iloc[0])
    assert a_sub == int(finest.loc[finest["event_type"] == "a", "n"].sum()) == 3


def test_user_set_diff_membership(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import user_set_diff

    sf = _write_events(tmp_path, [
        (1, TS0, 1, "a", 1.0, "key 1 x"),   # user 1: k1 only -> kept
        (2, TS0, 2, "a", 1.0, "key 1 x"),   # user 2: k1 and k2 -> dropped
        (3, TS0, 2, "a", 1.0, "key 2 x"),
        (4, TS0, 3, "a", 1.0, "key 2 x"),   # user 3: k2 only -> dropped
        (5, TS0, 4, "a", 1.0, "key 3 x"),   # user 4: neither -> dropped
    ])
    got = user_set_diff(sf).to_pandas()
    assert got["user_id"].tolist() == [1]


def test_type_transitions_order_and_singletons(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.sequence import type_transitions

    sf = _write_events(tmp_path, [
        (2, TS0, 1, "a", 1.0, "k1"),
        (1, TS0, 1, "b", 1.0, "k1"),       # same ts: id 1 first -> b>a
        (3, TS0 + SEC, 1, "a", 1.0, "k1"),  # a>a
        (9, TS0, 2, "solo", 1.0, "k1"),     # singleton: no transition
    ])
    got = (type_transitions(sf).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    assert got[["prev_type", "next_type"]].values.tolist() == [
        ["a", "a"], ["b", "a"]]
    assert got["n"].tolist() == [1, 1]


def test_bigram_counts_doc_boundary_and_ties(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from associationabacminer_ray.pipelines.terms import bigram_counts

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["x y z", "z X y", "solo", None],
        "lang": ["en"] * 4, "source": ["s"] * 4, "n_chars": [5] * 4,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = bigram_counts(str(tmp_path)).to_pandas().reset_index(drop=True)
    # 'x y' appears in both docs (lowercased); 'z x' does NOT cross the
    # doc-1/doc-2 boundary; 'solo' and None yield nothing
    assert got["bigram"].tolist() == ["x y", "y z", "z x"]
    assert got["n"].tolist() == [2, 1, 1]


def test_rolling_active_users_dedup_and_boundary(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.temporal import (
        rolling_active_users)

    D = pd.Timedelta(days=1)
    sf = _write_events(tmp_path, [
        # user 1 active twice on day 0 (must count once) and on day 6
        (1, TS0, 1, "a", 1.0, "k1"),
        (2, TS0 + pd.Timedelta(hours=3), 1, "a", 1.0, "k1"),
        (3, TS0 + 6 * D, 1, "a", 1.0, "k1"),
        # user 2 active on day 0 only: inside day-6 window (d-6..d),
        # outside day-7's
        (4, TS0, 2, "a", 1.0, "k1"),
        # user 3 creates day 7 so the boundary is observable
        (5, TS0 + 7 * D, 3, "a", 1.0, "k1"),
    ])
    got = (rolling_active_users(sf).to_pandas()
           .sort_values("day_num").reset_index(drop=True))
    d0 = int(got["day_num"].iloc[0])
    assert got["day_num"].tolist() == [d0, d0 + 6, d0 + 7]
    # day 0: users {1,2}; day 6: {1 (both day-0 and day-6), 2}; day 7:
    # {1 (day-6 activity), 3} — user 2's day-0 is out of range
    assert got["n_active"].tolist() == [2, 2, 2]


def test_day_num_trunc_matches_duckdb_pre_1970():
    """Engine day bucketing must use DuckDB's '//' semantics (trunc
    toward zero), not numpy floor — divergence only shows pre-1970."""
    import duckdb
    from associationabacminer_ray.pipelines.temporal import day_num_trunc

    ts = np.array([-7 * 86_400_000_000 // 2,   # mid-day pre-1970
                   -1, 0, 1,
                   5 * 86_400_000_000 + 123], np.int64)
    want = [duckdb.sql(f"SELECT {int(v)} // 86400000000").fetchone()[0]
            for v in ts]
    assert day_num_trunc(ts).tolist() == want


def test_top_paths_separator_in_type(ray_session, tmp_path):
    """A '>' inside an event_type must not shift the prefix boundary:
    truncation happens on event rows, before joining (oracle rn<=5)."""
    from associationabacminer_ray.pipelines.sequence import top_paths

    rows = [(i, TS0 + i * SEC, 1, t, 1.0, "k1")
            for i, t in enumerate(["a>b", "c", "d", "e", "f", "g"])]
    sf = _write_events(tmp_path, rows)
    got = top_paths(sf).to_pandas()
    # 5 EVENTS -> 'a>b', 'c', 'd', 'e', 'f' (six '>'-separated tokens)
    assert got["path"].tolist() == ["a>b>c>d>e>f"]


def test_funnel_strict_order_and_ties(ray_session, tmp_path):
    """Steps must advance strictly in time: same-ts view does not
    count; a view BEFORE signup does not count; purchase needs a valid
    view first."""
    from associationabacminer_ray.pipelines.sequence import funnel_counts

    D = pd.Timedelta(minutes=1)
    sf = _write_events(tmp_path, [
        # user 1: full ordered funnel
        (1, TS0, 1, "signup", 1.0, "k1"),
        (2, TS0 + D, 1, "view", 1.0, "k1"),
        (3, TS0 + 2 * D, 1, "purchase", 1.0, "k1"),
        # user 2: view at the SAME ts as signup -> step 2 not reached
        (4, TS0, 2, "signup", 1.0, "k1"),
        (5, TS0, 2, "view", 1.0, "k1"),
        (6, TS0 + D, 2, "purchase", 1.0, "k1"),  # purchase w/o view: no
        # user 3: view BEFORE signup only -> step 2 not reached
        (7, TS0 + D, 3, "signup", 1.0, "k1"),
        (8, TS0, 3, "view", 1.0, "k1"),
        # user 4: second view after signup rescues the funnel
        (9, TS0 + D, 4, "signup", 1.0, "k1"),
        (10, TS0, 4, "view", 1.0, "k1"),
        (11, TS0 + 2 * D, 4, "view", 1.0, "k1"),
        (12, TS0 + 3 * D, 4, "purchase", 1.0, "k1"),
    ])
    got = (funnel_counts(sf).to_pandas()
           .sort_values("step").reset_index(drop=True))
    assert got["step_type"].tolist() == ["signup", "view", "purchase"]
    assert got["n_users"].tolist() == [4, 2, 2]


def test_customer_order_counts_zero_fill(ray_session, tmp_path):
    from associationabacminer_ray.pipelines.olap import customer_order_counts

    sf = _write_tpch(
        tmp_path,
        customers=[(1, "a", 0, 0.0, "S"), (2, "b", 0, 0.0, "S"),
                   (3, "c", 0, 0.0, "S")],
        orders=[(11, 1, "O", 1.0, TS0, "P"),
                (12, 1, "O", 1.0, TS0, "P"),
                (13, 2, "O", 1.0, TS0, "P")])
    got = (customer_order_counts(sf).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert got["c_custkey"].tolist() == [1, 2, 3]
    assert got["n_orders"].tolist() == [2, 1, 0]


def test_funnel_empty_input_keeps_step_rows(ray_session, tmp_path):
    """Empty (or fully null-dropped) input must still yield one row
    per step with n_users=0 — the oracle's COUNT(*) subqueries always
    produce their rows."""
    from associationabacminer_ray.pipelines.sequence import funnel_counts

    sf = _write_events(tmp_path, [])
    got = (funnel_counts(sf).to_pandas()
           .sort_values("step").reset_index(drop=True))
    assert got["step_type"].tolist() == ["signup", "view", "purchase"]
    assert got["n_users"].tolist() == [0, 0, 0]


def test_customer_order_counts_duplicate_left_keys(ray_session, tmp_path):
    """A duplicated customer key must produce ONE output row (the
    oracle GROUP BYs the key)."""
    from associationabacminer_ray.pipelines.olap import customer_order_counts

    sf = _write_tpch(
        tmp_path,
        customers=[(7, "dup-a", 0, 0.0, "S"), (7, "dup-b", 0, 0.0, "S")],
        orders=[(11, 7, "O", 1.0, TS0, "P"),
                (12, 7, "O", 1.0, TS0, "P"),
                (13, 7, "O", 1.0, TS0, "P")])
    got = customer_order_counts(sf).to_pandas()
    assert got["c_custkey"].tolist() == [7]
    assert got["n_orders"].tolist() == [3]


def test_conversion_gaps_and_quantiles(ray_session, tmp_path):
    """Gap = chain completion minus FIRST signup (not the rescue
    view's ts); single-gap corpus puts every quantile at that value."""
    from associationabacminer_ray.pipelines.sequence import (
        conversion_time_quantiles, user_conversion_gaps)

    D = pd.Timedelta(minutes=1)
    sf = _write_events(tmp_path, [
        (1, TS0, 1, "signup", 1.0, "k1"),
        (2, TS0 + D, 1, "view", 1.0, "k1"),
        (3, TS0 + 3 * D, 1, "purchase", 1.0, "k1"),
        # user 2 never completes -> no gap row
        (4, TS0, 2, "signup", 1.0, "k1"),
    ])
    gaps = user_conversion_gaps(sf).to_pandas()
    assert gaps["user_id"].tolist() == [1]
    assert gaps["gap_us"].tolist() == [180_000_000]
    q = (conversion_time_quantiles(sf).to_pandas()
         .sort_values("q_pct").reset_index(drop=True))
    assert q["q_pct"].tolist() == [25, 50, 75, 90, 99]
    assert set(q["gap_s"]) == {180}


def test_conversion_quantiles_empty(ray_session, tmp_path):
    """No completed chains -> empty output on both sides (the oracle's
    rank join matches nothing when n=0)."""
    from associationabacminer_ray.pipelines.sequence import (
        conversion_time_quantiles)

    sf = _write_events(tmp_path, [(1, TS0, 1, "signup", 1.0, "k1")])
    got = conversion_time_quantiles(sf).to_pandas()
    assert len(got) == 0


def test_cohort_retention_dedup_and_offsets(ray_session, tmp_path):
    """A user active twice in one week counts once per (cohort,
    offset); cohorts anchor at each user's FIRST week."""
    from associationabacminer_ray.pipelines.temporal import cohort_retention

    W = pd.Timedelta(days=7)
    # epoch weeks are Thursday-aligned (1970-01-01); 2024-01-04 is a
    # Thursday, so base and base+1day share a week
    base = pd.Timestamp("2024-01-04")
    sf = _write_events(tmp_path, [
        # user 1: weeks 0 and 2 (twice in week 0)
        (1, base, 1, "a", 1.0, "k1"),
        (2, base + pd.Timedelta(days=1), 1, "a", 1.0, "k1"),
        (3, base + 2 * W, 1, "a", 1.0, "k1"),
        # user 2: joins a week later, active weeks 1 and 2
        (4, base + W, 2, "a", 1.0, "k1"),
        (5, base + 2 * W, 2, "a", 1.0, "k1"),
    ])
    got = (cohort_retention(sf).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    w0 = int(got["cohort_week"].min())
    rows = [(int(r.cohort_week) - w0, int(r.week_offset), int(r.n_users))
            for r in got.itertuples()]
    assert rows == [(0, 0, 1), (0, 2, 1), (1, 0, 1), (1, 1, 1)]


# -------------------------------------------------- sequential pair support
def test_seq_pair_support_gaps_strictness_and_selfpair(ray_session,
                                                       tmp_path):
    """Pairs count with GAPS (a … b with events between), equal-ts
    pairs do NOT count (strictly before), self-pairs (a, a) are
    excluded, and a user counts once per pair no matter how many
    witnessing event pairs exist."""
    from associationabacminer_ray.pipelines.sequence import seq_pair_support

    sf = _write_events(tmp_path, [
        # user 7: a .. c .. b  (a<b with a gap), plus a second b
        (1, TS0, 7, "a", 0.0, "{}"),
        (2, TS0 + 5 * SEC, 7, "c", 0.0, "{}"),
        (3, TS0 + 9 * SEC, 7, "b", 0.0, "{}"),
        (4, TS0 + 12 * SEC, 7, "b", 0.0, "{}"),
        # user 8: x and y at the SAME instant — strictly-before fails
        (5, TS0, 8, "x", 0.0, "{}"),
        (6, TS0, 8, "y", 0.0, "{}"),
        # user 9: two a's — self-pair must not appear
        (7, TS0, 9, "a", 0.0, "{}"),
        (8, TS0 + SEC, 9, "a", 0.0, "{}"),
    ])
    out = seq_pair_support(sf)
    got = {(r.antecedent, r.consequent): int(r.n_users)
           for r in out.itertuples()}
    assert got == {("a", "c"): 1, ("a", "b"): 1, ("c", "b"): 1}


def test_seq_pair_support_matches_bruteforce_random(ray_session, tmp_path):
    """Randomized parity vs a brute-force pandas recomputation (the SQL
    oracle's definition) on a corpus wide enough to split across
    batches and buckets."""
    from associationabacminer_ray.pipelines.sequence import seq_pair_support

    rng = np.random.default_rng(17)
    n = 600
    rows = [(i,
             TS0 + int(rng.integers(0, 10_000)) * SEC,
             int(rng.integers(0, 25)),
             "t" + str(int(rng.integers(0, 6))),
             0.0, "{}") for i in range(n)]
    sf = _write_events(tmp_path, rows)
    got = seq_pair_support(sf, num_buckets=5)

    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    ft = (df.groupby(["user_id", "event_type"])["ts"]
          .agg(mn="min", mx="max").reset_index())
    j = ft.merge(ft, on="user_id", suffixes=("_a", "_b"))
    j = j[(j["event_type_a"] != j["event_type_b"])
          & (j["mn_a"] < j["mx_b"])]
    want = (j.groupby(["event_type_a", "event_type_b"]).size()
            .rename("n_users").reset_index()
            .rename(columns={"event_type_a": "antecedent",
                             "event_type_b": "consequent"})
            .sort_values(["antecedent", "consequent"])
            .reset_index(drop=True))
    got = got.sort_values(["antecedent", "consequent"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_users": np.int64}),
        want.astype({"n_users": np.int64}))
