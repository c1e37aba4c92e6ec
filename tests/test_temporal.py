"""Semantics tests for pipelines.temporal (as-of join, rolling window
aggregate, exact quantiles) on crafted corner-case corpora — the gate
parity at sf0.001/sf0.01 lives in test_oracle_parity.py; these pin the
edge behaviors the natural data never exercises (equal-timestamp ties,
single-element groups, strictly-prior semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("us")),
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


TS0 = pd.Timestamp("2024-01-10")
DAY = pd.Timedelta(days=1)


def test_asof_strictly_prior_and_tiebreak(ray_session, tmp_path):
    """Anchor at the probe's exact ts must NOT match (strictly prior);
    two anchors sharing the latest prior ts -> max event_id wins."""
    from associationabacminer_ray.pipelines.temporal import asof_join_events

    sf = _write_events(tmp_path, [
        # user 1: two anchors at the SAME ts, then a probe
        (10, TS0, 1, "signup", 1.0, "k1"),
        (11, TS0, 1, "signup", 1.0, "k1"),
        (12, TS0 + DAY, 1, "click", 1.0, "k1"),
        # user 2: anchor exactly AT the probe ts -> no match
        (20, TS0, 2, "signup", 1.0, "k1"),
        (21, TS0, 2, "click", 1.0, "k1"),
        # user 3: no anchor at all
        (30, TS0, 3, "click", 1.0, "k1"),
    ])
    got = (asof_join_events(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [12]
    assert got["anchor_event_id"].tolist() == [11]  # tie -> larger id
    assert got["gap_us"].tolist() == [86_400_000_000]


def test_asof_matches_oracle_on_tie_corpus(ray_session, tmp_path):
    """The crafted tie corpus must agree with the SQL oracle too (the
    tie-break contract is part of the oracle, not just the engine)."""
    import duckdb

    import __ray_entry__ as entrymod
    from associationabacminer_ray.pipelines.temporal import asof_join_events

    sf = _write_events(tmp_path, [
        (10, TS0, 1, "signup", 1.0, "k1"),
        (11, TS0, 1, "signup", 1.0, "k1"),
        (12, TS0 + DAY, 1, "click", 1.0, "k1"),
        (13, TS0 + 2 * DAY, 1, "signup", 1.0, "k1"),
        (14, TS0 + 3 * DAY, 1, "purchase", 1.0, "k1"),
        (20, TS0, 2, "signup", 1.0, "k1"),
        (21, TS0, 2, "click", 1.0, "k1"),
    ])
    got = (asof_join_events(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(entrymod.oracle_sql()["asof_attribution"]).df()
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))


def test_rolling_includes_equal_ts_peers(ray_session, tmp_path):
    """SQL RANGE frames include ALL rows with ts equal to the current
    row's — even ones 'after' it in any physical order. Two events at
    the identical ts must each see both."""
    from associationabacminer_ray.pipelines.temporal import rolling_window_agg

    sf = _write_events(tmp_path, [
        (1, TS0, 7, "click", 1.0, "k1"),
        (2, TS0, 7, "view", 2.0, "k1"),
        (3, TS0 + 6 * DAY, 7, "click", 4.0, "k1"),   # inside [t-7d, t]
        (4, TS0 + 20 * DAY, 7, "click", 8.0, "k1"),  # outside
    ])
    got = (rolling_window_agg(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["n_7d"].tolist() == [2, 2, 3, 1]
    assert got["sum_7d_bp"].tolist() == [30000, 30000, 70000, 80000]


def test_rolling_window_boundary_inclusive(ray_session, tmp_path):
    """An event exactly window_days earlier is INSIDE the frame
    (RANGE ... PRECEDING is inclusive)."""
    from associationabacminer_ray.pipelines.temporal import rolling_window_agg

    sf = _write_events(tmp_path, [
        (1, TS0, 5, "click", 1.0, "k1"),
        (2, TS0 + 7 * DAY, 5, "click", 2.0, "k1"),
    ])
    got = (rolling_window_agg(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["n_7d"].tolist() == [1, 2]


def test_quantiles_single_and_duplicate_values(ray_session, tmp_path):
    """n=1 group -> every pct returns the lone value; a group that is
    all-duplicates returns that value at every pct."""
    from associationabacminer_ray.pipelines.temporal import (
        exact_value_quantiles,
    )

    rows = [(1, TS0, 1, "solo", 3.5, "k1")]
    rows += [(10 + i, TS0 + i * DAY, 1, "flat", 2.0, "k1") for i in range(9)]
    sf = _write_events(tmp_path, rows)
    got = (exact_value_quantiles(sf).to_pandas()
           .sort_values(["event_type", "q_pct"]).reset_index(drop=True))
    solo = got[got["event_type"] == "solo"]
    flat = got[got["event_type"] == "flat"]
    assert solo["value_bp"].tolist() == [35000] * 5
    assert flat["value_bp"].tolist() == [20000] * 5
    assert solo["q_pct"].tolist() == [25, 50, 75, 90, 99]


def test_quantiles_rank_rule_matches_numpy(ray_session, tmp_path):
    """The floor(q/100*(n-1))+1 rank over a known set: for n=5 values
    [10,20,30,40,50] -> p25=20, p50=30, p75=40, p90=40, p99=40."""
    from associationabacminer_ray.pipelines.temporal import (
        exact_value_quantiles,
    )

    rows = [(i, TS0 + i * DAY, 1, "t", v, "k1")
            for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0])]
    sf = _write_events(tmp_path, rows)
    got = (exact_value_quantiles(sf).to_pandas()
           .sort_values("q_pct").reset_index(drop=True))
    assert got["value_bp"].tolist() == [20000, 30000, 40000, 40000, 40000]


def test_rolling_bucket_invariance(ray_session):
    """Result identical at 1 bucket vs 16 buckets on real sf0.001 data
    (partitioning must never change the answer)."""
    from associationabacminer_ray.pipelines.temporal import rolling_window_agg

    sf = "/root/testdata/sf0.001"
    a = (rolling_window_agg(sf, num_buckets=1).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (rolling_window_agg(sf, num_buckets=16).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_value_rank_ties_share_min_rank(ray_session, tmp_path):
    """RANK() semantics: equal folded values share the smallest rank,
    and the next distinct value skips past the tie block."""
    from associationabacminer_ray.pipelines.temporal import value_ranks

    sf = _write_events(tmp_path, [
        (1, TS0, 1, "t", 2.0, "k1"),
        (2, TS0, 2, "t", 2.0, "k1"),   # tie with event 1
        (3, TS0, 3, "t", 5.0, "k1"),   # rank 3, not 2
        (4, TS0, 4, "u", 9.0, "k1"),   # separate partition
    ])
    got = (value_ranks(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert got["value_rank"].tolist() == [1, 1, 3, 1]


def test_null_rows_excluded_matches_oracle(ray_session, tmp_path):
    """Rows with NULL key/ts/value are excluded identically by the
    engine (_drop_null) and the oracle (IS NOT NULL predicates) —
    pinned on a corpus the natural fixtures never produce."""
    import duckdb

    import __ray_entry__ as entrymod

    df = pd.DataFrame({
        "event_id": pd.array([1, 2, 3, 4, 5, 6], dtype="Int64"),
        "ts": [TS0, TS0 + DAY, pd.NaT, TS0 + 2 * DAY, TS0 + 3 * DAY,
               TS0 + 4 * DAY],
        "user_id": pd.array([1, 1, 1, None, 1, 1], dtype="Int64"),
        "event_type": ["signup", "click", "click", "click", None, "view"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, None],
        "props": ["k1"] * 6,
    })
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("ts"),
                     pa.field("ts", pa.timestamp("us")),
                     t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    q = entrymod.queries()
    sql = entrymod.oracle_sql()
    for name in ["asof_attribution", "rolling_user_activity",
                 "value_quantiles_exact", "value_rank", "user_event_mode"]:
        got = q[name](sf).to_pandas()
        want = con.execute(sql[name]).df()
        sc = sorted(got.columns)
        g = got[sc].sort_values(sc).reset_index(drop=True)
        w = want[sc].sort_values(sc).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False), name


# ----------------------------------------------------------- interval join
def test_interval_join_bucket_boundary_no_double_count(ray_session,
                                                       tmp_path):
    """An anchor whose 7-day window straddles a time-bucket boundary
    meets follow events from BOTH of its replicas — each (probe,
    anchor) pair must still count exactly once (the probe's own bucket
    is the unique meeting cell), and the open-interval bounds must
    exclude the anchor instant and the window end."""
    from associationabacminer_ray.pipelines.temporal import (
        interval_join_followups,
    )

    anchor_ts = TS0 + pd.Timedelta(days=5)  # window spans bucket edge
    sf = _write_events(tmp_path, [
        (1, anchor_ts, 7, "signup", 1.0, "{}"),
        # same bucket as the anchor (days 5..6)
        (2, anchor_ts + DAY, 7, "click", 2.0, "{}"),
        # next bucket (days 7..11) — only reachable via the +1 replica
        (3, anchor_ts + 4 * DAY, 7, "click", 3.0, "{}"),
        # boundary exclusions: equal ts and window end
        (4, anchor_ts, 7, "click", 5.0, "{}"),
        (5, anchor_ts + 7 * DAY, 7, "click", 7.0, "{}"),
        # other user never joins
        (6, anchor_ts + DAY, 8, "click", 11.0, "{}"),
    ])
    out = interval_join_followups(sf).to_pandas()
    assert out["anchor_id"].tolist() == [1]
    assert int(out["n_follow"][0]) == 2
    assert int(out["sum_value_bp"][0]) == 20000 + 30000


def test_interval_join_anchor_counts_as_followup_of_earlier_anchor(
        ray_session, tmp_path):
    """Two anchors for one user: the later anchor is itself a follow
    event of the earlier one (probe side is ALL events), and each
    anchor gets its own independent window."""
    from associationabacminer_ray.pipelines.temporal import (
        interval_join_followups,
    )

    sf = _write_events(tmp_path, [
        (1, TS0, 7, "signup", 1.0, "{}"),
        (2, TS0 + 2 * DAY, 7, "signup", 2.0, "{}"),
        (3, TS0 + 3 * DAY, 7, "click", 4.0, "{}"),
    ])
    out = (interval_join_followups(sf).to_pandas()
           .sort_values("anchor_id").reset_index(drop=True))
    assert out["anchor_id"].tolist() == [1, 2]
    assert out["n_follow"].tolist() == [2, 1]
    assert out["sum_value_bp"].tolist() == [60000, 40000]


def test_interval_join_no_anchors_is_empty_not_crash(ray_session,
                                                     tmp_path):
    from associationabacminer_ray.pipelines.temporal import (
        interval_join_followups,
    )

    sf = _write_events(tmp_path, [
        (1, TS0, 7, "click", 1.0, "{}"),
        (2, TS0 + DAY, 7, "click", 2.0, "{}"),
    ])
    out = interval_join_followups(sf).to_pandas()
    assert len(out) == 0
