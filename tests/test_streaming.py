"""Streaming sessionizer (raw Ray bucket actors) == batch recompute,
including incremental multi-feed equivalence."""

import numpy as np
import pandas as pd
import pytest

from associationabacminer_ray.stages.streaming import StreamingSessionizer

SF = "/root/testdata/sf0.001"


def batch_oracle(df: pd.DataFrame, gap_us=30 * 60 * 1_000_000) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ts = df["ts"].astype("int64")
    new_s = (df["user_id"] != df["user_id"].shift()) | ((ts - ts.shift()) > gap_us)
    sid = new_s.cumsum()
    per = df.assign(_sid=sid).groupby(["user_id", "_sid"]).size()
    out = per.groupby("user_id").agg(["size", "sum", "max"]).reset_index()
    out.columns = ["user_id", "n_sessions", "n_events", "max_session_events"]
    return out.sort_values("user_id").reset_index(drop=True)


@pytest.fixture()
def events_df():
    return pd.read_parquet(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "event_id"])


def test_streaming_matches_batch(ray_session, events_df):
    import ray.data as rd

    s = StreamingSessionizer(num_buckets=3)
    try:
        n = s.feed(rd.read_parquet(f"{SF}/events.parquet",
                                   columns=["user_id", "ts"]))
        assert n == len(events_df)
        got = s.snapshot()
    finally:
        s.shutdown()
    want = batch_oracle(events_df)
    pd.testing.assert_frame_equal(
        got.astype({"user_id": np.int64}), want.astype({"user_id": np.int64}),
        check_dtype=False)


def test_incremental_feeds_equal_single_feed(ray_session, events_df):
    import ray.data as rd

    cut = events_df["ts"].quantile(0.5)
    first = events_df[events_df["ts"] <= cut]
    second = events_df[events_df["ts"] > cut]

    s = StreamingSessionizer(num_buckets=2)
    try:
        s.feed(rd.from_pandas(first[["user_id", "ts"]]))
        mid = s.snapshot()  # state is queryable mid-stream
        assert mid["n_events"].sum() == len(first)
        s.feed(rd.from_pandas(second[["user_id", "ts"]]))
        got = s.snapshot()
    finally:
        s.shutdown()
    want = batch_oracle(events_df)
    pd.testing.assert_frame_equal(
        got.astype({"user_id": np.int64}), want.astype({"user_id": np.int64}),
        check_dtype=False)
