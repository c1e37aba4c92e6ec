"""Skew-aware join strategies.

A hash join keyed on a Zipfian column sends every row of the hottest
key to one partition — the straggler that dominates wall time at
cluster scale. ``salted_join`` splits each HOT key into ``num_salts``
sub-keys: large-side rows scatter across salts (deterministic per-row
assignment), small-side hot rows replicate once per salt, and the join
runs on the composite (key, salt). Every (left, right) pair still
matches exactly once, so the result is row-identical to the plain
join (property-tested); cold keys pay nothing but an extra int8
column.

This is the join-shaped version of the salted two-phase sketch merge
(``pipelines/itemsets.py``; SURVEY §4 skew row). The reference's skew
handling is chunk-the-largest-list (``EnvParamGenerators.py:117-135``)
— same idea, driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.hashing import hash_ints

DEFAULT_HOT_FRACTION = 0.05


def detect_hot_keys(ds: rd.Dataset, key: str, sample_frac: float = 0.05,
                    hot_fraction: float = DEFAULT_HOT_FRACTION,
                    max_keys: int = 64, seed: int = 17) -> np.ndarray:
    """Keys whose share of a Bernoulli sample exceeds ``hot_fraction``
    — a one-pass, sample-sized pre-scan (at scale: pennies next to the
    join it protects). Returns a sorted int64 array for ``np.isin``."""
    counts: dict = {}
    total = 0
    sample = ds.select_columns([key]).random_sample(sample_frac, seed=seed)
    for batch in sample.iter_batches(batch_format="pandas"):
        vc = batch[key].value_counts()
        total += int(vc.sum())
        for k, n in vc.items():
            counts[k] = counts.get(k, 0) + int(n)
    if not total:
        return np.empty(0, dtype=np.int64)
    hot = [k for k, n in counts.items() if n / total >= hot_fraction]
    # key tie-break so the cutoff is deterministic across block orders
    hot = sorted(hot, key=lambda k: (-counts[k], k))[:max_keys]
    return np.sort(np.asarray(hot, dtype=np.int64))


def salted_join(left: rd.Dataset, right: rd.Dataset, *, on: str,
                right_on: str | None = None, hot_keys: np.ndarray,
                num_salts: int = 8, num_partitions: int = 8) -> rd.Dataset:
    """Inner join with hot-key salting. ``left`` is the large skewed
    side (rows scatter over salts); ``right`` is the side whose hot
    rows replicate ``num_salts`` times — replication cost is
    |hot right rows| × num_salts, so pass the dimension-like side as
    ``right``. Cold keys keep salt 0 on both sides."""
    right_on = right_on or on
    hot = np.sort(np.asarray(hot_keys, dtype=np.int64))
    S = int(num_salts)

    def salt_left(t: pa.Table) -> pd.DataFrame:
        b = t.to_pandas()
        keys = b[on].to_numpy()
        is_hot = np.isin(keys, hot)
        # deterministic per-row scatter: re-mix the key with the row's
        # position so equal keys spread across salts
        pos = np.arange(len(b), dtype=np.int64)
        salt = np.where(
            is_hot,
            (hash_ints(keys.astype(np.int64) + pos) % np.uint64(S))
            .astype(np.int8),
            np.int8(0))
        b["_salt"] = salt
        return b

    def salt_right(t: pa.Table) -> pd.DataFrame:
        b = t.to_pandas()
        is_hot = np.isin(b[right_on].to_numpy(), hot)
        cold = b[~is_hot].assign(_salt=np.int8(0))
        hot_rows = b[is_hot]
        if len(hot_rows):
            rep = hot_rows.loc[hot_rows.index.repeat(S)].reset_index(drop=True)
            rep["_salt"] = np.tile(np.arange(S, dtype=np.int8), len(hot_rows))
            return pd.concat([cold, rep], ignore_index=True)
        return cold

    lsalted = left.map_batches(salt_left, batch_format="pyarrow")
    rsalted = right.map_batches(salt_right, batch_format="pyarrow")
    joined = lsalted.join(rsalted, join_type="inner",
                          num_partitions=num_partitions,
                          on=(on, "_salt"), right_on=(right_on, "_salt"))
    return joined.drop_columns(["_salt"])


def q_user_segment_activity(sf_dir: str) -> pd.DataFrame:
    """events ⋈ customer on the SKEWED user key via ``salted_join``
    (every user's row share clears the hot threshold, so the whole key
    domain salts — the worst case a Zipf head degenerates to), then
    per-market-segment activity. Row-identical to the unsalted join by
    construction; the DuckDB oracle checks exactly that."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    from .temporal import _drop_null, _fold_bp

    def fold(t: pa.Table) -> pa.Table:
        t = _drop_null(t)  # NULL contract mirrored by the oracle's
        return pa.table({"user_id": t["user_id"],  # IS NOT NULL preds
                         "value_bp": pa.array(_fold_bp(t["value"]))})

    ev = ev.map_batches(fold, batch_format="pyarrow").materialize()
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    hot = detect_hot_keys(ev, "user_id", sample_frac=0.2, hot_fraction=0.005)
    joined = salted_join(ev, cust, on="user_id", right_on="c_custkey",
                         hot_keys=hot, num_salts=4)
    agg = (joined.groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_events"),
                      Sum("value_bp", alias_name="sum_value_bp"))
           .to_pandas())
    agg["n_events"] = agg["n_events"].astype(np.int64)
    agg["sum_value_bp"] = agg["sum_value_bp"].astype(np.int64)
    return agg


# ------------------------------------------------------------ interval join
# irregular band edges in value basis points, WITH a coverage gap at
# [200000, 300000) so inner-join drop semantics are exercised — a
# non-equi join against an arbitrary interval table (the shape Ray
# Data has no native operator for)
VALUE_BANDS: list[tuple[int, int, int]] = [
    (1, 0, 50_000),
    (2, 50_000, 200_000),
    (3, 300_000, 1_000_000),
    (4, 1_000_000, 5_000_000),
]


def interval_join_values(sf_dir: str,
                         bands: list[tuple[int, int, int]] | None = None
                         ) -> rd.Dataset:
    """events ⋈ bands ON lo <= value_bp < hi — the broadcast interval
    (band/range) join. The band table is tiny by nature (bands are
    humans' bucketing decisions), so it ships once into each task via
    closure capture and every batch resolves membership with ONE
    ``np.searchsorted`` over the sorted lo-edges + an upper-bound
    check; rows falling into a gap are dropped (inner join). No
    shuffle at any scale — output volume == input volume.

    For a LARGE interval table the layout flips to range-partitioning
    both sides on the interval domain (the ``pipelines.temporal``
    as-of pattern); documented, not needed for a band table."""
    bands = bands if bands is not None else VALUE_BANDS
    ids = np.asarray([b[0] for b in bands], np.int64)
    los = np.asarray([b[1] for b in bands], np.int64)
    his = np.asarray([b[2] for b in bands], np.int64)
    if not ((np.diff(los) > 0).all() and (his > los).all()
            and (los[1:] >= his[:-1]).all()):
        # the single-searchsorted kernel resolves each value to AT MOST
        # one band; overlapping intervals need the multi-match
        # expansion (emit one row per containing band) — refuse loudly
        # instead of silently returning only the last match
        raise ValueError("bands must be sorted, non-empty and "
                         "non-overlapping for the searchsorted kernel")

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def resolve(t: pa.Table) -> pd.DataFrame:
        from .temporal import _drop_null, _fold_bp
        t = _drop_null(t)
        bp = _fold_bp(t["value"])
        idx = np.searchsorted(los, bp, side="right") - 1
        ok = (idx >= 0) & (bp < his[np.clip(idx, 0, len(his) - 1)])
        return pd.DataFrame({
            "event_id": t["event_id"].to_numpy(
                zero_copy_only=False)[ok].astype(np.int64),
            "band_id": ids[idx[ok]],
            "value_bp": bp[ok],
        })

    return ev.map_batches(resolve, batch_format="pyarrow")


def q_value_bands(sf_dir: str) -> rd.Dataset:
    return interval_join_values(sf_dir)
