"""Temporal operators: as-of join, rolling windowed aggregates, and
exact distributed quantiles.

The reference never joins two event streams on time (its windows are
pre-sliced Mongo range queries, ``src/job/WindowGenerator.py:13-24``,
and each window is order-insensitive within itself) — but a
training-data pipeline over transcript streams needs the temporal
family Ray Data lacks natively:

- **As-of join** (``q_asof_attribution``): attach to each event the
  most recent strictly-prior anchor event of the same key — the
  attribution/sessionless-lookup shape (e.g. "which signup does this
  click follow"). Composition: tag both streams, one hash shuffle on
  the key, per-bucket ``pandas.merge_asof`` (vectorized backward
  search). Partitioning assumption: a key's rows fit in one bucket
  group — the same assumption every keyed groupby here makes.
- **Rolling window aggregate** (``q_rolling_user_activity``): per
  event, COUNT/SUM over the trailing 7 days of the same key — the SQL
  ``RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW`` frame,
  computed with two ``np.searchsorted`` calls per key segment on the
  bucket-sorted stream (no per-row loop).
- **Exact distributed quantiles** (``q_value_quantiles_exact``): the
  oracle-backed exact twin of the t-digest/KLL ``value_quantiles``
  sketch path (``sketch_queries.q_value_quantiles``). Values are
  folded to integer basis points per row, so exact quantiles reduce
  to a (type, value_bp) histogram — one bucketed count shuffle whose
  cardinality is bounded by the fold granularity, not the row count —
  then a per-type rank pick over the tiny histogram. This is the
  standard exact-quantile-at-scale layout: 100 TB of rows collapse to
  at most ~5M distinct bp cells per type before anything is gathered.

All three emit integer-only columns (gate convention: float
aggregation order can never flip a value hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import hash_ints

US_PER_DAY = 86_400_000_000
ASOF_ANCHOR_TYPE = "signup"
ROLLING_DAYS = 7
QUANTILE_PCTS = (25, 50, 75, 90, 99)


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds since epoch."""
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


US_PER_WEEK = 7 * US_PER_DAY


def epoch_div_trunc(ts_us: np.ndarray, unit_us: int) -> np.ndarray:
    """Integer division matching DuckDB's ``//``: truncation TOWARD
    ZERO (``SELECT -7 // 2`` is -3 in DuckDB), not numpy's floor
    division (-7 // 2 = -4). The two agree for post-1970 timestamps;
    pinning trunc semantics keeps engine and oracle identical for
    pre-1970 rows too."""
    q = np.abs(ts_us) // unit_us
    return np.where(ts_us >= 0, q, -q).astype(np.int64)


def day_num_trunc(ts_us: np.ndarray) -> np.ndarray:
    """Day bucket matching DuckDB's ``epoch_us(ts) // 86400000000``."""
    return epoch_div_trunc(ts_us, US_PER_DAY)


def _fold_bp(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Basis-point fold of an Arrow float column via THE shared
    ``functions.scoring.fold_bp_strict`` (one implementation per gate
    convention; refuses NaN/inf loudly instead of minting INT64_MIN).
    Callers drop NULL rows first (`_drop_null` — mirrored by explicit
    ``IS NOT NULL`` predicates in the SQL oracles)."""
    from ..functions.scoring import fold_bp_strict

    return fold_bp_strict(col.to_numpy(zero_copy_only=False), name="value")


def quantile_rank_pick(values: np.ndarray, counts: np.ndarray,
                       pct_arr: np.ndarray) -> np.ndarray:
    """THE discrete-quantile rank pick (one copy — exact_value_quantiles
    AND sequence.conversion_time_quantiles both pin this rule against
    their SQL oracles): over an ascending value histogram, the element
    at 1-based rank ``floor(q/100*(n-1)) + 1`` — numpy and DuckDB run
    the identical float64 expression, so the rank is bit-equal.
    ``values`` must be sorted ascending with positive ``counts``."""
    csum = np.cumsum(counts)
    n = int(csum[-1])
    ranks = np.floor(pct_arr / 100.0 * (n - 1)).astype(np.int64) + 1
    return values[np.searchsorted(csum, ranks, side="left")]


def _drop_null(t: pa.Table) -> pa.Table:
    """Drop rows with a NULL in ANY selected column. Every temporal
    operator's SQL oracle carries the matching IS NOT NULL predicates,
    so the null contract is pinned identically on both sides (pandas
    groupby would otherwise silently drop null keys while SQL GROUP BY
    keeps them — a gate divergence)."""
    return t.drop_null()


# ----------------------------------------------------------------- as-of join
def asof_join_events(sf_dir: str, anchor_type: str = ASOF_ANCHOR_TYPE,
                     num_buckets: int = 16) -> rd.Dataset:
    """For every non-anchor event, the most recent strictly-prior
    anchor event of the same user (inner semantics: events with no
    prior anchor are dropped).

    Tie-break when two anchors share a timestamp: larger event_id wins
    (right side sorted by (ts, event_id); ``merge_asof`` backward takes
    the last eligible row). Returns integer columns only:
    (event_id, anchor_event_id, gap_us).
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": _ts_us(t["ts"]),
            "is_anchor": pc.equal(t["event_type"], anchor_type)
                         .to_numpy(zero_copy_only=False).astype(bool),
        })
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[~g["is_anchor"]].sort_values("ts_us", kind="mergesort")
        anchor = (g[g["is_anchor"]]
                  .sort_values(["ts_us", "event_id"], kind="mergesort"))
        if probe.empty or anchor.empty:
            return pd.DataFrame({"event_id": np.array([], np.int64),
                                 "anchor_event_id": np.array([], np.int64),
                                 "gap_us": np.array([], np.int64)})
        # merge_asof keeps only the left 'on' column, and any carried
        # int64 column becomes float64 (NaN for no-match rows) — which
        # would corrupt event_ids above 2^53. Carry the anchor's ROW
        # POSITION instead (bounded by the group size, always exact in
        # float64) and take ids/timestamps through it after dropna.
        anchor_ids = anchor["event_id"].to_numpy(np.int64)
        anchor_ts = anchor["ts_us"].to_numpy(np.int64)
        right = pd.DataFrame({
            "user_id": anchor["user_id"].to_numpy(),
            "ts_us": anchor_ts,
            "anchor_pos": np.arange(len(anchor), dtype=np.int64),
        })
        j = pd.merge_asof(
            probe[["event_id", "user_id", "ts_us"]], right,
            on="ts_us", by="user_id", direction="backward",
            allow_exact_matches=False)
        j = j.dropna(subset=["anchor_pos"])
        pos = j["anchor_pos"].to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": j["event_id"].to_numpy(np.int64),
            "anchor_event_id": anchor_ids[pos],
            "gap_us": j["ts_us"].to_numpy(np.int64) - anchor_ts[pos],
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return asof_bucket(g.drop(columns=["bucket"]))

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def q_asof_attribution(sf_dir: str) -> rd.Dataset:
    return asof_join_events(sf_dir)


# ------------------------------------------------------- interval (range) join
INTERVAL_JOIN_DAYS = 7


def interval_join_followups(sf_dir: str,
                            anchor_type: str = ASOF_ANCHOR_TYPE,
                            window_days: int = INTERVAL_JOIN_DAYS,
                            num_buckets: int = 16) -> rd.Dataset:
    """Distributed INTERVAL (range) JOIN: per ``anchor_type`` event,
    the count and folded-sum of the SAME user's events with
    ``ts ∈ (anchor_ts, anchor_ts + window)`` — the forward-window
    complement of the backward ``asof_join_events``, and the
    inequality-predicate join Ray Data has no native operator for
    (the reference's msearch date-range probes,
    ``src/eval/EnvPolicyEvaluator.py:200-240``, ask the same
    bounded-window question per rule).

    Shape (the canonical time-bucket replication plan): probe events
    map to ONE time bucket ``floor(ts / window)``; each anchor
    replicates to the ≤2 buckets its window overlaps. Both sides
    shuffle once on hash(user, bucket) — the BIG side never
    replicates, and a (probe, anchor) pair can meet in exactly one
    (user, bucket) cell (the probe's own bucket), so the exact
    predicate filter never double-counts. Per-anchor partials from
    the ≤2 cells merge in a second small keyed sum. Pair blow-up
    inside a cell is bounded by one user's events inside a 2·window
    span (time locality), not the corpus; a user hot enough to break
    that bound is a salted-join candidate (``pipelines/joins.py``).
    """
    win_us = np.int64(window_days * US_PER_DAY)

    def prep(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        ts = _ts_us(t["ts"])
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        v_bp = _fold_bp(t["value"])
        tb = ts // win_us  # floor div on both sides (internal key only)
        probe = pd.DataFrame({
            "uid": uid, "tb": tb, "ts": ts, "v_bp": v_bp,
            "anchor_ts": np.int64(0), "anchor_id": np.int64(0),
            "side": np.int8(0),
        })
        am = etype == anchor_type
        if not am.any():
            return probe
        a_uid, a_ts, a_id = uid[am], ts[am], eid[am]
        a_tb = a_ts // win_us
        anchors = pd.DataFrame({
            "uid": np.concatenate([a_uid, a_uid]),
            "tb": np.concatenate([a_tb, a_tb + 1]),
            "ts": np.int64(0), "v_bp": np.int64(0),
            "anchor_ts": np.concatenate([a_ts, a_ts]),
            "anchor_id": np.concatenate([a_id, a_id]),
            "side": np.int8(1),
        })
        return pd.concat([probe, anchors], ignore_index=True)

    both = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).map_batches(prep, batch_format="pyarrow")

    _EMPTY = {"anchor_id": np.int64, "n_follow": np.int64,
              "sum_value_bp": np.int64}

    def cell_join(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        a = g[g["side"] == 1]
        if not len(e) or not len(a):
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in _EMPTY.items()})
        j = e[["uid", "tb", "ts", "v_bp"]].merge(
            a[["uid", "tb", "anchor_ts", "anchor_id"]], on=["uid", "tb"])
        j = j[(j["ts"] > j["anchor_ts"])
              & (j["ts"] < j["anchor_ts"] + win_us)]
        out = (j.groupby("anchor_id", sort=False)
               .agg(n_follow=("ts", "size"), sum_value_bp=("v_bp", "sum"))
               .reset_index())
        return out.astype(_EMPTY)

    from .analytics import bucketed_group_agg

    partials = bucketed_group_agg(both, ["uid", "tb"], cell_join,
                                  num_buckets=num_buckets)

    def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("anchor_id", sort=False)[
            ["n_follow", "sum_value_bp"]].sum().reset_index())
        return out.astype(_EMPTY)

    return bucketed_group_agg(partials, ["anchor_id"], merge_partials,
                              num_buckets=max(4, num_buckets // 4))


def q_interval_join(sf_dir: str) -> rd.Dataset:
    return interval_join_followups(sf_dir)


# ------------------------------------------------------- rolling window agg
def rolling_window_agg(sf_dir: str, window_days: int = ROLLING_DAYS,
                       num_buckets: int = 16) -> rd.Dataset:
    """Per event: COUNT and folded-SUM(value) over the trailing
    ``window_days`` of the same user — inclusive [t - w, t] bounds with
    equal-timestamp peers included, exactly the SQL RANGE frame.

    Per bucket: one sort by (user_id, ts, event_id), then per user
    segment two vectorized ``searchsorted`` calls + a cumulative-sum
    difference. The Python loop is over *users in the bucket*, each
    iteration O(1) vector ops — not over rows.
    """
    win_us = np.int64(window_days * US_PER_DAY)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": _ts_us(t["ts"]),
            "value_bp": _fold_bp(t["value"]),
        })
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        users = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        bp = g["value_bp"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        ends = np.r_[starts[1:], n]
        n_out = np.empty(n, np.int64)
        sum_out = np.empty(n, np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - win_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            csum = np.r_[np.int64(0), np.cumsum(bp[s:e])]
            n_out[s:e] = hi - lo
            sum_out[s:e] = csum[hi] - csum[lo]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "n_7d": n_out, "sum_7d_bp": sum_out})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return roll_bucket(g.drop(columns=["bucket"]))

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def q_rolling_user_activity(sf_dir: str) -> rd.Dataset:
    return rolling_window_agg(sf_dir)


# --------------------------------------------------- exact quantiles (bp fold)
def value_histogram(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """(event_type, value_bp, cnt) histogram of folded values — the
    shared reduction behind exact quantiles and per-row ranks. Stage 1
    pre-aggregates counts inside each batch; stage 2 is one bucketed
    count shuffle over histogram CELLS, bounded by the bp fold
    granularity, not the row count."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "value_bp": _fold_bp(t["value"]),
        })
        out = (df.groupby(["event_type", "value_bp"], sort=False)
               .size().rename("cnt").reset_index())
        out["bucket"] = ((hash_ints(out["value_bp"])
                          % np.uint64(num_buckets)).astype(np.int32))
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["event_type", "value_bp"], sort=False)["cnt"]
                .sum().reset_index())

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def exact_value_quantiles(sf_dir: str, pcts=QUANTILE_PCTS,
                          num_buckets: int = 16) -> rd.Dataset:
    """Exact discrete quantiles of folded value per event_type.

    Rank rule (mirrored verbatim in the SQL oracle): the element at
    1-based rank ``floor(q/100*(n-1)) + 1`` of the ascending sort —
    numpy and DuckDB run the identical float64 expression, so the rank
    is bit-equal. Built on the ``value_histogram`` reduction; the final
    stage picks ranks per type over the tiny merged histogram.
    """
    hist = value_histogram(sf_dir, num_buckets=num_buckets)

    pct_arr = np.array(pcts, np.int32)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_bp", kind="mergesort")
        return pd.DataFrame({
            "event_type": np.repeat(g["event_type"].iloc[0], len(pct_arr)),
            "q_pct": pct_arr,
            "value_bp": quantile_rank_pick(
                g["value_bp"].to_numpy(np.int64),
                g["cnt"].to_numpy(np.int64), pct_arr),
        })

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


def q_value_quantiles_exact(sf_dir: str) -> rd.Dataset:
    return exact_value_quantiles(sf_dir)


def q_value_quantiles_interp(sf_dir: str, pcts=QUANTILE_PCTS,
                             num_buckets: int = 16) -> rd.Dataset:
    """PERCENTILE_CONT semantics as a pinned closed form: position
    ``pct/100·(n−1)``, linear interpolation ``v_lo + (v_hi−v_lo)·frac``
    between the neighboring order statistics, folded to centi-bp. The
    oracle spells out the SAME arithmetic instead of calling DuckDB's
    ``quantile_cont`` (whose internal association order is not
    contractual). Built on the shared histogram reduction — neighbors
    come from two csum lookups, no global sort."""
    hist = value_histogram(sf_dir, num_buckets=num_buckets)
    pct_arr = np.array(pcts, np.int64)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_bp", kind="mergesort")
        vals = g["value_bp"].to_numpy(np.int64)
        csum = np.cumsum(g["cnt"].to_numpy(np.int64))
        n = int(csum[-1])
        pos = pct_arr / 100.0 * (n - 1)
        k = np.floor(pos).astype(np.int64)
        v_lo = vals[np.searchsorted(csum, k + 1, side="left")]
        v_hi = vals[np.searchsorted(csum, np.minimum(k + 2, n), side="left")]
        res = v_lo + (v_hi - v_lo) * (pos - k)
        return pd.DataFrame({
            "event_type": np.repeat(g["event_type"].iloc[0], len(pct_arr)),
            "q_pct": pct_arr.astype(np.int32),
            "value_cbp": np.floor(res * 100 + 0.5).astype(np.int64),
        })

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


# ------------------------------------------------------- per-row value rank
def _rank_lut_ref(sf_dir: str, num_buckets: int):
    """Shared pass-1 for the rank queries: the merged value histogram
    as {event_type: (ascending distinct value_bp, counts-below, n)},
    ``ray.put`` once (histogram-cell-sized broadcast)."""
    import ray

    hist = value_histogram(sf_dir, num_buckets=num_buckets).to_pandas()
    lut = {}
    for etype, g in hist.groupby("event_type", sort=False):
        g = g.sort_values("value_bp", kind="mergesort")
        vals = g["value_bp"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        below = np.r_[np.int64(0), np.cumsum(cnts)][:-1]
        lut[str(etype)] = (vals, below, int(cnts.sum()))
    return ray.put(lut)


def value_ranks(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per event: its RANK() among same-type events by folded value
    (ties share the minimum rank) — the classic two-pass distributed
    rank. Pass 1 is the ``value_histogram`` reduction; the merged
    histogram (histogram-cell-sized, a documented small-side broadcast
    — bounded by the bp fold granularity of the value domain, not the
    row count) is ``ray.put`` once, and pass 2 is a stateless
    ``map_batches`` lookup: rank = 1 + Σ counts of strictly-smaller
    cells, via one ``searchsorted`` per (batch, type). No global sort
    anywhere."""
    import ray

    lut_ref = _rank_lut_ref(sf_dir, num_buckets)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def rank_batch(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        table = ray.get(lut_ref)
        etypes = t["event_type"].to_numpy(zero_copy_only=False)
        bp = _fold_bp(t["value"])
        out = np.empty(len(bp), np.int64)
        for etype in pd.unique(etypes):
            m = etypes == etype
            vals, below, _n = table[str(etype)]
            idx = np.searchsorted(vals, bp[m], side="left")
            out[m] = below[idx] + 1
        return pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "value_rank": out,
        })

    return ev.map_batches(rank_batch, batch_format="pyarrow")


def q_value_rank(sf_dir: str) -> rd.Dataset:
    return value_ranks(sf_dir)


def value_percent_ranks(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per event: PERCENT_RANK() among same-type events by folded value
    — (rank−1)/(n−1) folded to basis points, 0 for a single-row
    partition (the SQL definition). (rank−1) and (n−1) are exact
    integers ≤ 2⁵³, so the double division is correctly rounded and
    bit-identical to DuckDB's window function; the fold then follows
    the shared op sequence. Same two-pass broadcast-histogram shape as
    ``value_ranks`` — no global sort, no per-partition window state."""
    import ray

    from ..functions.scoring import fold_bp

    lut_ref = _rank_lut_ref(sf_dir, num_buckets)
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def pct_batch(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        table = ray.get(lut_ref)
        etypes = t["event_type"].to_numpy(zero_copy_only=False)
        bp = _fold_bp(t["value"])
        pct = np.zeros(len(bp), np.float64)
        for etype in pd.unique(etypes):
            m = etypes == etype
            vals, below, n = table[str(etype)]
            if n <= 1:
                continue  # PERCENT_RANK of a 1-row partition is 0
            idx = np.searchsorted(vals, bp[m], side="left")
            pct[m] = below[idx] / np.float64(n - 1)
        return pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "pct_rank_bp": fold_bp(pct),
        })

    return ev.map_batches(pct_batch, batch_format="pyarrow")


def q_value_percent_rank(sf_dir: str) -> rd.Dataset:
    return value_percent_ranks(sf_dir)


def q_value_mad(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Median absolute deviation per event_type — the robust-stats
    twin of the exact quantiles. ONE corpus scan: both the median and
    the MAD come from the same merged value histogram (the |v − median|
    histogram is a cell-level transform of it, counts carried over), so
    the second 'pass' costs histogram cells, not rows. Both picks use
    the shared ``quantile_rank_pick`` rule mirrored in the oracle."""
    hist = value_histogram(sf_dir, num_buckets=num_buckets)
    p50 = np.array([50], np.int32)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_bp", kind="mergesort")
        vals = g["value_bp"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        med = quantile_rank_pick(vals, cnts, p50)[0]
        dv = np.abs(vals - med)
        order = np.argsort(dv, kind="stable")
        mad = quantile_rank_pick(dv[order], cnts[order], p50)[0]
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "median_bp": [np.int64(med)],
                             "mad_bp": [np.int64(mad)]})

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


def q_trimmed_mean(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95,
                   num_buckets: int = 16) -> rd.Dataset:
    """Trimmed mean per event_type: the mean of values inside the
    [p5, p95] VALUE thresholds (threshold-based trim — tie cells at
    the boundary stay in on both sides, unlike a rank-based trim whose
    tie handling SQL can't pin). Thresholds come from the shared
    ``quantile_rank_pick`` rule; the kept-sum stays int64 and the mean
    is one exact-integer division folded to the nearest bp
    (``floor(sum/n + 0.5)`` — identical IEEE sequence in the oracle).
    Same one-histogram-scan shape as ``q_value_mad``."""
    hist = value_histogram(sf_dir, num_buckets=num_buckets)
    pcts = np.array([lo_pct, hi_pct], np.int32)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_bp", kind="mergesort")
        vals = g["value_bp"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        lo, hi = quantile_rank_pick(vals, cnts, pcts)
        m = (vals >= lo) & (vals <= hi)
        n_kept = int(cnts[m].sum())
        s = int((vals[m] * cnts[m]).sum())
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "trimmed_n": [np.int64(n_kept)],
            "trimmed_sum_bp": [np.int64(s)],
            "trimmed_mean_bp": [np.int64(np.floor(s / n_kept + 0.5))],
        })

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


# ------------------------------------------------- rolling distinct (7d MAU)
def rolling_active_users(sf_dir: str, window_days: int = ROLLING_DAYS,
                         num_buckets: int = 16) -> rd.Dataset:
    """For every day with activity: the count of DISTINCT users active
    in the trailing ``window_days``-day window ``[d-(w-1), d]`` — the
    rolling-active-users metric. Distinct-over-a-sliding-window cannot
    ride a plain windowed sum (a user active twice in the window must
    count once), so the engine uses per-user interval coverage:

    1. per-batch (user, day) dedup, bucketed on hash(user);
    2. per bucket: each user's active days expand to the days they
       keep the user "active" (``day .. day+w-1``), deduplicated per
       user — a (w × per-user-day-pairs)-bounded expansion of the
       already-deduped pairs, never of raw events. Emits per-bucket
       partial (day, n_users) counts plus the bucket's observed-day
       markers;
    3. tiny day-keyed merge: sum partials, keep only days observed in
       the data (the marker rows), matching the oracle's "days with
       activity" frame.
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day": day_num_trunc(_ts_us(t["ts"])),
        }).drop_duplicates()
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def cover_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        users = np.repeat(g["user_id"].to_numpy(np.int64), window_days)
        days = (np.repeat(g["day"].to_numpy(np.int64), window_days)
                + np.tile(np.arange(window_days, dtype=np.int64), len(g)))
        cov = (pd.DataFrame({"user_id": users, "day": days})
               .drop_duplicates())
        n = cov.groupby("day", sort=False).size().rename("n").reset_index()
        n["n"] = n["n"].astype(np.int64)
        n["obs"] = np.int8(0)
        obs = pd.DataFrame({"day": pd.unique(g["day"].to_numpy(np.int64))})
        obs["n"] = np.int64(0)
        obs["obs"] = np.int8(1)
        return pd.concat([n, obs], ignore_index=True)

    partials = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: cover_bucket(g.drop(columns=["bucket"])),
                            batch_format="pandas"))

    def merge_day(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["obs"].max()) == 0:
            return pd.DataFrame({"day_num": np.array([], np.int64),
                                 "n_active": np.array([], np.int64)})
        return pd.DataFrame({
            "day_num": np.array([g["day"].iloc[0]], np.int64),
            "n_active": np.array([g["n"].sum()], np.int64),
        })

    return partials.groupby("day").map_groups(merge_day,
                                              batch_format="pandas")


def q_rolling_active_users(sf_dir: str) -> rd.Dataset:
    return rolling_active_users(sf_dir)


# ----------------------------------------------------------- cohort retention
def cohort_retention(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Classic retention matrix: users grouped by their FIRST activity
    week (the cohort), counted per week-offset of later activity —
    (cohort_week, week_offset, n_users). A user active twice in a week
    counts once (the (user, week) dedup), and each user contributes to
    every offset they were active at.

    Layout: per-batch (user, week) dedup bucketed on hash(user); each
    bucket derives its users' cohort (min week) and emits partial
    (cohort_week, week_offset) counts — the already-deduped pairs make
    the per-user offsets distinct, so partial counts sum exactly; one
    tiny cell-keyed merge (≤ weeks² cells) finishes. Weeks pin
    DuckDB's trunc-toward-zero ``//`` via ``epoch_div_trunc``."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "week": epoch_div_trunc(_ts_us(t["ts"]), US_PER_WEEK),
        }).drop_duplicates()
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "week"])
        cw = g.groupby("user_id", sort=False)["week"].transform("min")
        cells = pd.DataFrame({
            "cohort_week": cw.to_numpy(np.int64),
            "week_offset": (g["week"].to_numpy(np.int64)
                            - cw.to_numpy(np.int64)),
        })
        out = (cells.groupby(["cohort_week", "week_offset"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partials = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: cohort_bucket(
                    g.drop(columns=["bucket"])), batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_week": np.array([g["cohort_week"].iloc[0]], np.int64),
            "week_offset": np.array([g["week_offset"].iloc[0]], np.int64),
            "n_users": np.array([g["n_users"].sum()], np.int64),
        })

    return (partials.groupby(["cohort_week", "week_offset"])
            .map_groups(merge, batch_format="pandas"))


def q_cohort_retention(sf_dir: str) -> rd.Dataset:
    return cohort_retention(sf_dir)


# -------------------------------------------------- IQR outlier detection
def value_outliers(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Tukey-fence outlier counts per event type, integer-exact: q1/q3
    from THE shared rank rule over the ``value_histogram`` reduction,
    fences compared in DOUBLED units so 1.5·IQR never leaves the
    integers — low iff ``2v < 5·q1 − 3·q3``, high iff
    ``2v > 5·q3 − 3·q1`` (both sides pin this exact inequality). The
    outlier COUNTS come from the same histogram cells, so the whole op
    is one cell-bounded shuffle — no second corpus pass."""
    hist = value_histogram(sf_dir, num_buckets=num_buckets)
    pcts = np.array([25, 75], np.int64)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_bp", kind="mergesort")
        vals = g["value_bp"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        q1, q3 = quantile_rank_pick(vals, cnts, pcts)
        low = np.int64(5) * q1 - np.int64(3) * q3
        high = np.int64(5) * q3 - np.int64(3) * q1
        v2 = 2 * vals
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "q1_bp": np.array([q1], np.int64),
            "q3_bp": np.array([q3], np.int64),
            "n_low": np.array([cnts[v2 < low].sum()], np.int64),
            "n_high": np.array([cnts[v2 > high].sum()], np.int64),
            "n_total": np.array([cnts.sum()], np.int64),
        })

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


def q_value_outliers(sf_dir: str) -> rd.Dataset:
    return value_outliers(sf_dir)


# ----------------------------------------------- distribution drift (TVD-ish)
def type_drift(sf_dir: str, num_buckets: int = 8) -> pd.DataFrame:
    """Event-type composition drift between even- and odd-numbered days
    (the A/B halves every pipeline monitor compares): per type, counts
    in each half and the absolute per-mille... — in basis points —
    share difference ``|((10000·c_even) // n_even) −
    ((10000·c_odd) // n_odd)|``, every step integer-truncating on both
    engines. Per-batch (type, parity) pre-counts → one tiny bucketed
    merge; the two half totals ride the same cells."""
    from .analytics import bucketed_group_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        day = day_num_trunc(_ts_us(t["ts"]))
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            # numpy % is floor-mod (0/1 even for pre-1970 negative
            # days); the oracle pins the same with ((x % 2) + 2) % 2
            # since DuckDB % is sign-preserving trunc-mod
            "parity": (day % 2).astype(np.int8),
        })
        return (df.groupby(["event_type", "parity"], sort=False)
                .size().rename("cnt").reset_index())

    cells = bucketed_group_agg(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        lambda g: g.groupby(["event_type", "parity"], sort=False)["cnt"]
        .sum().reset_index(),
        num_buckets=num_buckets).to_pandas()

    piv = (cells.pivot_table(index="event_type", columns="parity",
                             values="cnt", aggfunc="sum", fill_value=0)
           .reindex(columns=[0, 1], fill_value=0))
    n_even = np.int64(piv[0].sum())
    n_odd = np.int64(piv[1].sum())
    out = pd.DataFrame({
        "event_type": piv.index.to_numpy(object),
        "n_even": piv[0].to_numpy(np.int64),
        "n_odd": piv[1].to_numpy(np.int64),
    })
    # Zero guard: a corpus whose events all fall on one day-parity
    # leaves one total at 0 — define that half's share as 0 bp rather
    # than dividing by zero (the SQL oracle pins the same CASE rule).
    share_even = ((10000 * out["n_even"]) // n_even if n_even > 0
                  else pd.Series(np.int64(0), index=out.index))
    share_odd = ((10000 * out["n_odd"]) // n_odd if n_odd > 0
                 else pd.Series(np.int64(0), index=out.index))
    out["share_diff_bp"] = np.abs(share_even - share_odd).astype(np.int64)
    return out


def q_type_drift(sf_dir: str) -> pd.DataFrame:
    return type_drift(sf_dir)


# ----------------------------------------------- exact z-score outliers
def value_zscore_outliers(sf_dir: str,
                          num_buckets: int = 16) -> pd.DataFrame:
    """3σ outlier counts per event type WITHOUT computing a square
    root: ``|v − mean| > 3σ  ⟺  (v·n − S)² > 9·(n·Q − S²)`` where
    S = Σx, Q = Σx² (population variance, cross-multiplied by n²) —
    every quantity an exact integer, evaluated in Python bignums on
    the driver over the same ``value_histogram`` cells the Tukey-fence
    op reads (squares exceed int64; the SQL oracle uses HUGEINT).
    One cell-bounded shuffle; complements ``value_outliers`` with the
    parametric (moment-based) outlier definition."""
    cells = value_histogram(sf_dir, num_buckets=num_buckets).to_pandas()
    rows = []
    for et, g in cells.groupby("event_type", sort=True):
        v = [int(x) for x in g["value_bp"]]
        c = [int(x) for x in g["cnt"]]
        n = sum(c)
        s = sum(vi * ci for vi, ci in zip(v, c))
        qq = sum(vi * vi * ci for vi, ci in zip(v, c))
        var_num = n * qq - s * s          # n²·variance ≥ 0
        n_out = sum(ci for vi, ci in zip(v, c)
                    if (vi * n - s) ** 2 > 9 * var_num)
        rows.append((et, n, s, n_out))
    return pd.DataFrame(rows, columns=["event_type", "n_total",
                                       "sum_bp", "n_outliers"]).astype(
        {"n_total": np.int64, "sum_bp": np.int64, "n_outliers": np.int64})


def q_value_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    return value_zscore_outliers(sf_dir)


# ------------------------------------------------- ratio-to-report shares
def q_hourly_share(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Per (event_type, hour): event count and its share of the TYPE's
    total in truncated basis points — the ratio-to-report window shape
    (``SUM() OVER (PARTITION BY type)`` denominator). Per-batch
    (type, hour) pre-counts → one type-keyed bucketed merge where each
    type's 24 cells and its total are co-located, so the share is a
    local division."""
    from .analytics import bucketed_group_agg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = _drop_null(t)
        hour = pc.hour(t["ts"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "hour": hour.astype(np.int64),
        })
        return (df.groupby(["event_type", "hour"], sort=False)
                .size().rename("n").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["event_type", "hour"], sort=False)["n"]
               .sum().reset_index())
        tot = out.groupby("event_type", sort=False)["n"].transform("sum")
        out["n"] = out["n"].astype(np.int64)
        out["share_bp"] = ((10000 * out["n"]) //
                           tot.astype(np.int64)).astype(np.int64)
        return out

    return bucketed_group_agg(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], merge, num_buckets=num_buckets)
