"""Ordered-sequence operators over a keyed event stream: LAG/lead
gaps, ordered path aggregation (trajectory strings), trajectory-prefix
frequency, and first-order transition counts.

The reference treats a window's events as an unordered bag (dedup by
content hash, ``src/model/EnvLogUniverseGenerator.py:91-94``) — order
only ever matters to it through the pre-sliced Mongo time bounds. A
transcript-scale training-data pipeline needs the *ordered* family:
"what preceded this turn", "what is this conversation's tool
trajectory", "which trajectories are common", "what transitions does
the stream make". All are one keyed hash shuffle + a vectorized
per-bucket kernel — the same partitioning contract as every keyed
groupby here (one key's rows co-locate in one bucket group; path
length is bounded by the per-key row count, which for transcripts is
the conversation length, not the corpus size).

Gate conventions (see ``graft-gate-conventions``): integer or plain
string outputs only; the NULL contract is pinned on both sides (the
engine drops NULL input rows, every SQL oracle carries the matching
``IS NOT NULL`` predicates); ordering ties break on ``event_id`` in
both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions.hashing import hash_ints, hash_strings
from .temporal import _ts_us

PATH_SEP = ">"
TOP_PATHS_K = 20
TOP_PATHS_PREFIX = 5


def _prep_events(t: pa.Table, num_buckets: int,
                 with_type: bool = False) -> pd.DataFrame:
    """Shared null-dropping + user-bucketing projection for every
    sequence operator (one copy so the bucketing/null contract cannot
    drift between them)."""
    t = t.drop_null()
    cols = {
        "event_id": t["event_id"].to_numpy(zero_copy_only=False),
        "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        "ts_us": _ts_us(t["ts"]),
    }
    if with_type:
        cols["event_type"] = t["event_type"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame(cols)
    df["bucket"] = (hash_ints(df["user_id"]) %
                    np.uint64(num_buckets)).astype(np.int32)
    return df


# ------------------------------------------------------------- LAG / gaps
def user_event_gaps(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per event: the previous event of the same user and the gap to it
    — the SQL ``LAG() OVER (PARTITION BY user ORDER BY ts, event_id)``
    window, computed without a global sort: one hash shuffle on the
    user, then a vectorized shift inside each bucket-sorted segment.
    The first event of each user has no predecessor and is dropped
    (inner semantics, mirrored by the oracle's ``WHERE prev IS NOT
    NULL``)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        users = g["user_id"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        # row i's predecessor is row i-1 unless a new user segment starts
        keep = np.r_[False, users[1:] == users[:-1]]
        at = np.flatnonzero(keep)
        return pd.DataFrame({
            "event_id": ids[at],
            "prev_event_id": ids[at - 1],
            "gap_us": ts[at] - ts[at - 1],
        })

    return (ev.map_batches(lambda t: _prep_events(t, num_buckets),
                           batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: gaps_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_user_event_gaps(sf_dir: str) -> rd.Dataset:
    return user_event_gaps(sf_dir)


# --------------------------------------------------- ordered path aggregation
def user_paths(sf_dir: str, sep: str = PATH_SEP, max_steps: int | None = None,
               num_buckets: int = 16) -> rd.Dataset:
    """Per user: the ordered event-type trajectory string (ordered by
    (ts, event_id)) and its step count — the SQL ``string_agg(...
    ORDER BY ts, event_id)`` shape. ``max_steps`` truncates each user's
    sequence to its first N *rows before joining* (the oracle's
    ``rn <= N`` — truncating the joined string would miscount whenever
    an event_type contains the separator). One hash shuffle on the
    user; the per-bucket kernel sorts once and joins per user segment.
    The output row size is bounded by the per-key sequence length
    (conversation length for transcripts), the documented partitioning
    assumption of every keyed operator here."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def paths_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        if max_steps is not None:
            g = g[g.groupby("user_id", sort=False).cumcount() < max_steps]
        agg = (g.groupby("user_id", sort=False)["event_type"]
               .agg([("path", sep.join), ("n_steps", "size")])
               .reset_index())
        agg["user_id"] = agg["user_id"].astype(np.int64)
        agg["n_steps"] = agg["n_steps"].astype(np.int64)
        return agg[["user_id", "path", "n_steps"]]

    return (ev.map_batches(lambda t: _prep_events(t, num_buckets,
                                                  with_type=True),
                           batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: paths_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_user_paths(sf_dir: str) -> rd.Dataset:
    return user_paths(sf_dir)


# ----------------------------------------------------- trajectory frequency
def top_paths(sf_dir: str, k: int = TOP_PATHS_K,
              prefix_len: int = TOP_PATHS_PREFIX,
              num_buckets: int = 16) -> rd.Dataset:
    """Most common trajectory *prefixes* (first ``prefix_len`` steps):
    full paths are near-unique, so frequency mining operates on the
    bounded prefix — the sequence analog of the itemset top-k (A6).
    The prefix is truncated at the event-row level inside
    ``user_paths`` (never by splitting the joined string, which would
    break if a type contained the separator).

    Composition: ``user_paths(max_steps)`` → per-batch partial counts
    → one bucketed count shuffle keyed on the prefix hash → global
    ``sort + limit`` with the (n_users DESC, path ASC) tie-break pinned
    on both sides. Only (prefix, partial-count) rows shuffle."""
    paths = user_paths(sf_dir, max_steps=prefix_len,
                       num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df["path"].value_counts().rename_axis("path")
               .rename("n_users").reset_index())
        out["bucket"] = (hash_strings(out["path"].to_numpy(object)) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("path", sort=False)["n_users"].sum().reset_index()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    merged = (paths.map_batches(partial, batch_format="pandas")
              .groupby("bucket")
              .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                          batch_format="pandas"))
    return (merged.sort(["n_users", "path"], descending=[True, False])
            .limit(k))


def q_top_paths(sf_dir: str) -> rd.Dataset:
    return top_paths(sf_dir)


# ------------------------------------------------------- Markov transitions
def type_transitions(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """First-order transition counts over each user's ordered event
    stream: how often ``prev_type → next_type`` occurs (the Markov /
    sequence-bigram matrix an LM-style sequence model trains on).

    Same bucket-sorted kernel as ``user_event_gaps``; each bucket
    pre-counts its pairs, so the final shuffle carries at most
    |types|² cells per bucket — the per-type-pair groupby after it
    touches a types²-sized table, never the event stream."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        users = g["user_id"].to_numpy(np.int64)
        types = g["event_type"].to_numpy(object)
        keep = np.r_[False, users[1:] == users[:-1]]
        at = np.flatnonzero(keep)
        pairs = pd.DataFrame({
            "prev_type": types[at - 1],
            "next_type": types[at],
        })
        out = (pairs.groupby(["prev_type", "next_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = (ev.map_batches(lambda t: _prep_events(t, num_buckets,
                                                      with_type=True),
                               batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: count_bucket(g.drop(columns=["bucket"])),
                            batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "prev_type": [g["prev_type"].iloc[0]],
            "next_type": [g["next_type"].iloc[0]],
            "n": np.array([g["n"].sum()], np.int64),
        })

    return (partials.groupby(["prev_type", "next_type"])
            .map_groups(merge, batch_format="pandas"))


def q_type_transitions(sf_dir: str) -> rd.Dataset:
    return type_transitions(sf_dir)


# ---------------------------------------------- sequential pair support
def seq_pair_support(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """GSP/PrefixSpan-style length-2 sequential-pattern support: per
    ORDERED type pair (a, b), the number of users with an ``a`` event
    STRICTLY before a ``b`` event — gaps allowed, unlike the adjacent
    bigrams of ``type_transitions``. The sequence analog of the
    miner's pair support counting (itemset supports ignore order;
    this is the ordered contract, ``a.min_ts < b.max_ts`` per user —
    exactly "∃ a-event before b-event").

    Distributed shape: a per-batch (user, type) → (min_ts, max_ts)
    combiner shrinks the stream to ≤ users×types rows before the ONE
    user-keyed shuffle; the per-bucket kernel pivots to a users×types
    timestamp matrix and counts each ordered pair with a vectorized
    column comparison (the loop is over the |types|² pair grid, O(1)
    vector ops each — never over rows or users). At most |types|²
    partial rows leave each bucket."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ts_us": _ts_us(t["ts"]),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
        })
        g = (df.groupby(["user_id", "event_type"], sort=False)["ts_us"]
             .agg(mn="min", mx="max").reset_index())
        return g.astype({"mn": np.int64, "mx": np.int64})

    parts = ev.map_batches(partial, batch_format="pyarrow")

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby(["user_id", "event_type"], sort=False)
             .agg(mn=("mn", "min"), mx=("mx", "max")).reset_index())
        mnp = m.pivot(index="user_id", columns="event_type", values="mn")
        mxp = m.pivot(index="user_id", columns="event_type", values="mx")
        # NaN marks a type the user never emitted; NaN comparisons are
        # False, so absence is excluded for free. float64 is EXACT for
        # |ts_us| < 2^53 (year ~2255) — refuse loudly past that.
        if np.int64(m["mx"].max()) >= (1 << 53):
            raise ValueError("ts_us exceeds float64-exact range")
        A = mnp.to_numpy(np.float64)
        B = mxp.to_numpy(np.float64)
        types = mnp.columns.to_numpy(object)
        rows = []
        for i, a in enumerate(types):
            # users with an 'a' strictly before each candidate 'b'
            n_ab = (A[:, i][:, None] < B).sum(axis=0).astype(np.int64)
            for j, b in enumerate(types):
                if i != j and n_ab[j] > 0:
                    rows.append((a, b, n_ab[j]))
        if not rows:
            return pd.DataFrame({
                "antecedent": pd.Series([], dtype=object),
                "consequent": pd.Series([], dtype=object),
                "n_users": pd.Series([], dtype=np.int64)})
        out = pd.DataFrame(rows,
                           columns=["antecedent", "consequent", "n_users"])
        return out.astype({"n_users": np.int64})

    from .analytics import bucketed_group_agg

    cells = bucketed_group_agg(parts, ["user_id"], pair_bucket,
                               num_buckets=num_buckets).to_pandas()
    if cells.empty:
        return pd.DataFrame({"antecedent": pd.Series([], dtype=object),
                             "consequent": pd.Series([], dtype=object),
                             "n_users": pd.Series([], dtype=np.int64)})
    out = (cells.groupby(["antecedent", "consequent"], sort=True)["n_users"]
           .sum().astype(np.int64).reset_index())
    return out


def q_seq_pair_support(sf_dir: str) -> pd.DataFrame:
    return seq_pair_support(sf_dir)


# ------------------------------------------------------------------- funnel
FUNNEL_STEPS = ("signup", "view", "purchase")


def _funnel_prep(t: pa.Table, steps: tuple[str, ...],
                 num_buckets: int) -> pd.DataFrame:
    """Shared funnel projection: null contract via ``_prep_events``,
    then drop non-funnel types and the (null-checked but unused)
    event_id BEFORE bucketing — only funnel-relevant rows shuffle."""
    df = _prep_events(t, num_buckets, with_type=True)
    df = df[df["event_type"].isin(steps)]
    return df.drop(columns=["event_id"])


def _step_bounds(g: pd.DataFrame,
                 steps: tuple[str, ...]) -> list[pd.DataFrame]:
    """THE greedy chain-walk (one copy for funnel_counts AND
    user_conversion_gaps so the >-vs->= / null semantics cannot
    drift): per step, the per-user earliest completion time given the
    previous step's bound — step k counts only at ``ts`` STRICTLY
    greater than the user's bound for step k-1. Returns one
    (user_id, t) frame per step."""
    bound = None
    bounds = []
    for step in steps:
        rows = g[g["event_type"] == step]
        if bound is not None:
            rows = rows.merge(bound, on="user_id", how="inner",
                              suffixes=("", "_prev"))
            rows = rows[rows["ts_us"] > rows["t"]]
            rows = rows[["user_id", "ts_us"]]
        bound = (rows.groupby("user_id", sort=False)["ts_us"].min()
                 .rename("t").reset_index())
        bounds.append(bound)
    return bounds


def funnel_counts(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS,
                  num_buckets: int = 16) -> rd.Dataset:
    """Ordered conversion funnel: for each step k, how many users
    completed steps 1..k IN ORDER — step k must occur at a timestamp
    STRICTLY greater than the user's earliest valid completion of step
    k-1 (earliest-completion greedy semantics; equal-timestamp steps do
    not advance the funnel, pinned identically in the SQL oracle's
    ``e.ts > prev.t`` joins).

    One user-keyed shuffle; non-funnel event types and the (null-
    checked but otherwise unused) event_id column are dropped BEFORE
    bucketing, so only funnel-relevant (user, ts, type) rows shuffle.
    Each bucket resolves its users' step times with vectorized
    per-step groupby-min + merge (no per-user loop) and emits |steps|
    partial counts, so the final merge touches |steps| × buckets rows
    (a constant zero-count seed per step keeps the output exactly
    |steps| rows even on an empty/fully-null input, matching the
    oracle's unconditional COUNT(*) rows)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        return _funnel_prep(t, steps, num_buckets)

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bounds = _step_bounds(g, steps)
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "step_type": np.array(steps, object),
            "n_users": np.array([len(b) for b in bounds], np.int64),
        })

    seed = rd.from_pandas(pd.DataFrame({
        "step": np.arange(1, len(steps) + 1, dtype=np.int64),
        "step_type": np.array(steps, object),
        "n_users": np.zeros(len(steps), np.int64),
    }))

    partials = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: funnel_bucket(
                    g.drop(columns=["bucket"])), batch_format="pandas")
                .union(seed))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "step": np.array([g["step"].iloc[0]], np.int64),
            "step_type": [g["step_type"].iloc[0]],
            "n_users": np.array([g["n_users"].sum()], np.int64),
        })

    return partials.groupby("step").map_groups(merge, batch_format="pandas")


def q_funnel_counts(sf_dir: str) -> rd.Dataset:
    return funnel_counts(sf_dir)


# ------------------------------------------------- conversion-time analysis
def user_conversion_gaps(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS,
                         num_buckets: int = 16) -> rd.Dataset:
    """Per user completing the WHOLE funnel: microseconds from the
    first step's earliest occurrence to the chain's valid completion
    of the last step (same earliest-completion greedy bounds as
    ``funnel_counts``). One user-keyed shuffle; each bucket walks the
    step chain with the same vectorized groupby-min + merge and emits
    (user_id, gap_us) for users whose chain completed."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pd.DataFrame:
        return _funnel_prep(t, steps, num_buckets)

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bounds = _step_bounds(g, steps)
        first = bounds[0].rename(columns={"t": "t0"})
        done = bounds[-1].merge(first, on="user_id", how="inner")
        return pd.DataFrame({
            "user_id": done["user_id"].to_numpy(np.int64),
            "gap_us": (done["t"].to_numpy(np.int64)
                       - done["t0"].to_numpy(np.int64)),
        })

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: gaps_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_conversion_gaps(sf_dir: str) -> rd.Dataset:
    return user_conversion_gaps(sf_dir)


CONV_QUANTILE_PCTS = (25, 50, 75, 90, 99)


def conversion_time_quantiles(sf_dir: str,
                              pcts=CONV_QUANTILE_PCTS,
                              num_buckets: int = 16) -> rd.Dataset:
    """Exact discrete quantiles of the conversion gap in SECONDS —
    the histogram-reduction layout of ``temporal.exact_value_quantiles``
    with the shared ``temporal.quantile_rank_pick`` rule, composed on
    top of ``user_conversion_gaps``. The gap is folded ``us // 1e6``
    on BOTH sides (gaps are non-negative, so floor == trunc) — the
    fold is what bounds the histogram: raw microsecond gaps are
    near-unique per user, so without it the shuffle and the single
    pick task would scale with converting users instead of with the
    seconds domain."""
    from .temporal import quantile_rank_pick

    gaps = user_conversion_gaps(sf_dir, num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = ((df["gap_us"] // 1_000_000).value_counts()
               .rename_axis("gap_s").rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        out["bucket"] = (hash_ints(out["gap_s"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gap_s", sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        out["all"] = np.int8(0)
        return out

    hist = (gaps.map_batches(partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))

    pct_arr = np.array(pcts, np.int32)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("gap_s", kind="mergesort")
        return pd.DataFrame({
            "q_pct": pct_arr,
            "gap_s": quantile_rank_pick(g["gap_s"].to_numpy(np.int64),
                                        g["cnt"].to_numpy(np.int64),
                                        pct_arr),
        })

    return (hist.groupby("all")
            .map_groups(lambda g: pick(g.drop(columns=["all"])),
                        batch_format="pandas"))


def q_conversion_time_quantiles(sf_dir: str) -> rd.Dataset:
    return conversion_time_quantiles(sf_dir)


# ----------------------------------------------------- running cumulative sum
def user_running_total(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per-event running total of event value per user — the
    ``SUM(...) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)`` window shape (the cumulative-exposure /
    spend-so-far feature every training-data join wants). One hash
    shuffle on the user key, then a vectorized sort + grouped cumsum
    per bucket; values fold to integer cents BEFORE accumulating so
    the running sums are exact int64 on both engines (a float cumsum
    would drift order-sensitively). Ties are impossible within a user
    (event_id is unique) but the (ts_us, event_id) sort key and the
    oracle's ROWS frame pin the order anyway."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pd.DataFrame:
        from .relational import _cents

        t = t.drop_null()
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": _ts_us(t["ts"]),
            "cents": _cents(t["value"]).to_numpy(zero_copy_only=False),
        })
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def cumsum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        out = pd.DataFrame({
            "event_id": g["event_id"].astype(np.int64).to_numpy(),
            "user_id": g["user_id"].astype(np.int64).to_numpy(),
            "cum_value_cents": g.groupby("user_id", sort=False)["cents"]
                                .cumsum().astype(np.int64).to_numpy(),
        })
        return out

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: cumsum_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_user_running_total(sf_dir: str) -> rd.Dataset:
    return user_running_total(sf_dir)


# ------------------------------------------------- trajectory pattern match
# (pattern_name, regex) — boolean containment semantics identical in
# Python re.search and DuckDB regexp_matches for this feature class
# (literals, alternation-free groups, * quantifier, ^ anchor)
PATH_PATTERNS: list[tuple[str, str]] = [
    ("view_then_purchase", "view(>[a-z0-9]+)*>purchase"),
    ("starts_with_signup", "^signup"),
    ("error_repeat", "error>error"),
]


def path_pattern_counts(sf_dir: str,
                        patterns: list[tuple[str, str]] | None = None
                        ) -> pd.DataFrame:
    """MATCH_RECOGNIZE-lite: how many users' ordered event trajectories
    match each regex pattern — sequence-pattern analytics over the
    ``user_paths`` trajectory strings (sessions funnels, retry loops,
    onboarding flows). Per batch, each compiled pattern runs
    vectorized over the batch's paths and only (pattern, partial
    count) rows reach the driver."""
    import re as _re

    pats = patterns if patterns is not None else PATH_PATTERNS
    compiled = [(name, _re.compile(rx)) for name, rx in pats]
    paths = user_paths(sf_dir)

    def count_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows = [(name, int(b["path"].str.contains(rx).sum()))
                for name, rx in compiled]
        return pd.DataFrame({"pattern": [r[0] for r in rows],
                             "n_users": np.array([r[1] for r in rows],
                                                 np.int64)})

    parts = paths.map_batches(count_batch,
                              batch_format="pandas").to_pandas()
    if not len(parts):
        # zero path batches: the oracle still emits one zero row per
        # pattern (COUNT FILTER over an empty CTE)
        return pd.DataFrame({
            "pattern": sorted(name for name, _ in compiled),
            "n_users": np.zeros(len(compiled), np.int64)})
    out = (parts.groupby("pattern", sort=True)["n_users"].sum()
           .astype(np.int64).reset_index())
    return out


def q_path_pattern_counts(sf_dir: str) -> pd.DataFrame:
    return path_pattern_counts(sf_dir)


# ------------------------------------------------------- gaps and islands
def user_streaks(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Consecutive-active-day streaks per user (the classic
    gaps-and-islands window shape): an active day is a distinct
    (user, day) pair (day = trunc epoch // 86400, DuckDB semantics via
    ``temporal.day_num_trunc``); a streak is a maximal run of
    consecutive days. Per user: active-day count, streak count, and
    longest streak. Per-batch (user, day) dedup → one user-keyed hash
    shuffle of deduped day rows → vectorized island detection per
    bucket (sorted diff ≠ 1 starts a new island — the ``day −
    ROW_NUMBER()`` trick without the window function)."""
    from .temporal import _ts_us, day_num_trunc

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def dedup_days(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "day": day_num_trunc(_ts_us(t["ts"])),
        })
        df = df.drop_duplicates()
        df["bucket"] = (hash_ints(df["user_id"].to_numpy(np.int64))
                        % np.uint64(num_buckets)).astype(np.int32)
        return df

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        new_island = np.ones(len(g), bool)
        if len(g) > 1:
            new_island[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        island_id = np.cumsum(new_island)
        df = pd.DataFrame({"user_id": u, "island": island_id})
        lens = (df.groupby(["user_id", "island"], sort=False)
                .size().rename("len").reset_index())
        out = lens.groupby("user_id", sort=False).agg(
            n_active_days=("len", "sum"), n_streaks=("len", "size"),
            longest_streak=("len", "max")).reset_index()
        for c in ("n_active_days", "n_streaks", "longest_streak"):
            out[c] = out[c].astype(np.int64)
        return out

    return (ev.map_batches(dedup_days, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: islands(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_user_streaks(sf_dir: str) -> rd.Dataset:
    return user_streaks(sf_dir)


# ----------------------------------------------- bounded interval self-join
PAIR_WINDOW_US = 3_600_000_000  # 1 hour


def event_pairs_within(sf_dir: str, window_us: int = PAIR_WINDOW_US,
                       num_buckets: int = 16) -> rd.Dataset:
    """Ordered same-user event-type pairs within a bounded time window
    — the interval SELF-join (a precedes b, ``tb − ta ≤ window``)
    aggregated to transition-pair counts. Unlike ``type_transitions``
    (adjacent bigrams only) this counts EVERY qualifying predecessor,
    the market-basket-with-time shape. Order is (ts, event_id)
    lexicographic, so equal-timestamp pairs count exactly once, in id
    order — pinned identically in the SQL oracle's join predicate.

    Layout: one user-keyed hash shuffle; per bucket a per-user
    vectorized pass — one cumulative count vector per predecessor type
    gives each row's windowed predecessor count via positional
    ``searchsorted`` window bounds, so per-user work is O(types·n)
    time and O(n + types²) resident memory, never O(n²) pair
    enumeration and never a dense types×rows matrix."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])

    def prep(t: pa.Table) -> pd.DataFrame:
        return _prep_events(t, num_buckets, with_type=True)

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        types = g["event_type"].to_numpy(object)
        pair_counts: dict[tuple, int] = {}
        for _, seg in g.groupby("user_id", sort=False):
            idx = seg.index.to_numpy()
            ts = seg["ts_us"].to_numpy(np.int64)
            # per-SEGMENT type universe: memory is bounded by the types
            # this user actually touches, not the bucket's whole domain
            seg_types, codes = np.unique(types[idx], return_inverse=True)
            n_types = len(seg_types)
            m = len(idx)
            # window start for row i: first position with ts ≥ ts_i − w
            start = np.searchsorted(ts, ts - np.int64(window_us),
                                    side="left")
            pos = np.arange(m)
            # One cumulative vector PER predecessor type, never the
            # dense types×rows matrix (review fix: a heavy user made
            # that O(types·events·8B) resident per bucket). Resident
            # memory is now O(rows + types²); time stays O(types·rows).
            mat = np.zeros((n_types, n_types), np.int64)
            for ta in range(n_types):
                cum_ta = np.concatenate(
                    ([0], np.cumsum((codes == ta).astype(np.int64))))
                # predecessors of row i of type ta: positions
                # [start_i, i) — all strictly before row i in
                # (ts, event_id) order under the mergesort above
                wcount = cum_ta[pos] - cum_ta[start]
                np.add.at(mat[ta], codes, wcount)        # int64-exact
            for ta, tb in zip(*np.nonzero(mat)):
                key = (seg_types[ta], seg_types[tb])
                pair_counts[key] = pair_counts.get(key, 0) \
                    + int(mat[ta, tb])
        if not pair_counts:
            return pd.DataFrame({"type_a": np.array([], object),
                                 "type_b": np.array([], object),
                                 "n_pairs": np.array([], np.int64)})
        keys = list(pair_counts)
        return pd.DataFrame({
            "type_a": np.array([k[0] for k in keys], object),
            "type_b": np.array([k[1] for k in keys], object),
            "n_pairs": np.array([pair_counts[k] for k in keys], np.int64),
        })

    partials = (ev.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(lambda g: count_pairs(g.drop(columns=["bucket"])),
                            batch_format="pandas"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["type_a", "type_b"], sort=False)["n_pairs"]
               .sum().reset_index())
        out["n_pairs"] = out["n_pairs"].astype(np.int64)
        return out

    from .analytics import bucketed_group_agg

    return bucketed_group_agg(partials, ["type_a", "type_b"], merge,
                              num_buckets=4)


def q_event_pairs_1h(sf_dir: str) -> rd.Dataset:
    return event_pairs_within(sf_dir)


# ------------------------------------------------- ROWS-frame moving sum
MOVING_ROWS = 3


def q_moving_sum(sf_dir: str, k: int = MOVING_ROWS,
                 num_buckets: int = 16) -> rd.Dataset:
    """Per event: sum of the last ``k`` values (cents) of the same user
    — the ``ROWS BETWEEN k−1 PRECEDING AND CURRENT ROW`` frame (the
    row-count frame family, complementing the time-RANGE rolling
    aggregate and the UNBOUNDED running total). One user-keyed hash
    shuffle; inside each bucket-sorted segment the frame sum is
    ``cumsum[i] − cumsum[i−k]`` with a per-user reset — all
    vectorized, integer cents end to end."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pd.DataFrame:
        from .relational import _cents

        t = t.drop_null()
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ts_us": _ts_us(t["ts"]),
            "cents": _cents(t["value"]).to_numpy(zero_copy_only=False),
        })
        df["bucket"] = (hash_ints(df["user_id"].to_numpy(np.int64))
                        % np.uint64(num_buckets)).astype(np.int32)
        return df

    def frame_sum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        cents = g["cents"].to_numpy(np.int64)
        users = g["user_id"].to_numpy(np.int64)
        csum = np.cumsum(cents)
        n = len(g)
        idx = np.arange(n)
        # first row index of each user's segment
        seg_start = np.zeros(n, np.int64)
        if n:
            new_seg = np.ones(n, bool)
            new_seg[1:] = users[1:] != users[:-1]
            seg_start = idx[new_seg][np.cumsum(new_seg) - 1]
        lo = np.maximum(idx - (k - 1), seg_start)
        prev = np.where(lo > 0, csum[lo - 1], 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": users,
            "moving_sum_cents": (csum - prev).astype(np.int64),
        })

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: frame_sum(g.drop(columns=["bucket"])),
                        batch_format="pandas"))
