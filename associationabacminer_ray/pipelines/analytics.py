"""Transcript / event analytics pipelines (the correctness-gate pack).

Each ``q_*`` function takes ``sf_dir`` and returns a Ray Dataset or a
small pandas DataFrame whose columns match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly (names AND integer-exact values —
money/doubles are folded to integer cents/basis-points with
``floor(x*100+0.5)`` so float summation order can never flip a hash).

Reference analogs: A8 per-key distinct sets, A13 grouped score
averaging, A14 per-user collect-distinct, A15 grouped count-distinct
stats, A16 hour histogram, A5/A6 top-k (SURVEY.md §2.5).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..sources.transcripts import transcripts_from_events
from ..stages.transactionize import ITEM_SEP
from .itemsets import exact_itemset_supports, transactions


def _events_transcripts(sf_dir: str):
    return transcripts_from_events(f"{sf_dir}/events.parquet")


def bucketed_group_agg(ds, key_cols: list[str], agg_fn, num_buckets: int = 32,
                       coalesce_to: int | None = None):
    """Grouped aggregation for high-cardinality keys: shuffle on
    hash(key) % B (co-locating each key fully), then one vectorized
    pandas ``agg_fn(group_df) -> df`` per bucket. Avoids Ray's ~ms
    per-group aggregate overhead (see itemsets.sum_by_key_bucketed).

    ``coalesce_to``: repartition (split/coalesce, no key shuffle) to
    this many blocks before the groupby. Ray's sort-based exchange
    cost scales with INPUT BLOCK COUNT, not bytes (measured: a 500 k-
    row 16-bucket groupby takes 3.4 s from 200 tiny blocks vs 0.38 s
    from 32 — PERF #26), and a dataset of NARROW rows derived from a
    wide read inherits the read's block count with collapsed block
    sizes at any corpus scale. Set it (callers use ~4× cluster CPUs)
    when the input rows are orders of magnitude narrower than the
    stage that produced them; leave None when blocks are already
    read-sized."""
    from ..functions.hashing import hash_strings

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        first = b[key_cols[0]]
        if len(key_cols) == 1 and first.dtype.kind in "iu":
            # numeric fast path: re-mix the integer key directly — no
            # per-row decimal-string allocation on what is often the
            # hottest shuffle (e.g. the per-token win_hash explosion)
            from ..functions.hashing import hash_any

            h = hash_any(first.reset_index(drop=True))
        else:
            key = first.astype(str)
            for c in key_cols[1:]:
                key = key + "\x1f" + b[c].astype(str)
            h = hash_strings(key)
        return b.assign(_gb=(h % np.uint64(num_buckets)).astype(np.int32))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return agg_fn(g.drop(columns=["_gb"]))

    out = ds.map_batches(add_bucket, batch_format="pandas")
    if coalesce_to is not None:
        out = out.repartition(coalesce_to)
    return out.groupby("_gb").map_groups(per_bucket, batch_format="pandas")


def q_transcripts_view(sf_dir: str):
    """The full events→transcripts mapping INCLUDING the per-conversation
    dense turn index (bucketed shuffle + stable in-group sort). Checked
    row-for-row against the SQL ROW_NUMBER oracle — this is the
    BASELINE.md per-turn text-equality / stable-ordering invariant
    exercised on the driver's own data."""
    return transcripts_from_events(f"{sf_dir}/events.parquet",
                                   with_turn_idx=True)


def _cached_event_transcripts_parquet(sf_dir: str) -> list[str]:
    """Materialize the events→transcripts mapping to /tmp parquet shards
    once per sf level (deterministic) so the conv-partitioned pipelines
    can run on it. STREAMED (VERDICT r3 #6): each conv-hash bucket is
    written as its own file INSIDE the ``map_groups`` worker — no
    full-table ``to_pandas`` on the driver, and per-file conversation
    locality holds by construction (the partitioned pipeline's contract)
    instead of by trusting block boundaries. Publish is atomic
    (tmp-dir → rename), so a failed build never half-populates the
    cache and a concurrent builder simply loses the rename race."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ..functions.hashing import hash_strings

    tag = sf_dir.strip("/").replace("/", "_")
    # _v2: carries ts so the windowed-mining derived-oracle twin can
    # apply its window predicate on the same cache (VERDICT r3 #5)
    out_dir = f"/tmp/graft_tr_cache_v2/{tag}"
    if not os.path.isdir(out_dir):
        num_buckets = 16
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)

        def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
            b = b[["conv_id", "role", "tool", "ts"]].copy()
            b["bucket"] = (hash_strings(b["conv_id"])
                           % np.uint64(num_buckets)).astype(np.int32)
            return b

        def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
            bid = int(g["bucket"].iloc[0])
            pq.write_table(
                pa.Table.from_pandas(g.drop(columns=["bucket"]),
                                     preserve_index=False),
                f"{tmp_dir}/bucket_{bid:04d}.parquet")
            return pd.DataFrame({"bucket": [bid],
                                 "rows": [np.int64(len(g))]})

        (transcripts_from_events(f"{sf_dir}/events.parquet")
         .map_batches(add_bucket, batch_format="pandas")
         .groupby("bucket")
         .map_groups(write_bucket, batch_format="pandas")
         .materialize())
        try:
            os.replace(tmp_dir, out_dir)
        except OSError:
            # another process published first; its cache is equivalent
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    return sorted(glob.glob(f"{out_dir}/*.parquet"))


def q_support_weighted(sf_dir: str):
    """Itemset supports with TURN-weighted support (Σ raw turns of the
    conversations containing the itemset — the all_log_entries analog
    that makes the Qrul_freq score family distinct). Runs the
    conv-partitioned zero-shuffle pipeline with turn tracking."""
    from .itemsets import itemset_supports_partitioned

    paths = _cached_event_transcripts_parquet(sf_dir)
    return itemset_supports_partitioned(paths, mode="exact", max_k=2,
                                        max_transaction_items=None,
                                        with_turn_counts=True)


# ------------------------------------------------------------------ mining
def q_support_items(sf_dir: str):
    """1-itemset supports: #conversations exhibiting each role=tool item."""
    sup = exact_itemset_supports(_events_transcripts(sf_dir), max_k=1, num_buckets=16,
                                 max_transaction_items=None)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"item": b["itemset"], "support": b["support"]})

    return sup.map_batches(fin, batch_format="pandas")


def q_support_pairs(sf_dir: str):
    """2-itemset supports, split into (item_a < item_b) columns."""
    sup = exact_itemset_supports(_events_transcripts(sf_dir), max_k=2, num_buckets=16,
                                 max_transaction_items=None)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["k"] == 2]
        parts = b["itemset"].str.split("\\" + ITEM_SEP, regex=True)
        return pd.DataFrame(
            {"item_a": parts.str[0].to_numpy(), "item_b": parts.str[1].to_numpy(),
             "support": b["support"].to_numpy()}
        )

    return sup.map_batches(fin, batch_format="pandas")


def q_rules_conf(sf_dir: str) -> pd.DataFrame:
    """Pairwise rules (both directions) with integer basis-point confidence
    = (10000 * support_ab) // support_a — A1/A4 analog with exact ints."""
    sup = exact_itemset_supports(_events_transcripts(sf_dir), max_k=2,
                                 num_buckets=16,
                                 max_transaction_items=None).to_pandas()
    singles = dict(zip(sup.loc[sup["k"] == 1, "itemset"],
                       sup.loc[sup["k"] == 1, "support"]))
    pairs = sup[sup["k"] == 2]
    parts = pairs["itemset"].str.split("\\" + ITEM_SEP, regex=True)
    a, b = parts.str[0].to_numpy(), parts.str[1].to_numpy()
    ab = pairs["support"].to_numpy()
    ante = np.concatenate([a, b])
    cons = np.concatenate([b, a])
    support_ab = np.concatenate([ab, ab]).astype(np.int64)
    support_a = np.array([singles[x] for x in ante], dtype=np.int64)
    return pd.DataFrame(
        {
            "antecedent": ante,
            "consequent": cons,
            "support_ab": support_ab,
            "support_a": support_a,
            "conf_bp": (10000 * support_ab) // support_a,
        }
    )


def q_transactions(sf_dir: str):
    """Per-conversation transaction strings (FIXTURES §F2 / A14 analog)."""
    return transactions(_events_transcripts(sf_dir), num_buckets=16)


def q_role_activity(sf_dir: str) -> pd.DataFrame:
    """Per role: turns, distinct conversations, distinct tools (A15)."""
    ds = _events_transcripts(sf_dir).select_columns(["role", "conv_id", "tool"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("role", sort=False).agg(
            n_turns=("role", "size"),
            distinct_convs=("conv_id", "nunique"),
            distinct_tools=("tool", "nunique"),
        ).reset_index()
        for c in ("n_turns", "distinct_convs", "distinct_tools"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_group_agg(ds, ["role"], agg, num_buckets=8).to_pandas()


# ------------------------------------------------------------------ events
def q_hour_histogram(sf_dir: str):
    """A16: events per hour-of-day."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def hour(t: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.cast(pc.hour(t["ts"]), pa.int64())})

    agg = ds.map_batches(hour, batch_format="pyarrow").groupby("hour").aggregate(
        Count(alias_name="n")
    )
    return agg.map_batches(lambda b: b.assign(n=b["n"].astype(np.int64)),
                           batch_format="pandas")


def q_daily_event_counts(sf_dir: str):
    """Tumbling daily windows per event_type: count + integer-cent sums
    (the batch analog of the reference's window jobs, WindowGenerator)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)),
                        pa.int64())
        return pa.table({"day": day, "event_type": t["event_type"],
                         "cents": cents})

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_value_cents"))
    )
    return agg.map_batches(
        lambda b: b.assign(n=b["n"].astype(np.int64),
                           sum_value_cents=b["sum_value_cents"].astype(np.int64)),
        batch_format="pandas",
    )


def q_user_activity(sf_dir: str) -> pd.DataFrame:
    """A15: per-user event count, distinct event types, value-cent sum,
    first/last event time."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)),
                        pa.int64())
        ts_us = pc.cast(t["ts"], pa.int64())
        return pa.table({"user_id": t["user_id"], "event_type": t["event_type"],
                         "cents": cents, "ts_us": ts_us})

    prepped = ds.map_batches(prep, batch_format="pyarrow")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", sort=False).agg(
            n_events=("user_id", "size"),
            distinct_event_types=("event_type", "nunique"),
            sum_value_cents=("cents", "sum"),
            first_us=("ts_us", "min"),
            last_us=("ts_us", "max"),
        ).reset_index()
        return out

    out = bucketed_group_agg(prepped, ["user_id"], agg, num_buckets=32).to_pandas()
    out["first_ts"] = pd.to_datetime(out.pop("first_us"), unit="us")
    out["last_ts"] = pd.to_datetime(out.pop("last_us"), unit="us")
    for c in ("n_events", "sum_value_cents", "distinct_event_types"):
        out[c] = out[c].astype(np.int64)
    return out[["user_id", "n_events", "distinct_event_types", "sum_value_cents",
                "first_ts", "last_ts"]]


def q_cooccurrence(sf_dir: str):
    """A9: pairwise value co-occurrence for the dependent pair
    (role → tool): per (role, tool), distinct conversations exhibiting
    the combination (the inv_param_dependency multimap in long form,
    EnvLogUniverseGenerator.py:259-267)."""
    ds = _events_transcripts(sf_dir).select_columns(["role", "tool", "conv_id"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["role", "tool"], sort=False)["conv_id"].nunique().reset_index()
        out.columns = ["role", "tool", "n_convs"]
        out["n_convs"] = out["n_convs"].astype(np.int64)
        return out

    return bucketed_group_agg(ds, ["role", "tool"], agg, num_buckets=16)


SAMPLE_MULT = 2654435761  # Knuth multiplicative hash
SAMPLE_MOD = 1 << 32
SAMPLE_KEEP = 429496729  # floor(0.1 * 2^32)


def sample_hash_values(event_ids: np.ndarray) -> np.ndarray:
    """THE sampling hash — one definition shared by every sampled query
    (and restated verbatim in the SQL oracles):
    ((event_id mod 2³²)·2654435761) mod 2³². The inner mod keeps the
    product within uint64 (< 1.15e19) so numpy stays exact and the SQL
    side can use HUGEINT without BIGINT overflow at 10¹²-row id ranges;
    for ids < 2³² it equals the plain Knuth hash."""
    ids = np.asarray(event_ids).astype(np.uint64) % np.uint64(SAMPLE_MOD)
    return (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)


def hash_sample_mask(event_ids: np.ndarray) -> np.ndarray:
    """Keep iff the sampling hash < 0.1·2³² (Bernoulli-in-expectation)."""
    return sample_hash_values(event_ids) < SAMPLE_KEEP


def q_sample_events(sf_dir: str) -> pd.DataFrame:
    """O4: seeded sampling (instance_sample_rate analog,
    ``SeparatedVarianceSelector.py:38``), deterministic multiplicative-
    hash variant: keep iff (event_id·2654435761) mod 2³² < 0.1·2³².
    Bernoulli-in-expectation like ``Dataset.random_sample`` but
    reproducible across block layouts AND in SQL, so the sample's
    aggregate is oracle-checkable (VERDICT r1 #5)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])

    def samp(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[hash_sample_mask(b["event_id"].to_numpy()),
                     ["event_type"]]

    agg = (ds.map_batches(samp, batch_format="pandas")
           .groupby("event_type").aggregate(Count(alias_name="n")).to_pandas())
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values("event_type").reset_index(drop=True)


def q_sample_events_bernoulli(sf_dir: str) -> pd.DataFrame:
    """O4 via Ray's native ``random_sample(seed)`` — the same op with
    engine-seeded randomness (rows-only: the draw depends on block
    layout, so no SQL oracle can reproduce it)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    sample = ds.random_sample(0.1, seed=42)
    agg = sample.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.sort_values("event_type").reset_index(drop=True)


def q_stratified_sample(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Deterministic stratified exemplar sampling: per event_type, the k
    events with the smallest multiplicative id-hash (an order-free
    'random k per stratum' every engine re-derives identically — the
    grouped twin of q_sample_events). Distributed as per-batch per-group
    partial top-k → tiny bucketed merge; only candidate rows shuffle."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].to_numpy().astype(np.uint64)
        h = sample_hash_values(ids)
        d = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "event_id": ids.astype(np.int64), "h": h})
        d = d.sort_values(["event_type", "h", "event_id"], kind="mergesort")
        return d.groupby("event_type", sort=False).head(k)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "h", "event_id"], kind="mergesort")
        out = g.groupby("event_type", sort=False).head(k)
        return out[["event_type", "event_id"]]

    return bucketed_group_agg(
        ds.map_batches(partial_topk, batch_format="pandas"),
        ["event_type"], merge, num_buckets=8)


def q_sessions(sf_dir: str):
    """Gap-based sessionization (streaming-shaped per the Ray guide:
    partition by key, sort by ts within the group, window with pandas):
    per user, sessions delimited by >30-min inactivity gaps — session
    count, event count, longest session. Oracle-checkable with
    LAG + cumulative-sum SQL."""
    GAP_US = 30 * 60 * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = pd.Series(g["ts"].to_numpy().astype("datetime64[us]")
                          .astype(np.int64), index=g.index)
        new_session = (
            (g["user_id"] != g["user_id"].shift())
            | ((ts_us - ts_us.shift()) > GAP_US)
        )
        g = g.assign(_sid=new_session.cumsum())
        per_session = g.groupby(["user_id", "_sid"], sort=False).size()
        out = per_session.groupby("user_id").agg(["size", "sum", "max"]).reset_index()
        out.columns = ["user_id", "n_sessions", "n_events", "max_session_events"]
        for c in ("n_sessions", "n_events", "max_session_events"):
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_group_agg(ds, ["user_id"], agg, num_buckets=16)


def q_policy_eval_fixed(sf_dir: str) -> pd.DataFrame:
    """A12 confusion-matrix counts for a DETERMINISTIC fixed policy (so
    the whole mine→score loop is DuckDB-oracle-checkable, unlike the
    windowed greedy variant): rules = the top-2 item pairs by support
    (count desc, then item names — the A5 tie-break), each "conv must
    contain both items". Classification is distributed: the 2-rule
    policy is broadcast into map_batches (semi-join J1), exact counts
    and distinct-transaction counts come back as partial sums
    (EnvPolicyEvaluator.py:202-252 semantics, window-scale exact path)."""
    from ray.data.aggregate import Sum

    from .evaluate import policy_allows

    ds = _events_transcripts(sf_dir)
    sup = exact_itemset_supports(ds, max_k=2, num_buckets=16,
                                 max_transaction_items=None).to_pandas()
    pairs = sup[sup["k"] == 2]
    parts = pairs["itemset"].str.split("\\" + ITEM_SEP, regex=True)
    cand = pd.DataFrame({"item_a": parts.str[0], "item_b": parts.str[1],
                         "support": pairs["support"].to_numpy()})
    top2 = cand.sort_values(["support", "item_a", "item_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(2)
    rules = pd.DataFrame({"antecedent": top2["item_a"].to_numpy(),
                          "consequent": top2["item_b"].to_numpy()})

    tx = transactions(ds, num_buckets=16)

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        allowed = policy_allows(b, rules)
        return pd.DataFrame({"items": b["items"].to_numpy(),
                             "allowed": allowed.astype(np.int64),
                             "one": np.ones(len(b), dtype=np.int64)})

    # materialized once: the Sum aggregate and the bucketed unique pass
    # would otherwise each re-run the transactions build + classify
    classified = tx.map_batches(classify, batch_format="pandas").materialize()
    c = classified.aggregate(Sum("allowed", alias_name="c_tp"),
                             Sum("one", alias_name="n_tx"))

    def uniq_partial(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("items")
        return pd.DataFrame({"u_n": [np.int64(len(u))],
                             "u_tp": [np.int64(u["allowed"].sum())]})

    u = bucketed_group_agg(classified, ["items"], uniq_partial,
                           num_buckets=16).to_pandas()
    n_tx, c_tp = int(c["n_tx"]), int(c["c_tp"])
    u_tx, u_tp = int(u["u_n"].sum()), int(u["u_tp"].sum())
    return pd.DataFrame([{
        "n_tx": np.int64(n_tx), "c_tp": np.int64(c_tp),
        "c_fn": np.int64(n_tx - c_tp), "u_tx": np.int64(u_tx),
        "u_tp": np.int64(u_tp), "u_fn": np.int64(u_tx - u_tp),
        "n_rules": np.int64(len(rules)),
    }])


def q_top_events(sf_dir: str) -> pd.DataFrame:
    """A5/A6: top-5 event types by count (deterministic tie-break)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
    agg = ds.groupby("event_type").aggregate(Count(alias_name="n")).to_pandas()
    agg["n"] = agg["n"].astype(np.int64)
    return (agg.sort_values(["n", "event_type"], ascending=[False, True])
            .head(5).reset_index(drop=True))


# ------------------------------------------------- weighted sampling (A-ES)
WEIGHTED_SAMPLE_K = 20


def weighted_sample_by_type(sf_dir: str,
                            k: int = WEIGHTED_SAMPLE_K) -> pd.DataFrame:
    """STRATIFIED A-ES weighted sampling: an independent
    Efraimidis–Spirakis top-k per event_type (the per-source
    importance-sampling shape mixture building needs — each stratum's
    inclusion probability stays proportional to weight WITHIN the
    stratum). Same distributed shape as ``weighted_sample_events``
    (per-batch padded np.log prune per group, exact shared-libm re-key
    on the bounded candidates), same derived single-statement oracle
    (``functions.sqlgen.weighted_sample_by_type_sql`` — ROW_NUMBER per
    stratum over the identical float key)."""
    pad = 32
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def per_batch(t: pa.Table) -> pd.DataFrame:
        from ..functions.hashing import hash_ints
        from .temporal import _drop_null, _fold_bp
        t = _drop_null(t)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        types = np.asarray(t["event_type"].to_pylist(), dtype=object)
        w_bp = _fold_bp(t["value"])
        ok = w_bp > 0
        ids, types, w_bp = ids[ok], types[ok], w_bp[ok]
        u = (hash_ints(ids).astype(np.float64) + 1.0) / 2.0 ** 64
        key = np.log(u) / (w_bp.astype(np.float64) / 10000.0)
        df = pd.DataFrame({"event_type": types, "event_id": ids,
                           "weight_bp": w_bp, "key": key})
        return (df.sort_values(["event_type", "key", "event_id"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby("event_type", sort=False).head(k + pad))

    cand = (ev.map_batches(per_batch, batch_format="pyarrow")
            .to_pandas())  # groups×blocks×(k+pad) — bounded small side
    from ..functions.hashing import hash_ints as _hi
    ids = cand["event_id"].to_numpy(np.int64)
    u = (_hi(ids).astype(np.float64) + 1.0) / 2.0 ** 64
    w = cand["weight_bp"].to_numpy(np.int64).astype(np.float64) / 10000.0
    cand = cand.assign(key=np.array(
        [math.log(x) for x in u], np.float64) / w)
    cand = (cand.sort_values(["event_type", "key", "event_id"],
                             ascending=[True, False, True],
                             kind="mergesort")
            .groupby("event_type", sort=False).head(k)
            .reset_index(drop=True))
    cand["rank"] = cand.groupby("event_type", sort=False).cumcount() + 1
    return pd.DataFrame({
        "event_type": cand["event_type"].to_numpy(object),
        "rank": cand["rank"].to_numpy(np.int64),
        "event_id": cand["event_id"].to_numpy(np.int64),
        "weight_bp": cand["weight_bp"].to_numpy(np.int64),
    })


def weighted_sample_events(sf_dir: str,
                           k: int = WEIGHTED_SAMPLE_K) -> pd.DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each row's key is ln(u)/w with u derived DETERMINISTICALLY
    from hash64(event_id) — so the sample is a pure function of the
    corpus (reproducible, partition-independent) while inclusion
    probability stays proportional to weight. The O4 Bernoulli sampler
    generalized to weights; weight = the event's ``value``.

    Distributed shape: top-k by key is mergeable, so each batch prunes
    to its own k+pad rows and the driver reduces blocks×(k+pad)
    candidates — never the corpus. The hot per-batch prune ranks with
    vectorized ``np.log`` (SIMD, ≤1 ulp off glibc) under a pad margin
    of {pad}; the FINAL selection recomputes the ≤ blocks×(k+pad)
    candidate keys with ``math.log`` — bit-identical to DuckDB ``ln``
    — so the result is reproduced exactly by the DERIVED single-
    statement oracle ``functions.sqlgen.weighted_sample_sql`` (which
    retired the former pinned golden). A 1-ulp key perturbation can
    only drop a true top-k row if >pad keys at a batch boundary are
    ulp-coincident — pytest asserts the padded np-prune is a superset
    of the exact selection on the real corpus."""
    pad = 32
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def per_batch(t: pa.Table) -> pd.DataFrame:
        from ..functions.hashing import hash_ints
        from .temporal import _drop_null, _fold_bp
        t = _drop_null(t)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w_bp = _fold_bp(t["value"])
        ok = w_bp > 0  # zero/negative weight can never be sampled
        ids, w_bp = ids[ok], w_bp[ok]
        # u in (0,1]: (h+1)/2^64; key = ln(u)/w — max-k on key is the
        # classic u^(1/w) order without the pow
        u = (hash_ints(ids).astype(np.float64) + 1.0) / 2.0 ** 64
        key = np.log(u) / (w_bp.astype(np.float64) / 10000.0)
        df = pd.DataFrame({"event_id": ids, "weight_bp": w_bp, "key": key})
        return df.sort_values(["key", "event_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k + pad)

    cand = (ev.map_batches(per_batch, batch_format="pyarrow")
            .to_pandas())  # blocks×(k+pad) candidates — bounded small side
    # exact re-key with shared-libm log (math.log ≡ DuckDB ln) on the
    # bounded candidate set only — the hot path stays vectorized
    from ..functions.hashing import hash_ints as _hi
    ids = cand["event_id"].to_numpy(np.int64)
    u = (_hi(ids).astype(np.float64) + 1.0) / 2.0 ** 64
    w = cand["weight_bp"].to_numpy(np.int64).astype(np.float64) / 10000.0
    cand = cand.assign(key=np.array(
        [math.log(x) for x in u], np.float64) / w)
    cand = cand.sort_values(["key", "event_id"], ascending=[False, True],
                            kind="mergesort").head(k)
    out = cand.reset_index(drop=True)
    return pd.DataFrame({
        "rank": np.arange(1, len(out) + 1, dtype=np.int64),
        "event_id": out["event_id"].to_numpy(np.int64),
        "weight_bp": out["weight_bp"].to_numpy(np.int64),
    })


def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    return weighted_sample_events(sf_dir)


def q_weighted_sample_by_type(sf_dir: str) -> pd.DataFrame:
    return weighted_sample_by_type(sf_dir)
