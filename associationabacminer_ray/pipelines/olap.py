"""OLAP-shape operators the reference reaches through Elasticsearch
aggregations and hand-written loops, re-expressed as Ray Data
shuffles: per-group top-N rows, pivot/crosstab, hash anti-join,
ROLLUP, and keyed set difference.

Reference analogs: the top-500-of-2000 per-chunk truncation
(``src/eval/EnvOverassignmentCalculator.py:191-196``) is per-group
top-N; the ES terms aggregations behind universe counts
(``src/eval/EnvOverassignmentCalculator.py:59-106``) are pivots; the
covered-entry ``delete_by_query`` (``src/EnvAbacRuleMiner.py:268-272``)
is an anti-join; ``ScoreAggregator``'s config-hash averaging plus its
grand summaries (``src/job/ScoreAggregator.py:27-56``) is a ROLLUP.

Scale notes per operator are on the functions. Gate conventions as in
``pipelines.sequence``: integer/string outputs, NULL contract pinned on
both sides, deterministic tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import hash_ints
from .analytics import bucketed_group_agg
from .relational import _cents
from .temporal import _ts_us, day_num_trunc

SEGMENT_TOP_N = 3
N_HOURS = 24


# --------------------------------------------------------- per-group top-N
def segment_top_orders(sf_dir: str, n: int = SEGMENT_TOP_N) -> rd.Dataset:
    """Top-``n`` orders per customer market segment by (total cents
    DESC, orderkey ASC) — the ``ROW_NUMBER() OVER (PARTITION BY ...)
    <= n`` shape (A7's truncation generalized to rows).

    Layout: the customer→segment map is the broadcast small side —
    ``ray.put`` once, fetched once per ACTOR in ``__init__`` (the
    ``relational._SegmentLookup`` pattern; a per-batch ``ray.get``
    would re-deserialize the whole dimension dict for every batch).
    Each batch keeps only its own top-``n`` per segment, so at most
    n × |segments| rows per batch enter the final per-segment
    ``map_groups`` — the shuffle is bounded by n × segments × blocks,
    never by the orders row count."""
    import pyarrow.parquet as pq

    from ..runtime import auto_concurrency

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg_map = dict(zip(cust["c_custkey"].to_pylist(),
                       cust["c_mktsegment"].to_pylist()))
    seg_ref = ray.put(seg_map)

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["total_cents", "o_orderkey"],
                          ascending=[False, True], kind="mergesort").head(n)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "c_mktsegment": g["c_mktsegment"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "total_cents": g["total_cents"].to_numpy(np.int64),
        })

    return (ds.map_batches(_SegmentTopNPartial, batch_format="pyarrow",
                           fn_constructor_args=(seg_ref, n),
                           concurrency=auto_concurrency())
            .groupby("c_mktsegment")
            .map_groups(final, batch_format="pandas"))


class _SegmentTopNPartial:
    """Actor-pool stage: broadcast custkey→segment dict fetched once in
    ``__init__``; per batch, map + inner-drop unknown custkeys + keep
    the batch's own top-n per segment."""

    def __init__(self, seg_ref, n: int):
        self._seg = ray.get(seg_ref)
        self._n = n

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "total_cents": _cents(t["o_totalprice"]).to_numpy(),
            "c_mktsegment": pd.Series(
                t["o_custkey"].to_numpy(zero_copy_only=False))
            .map(self._seg),
        }).dropna(subset=["c_mktsegment"])
        df = df.sort_values(["total_cents", "o_orderkey"],
                            ascending=[False, True], kind="mergesort")
        return df.groupby("c_mktsegment", sort=False).head(self._n)


def q_segment_top_orders(sf_dir: str) -> rd.Dataset:
    return segment_top_orders(sf_dir)


# ------------------------------------------------------------ pivot/crosstab
def type_hour_pivot(sf_dir: str) -> rd.Dataset:
    """Crosstab: events pivoted to one row per event_type with 24 hour
    columns ``h0..h23`` of counts. Each batch pre-aggregates its own
    (type × 24) partial matrix, so the shuffle carries |types| × 24
    cells per block regardless of row count; the final per-type group
    sums partials."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    hcols = [f"h{h}" for h in range(N_HOURS)]

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "hour": pc.hour(t["ts"]).to_numpy(zero_copy_only=False),
        })
        ct = pd.crosstab(df["event_type"], df["hour"])
        ct = ct.reindex(columns=range(N_HOURS), fill_value=0)
        ct.columns = hcols
        return ct.astype(np.int64).rename_axis("event_type").reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"event_type": [g["event_type"].iloc[0]]})
        for c in hcols:
            out[c] = np.int64(g[c].sum())
        return out

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(final, batch_format="pandas"))


def q_type_hour_pivot(sf_dir: str) -> rd.Dataset:
    return type_hour_pivot(sf_dir)


# ---------------------------------------------------------------- anti-join
INACTIVE_SINCE_US = np.int64(946_684_800_000_000)  # 2000-01-01 UTC


def inactive_customers(sf_dir: str, since_us: np.int64 = INACTIVE_SINCE_US,
                       num_buckets: int = 16) -> rd.Dataset:
    """Customers with no order on/after ``since_us`` — the exact hash
    anti-join (J2's covered-entry removal as a standalone relational
    operator). The recent-orders predicate filters the probe side at
    the read; both sides then bucket on ``hash(custkey) % B`` and each
    bucket's probe is an ``np.isin`` complement. Exactness matters
    here, so no Bloom shortcut: a Bloom false positive would silently
    drop a customer (the Bloom variant exists for the greedy cover,
    where FPs only cost recall of *removals*)."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def prep_cust(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "key": t["c_custkey"].to_numpy(zero_copy_only=False),
            "c_name": t["c_name"].to_numpy(zero_copy_only=False),
        })
        df["side"] = np.int8(0)
        df["bucket"] = (hash_ints(df["key"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def prep_orders(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        recent = pc.greater_equal(pc.cast(t["o_orderdate"], pa.int64()),
                                  int(since_us))
        t = t.filter(recent)
        keys = pd.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"key": keys,
                           "c_name": np.full(len(keys), "", dtype=object)})
        df["side"] = np.int8(1)
        df["bucket"] = (hash_ints(df["key"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    tagged = (cust.map_batches(prep_cust, batch_format="pyarrow")
              .union(orders.map_batches(prep_orders, batch_format="pyarrow")))

    def anti_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right_keys = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        keep = ~np.isin(left["key"].to_numpy(np.int64), right_keys)
        out = left[keep]
        return pd.DataFrame({
            "c_custkey": out["key"].to_numpy(np.int64),
            "c_name": out["c_name"].to_numpy(object),
        })

    return (tagged.groupby("bucket")
            .map_groups(lambda g: anti_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_inactive_customers(sf_dir: str) -> rd.Dataset:
    return inactive_customers(sf_dir)


# -------------------------------------------------------------------- ROLLUP
def daily_rollup(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """``GROUP BY ROLLUP(event_type, day)`` counts: the (type, day)
    level plus the (type) subtotal and the grand total, with sentinels
    ``day_num = -1`` / ``event_type = 'ALL'`` for the rolled-up levels.

    The corpus is scanned ONCE for the finest level (a bucketed
    partial-sum shuffle bounded by |types| × |days| cells); both
    coarser levels are derived from that small aggregate on the driver
    — a documented small-side materialization (types × days cells, not
    rows)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "day_num": day_num_trunc(_ts_us(t["ts"])),
        })
        out = (df.groupby(["event_type", "day_num"], sort=False)
               .size().rename("n").reset_index())
        out["bucket"] = (hash_ints(out["day_num"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["event_type", "day_num"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    finest = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                          batch_format="pandas")
              .to_pandas())
    finest["day_num"] = finest["day_num"].astype(np.int64)
    finest["n"] = finest["n"].astype(np.int64)

    by_type = (finest.groupby("event_type", sort=False)["n"].sum()
               .reset_index())
    by_type["day_num"] = np.int64(-1)
    total = pd.DataFrame({"event_type": ["ALL"],
                          "day_num": np.array([-1], np.int64),
                          "n": np.array([finest["n"].sum()], np.int64)})
    out = pd.concat([finest, by_type[["event_type", "day_num", "n"]], total],
                    ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["event_type", "day_num", "n"]]


def q_daily_rollup(sf_dir: str) -> pd.DataFrame:
    return daily_rollup(sf_dir)


# ------------------------------------------------------- keyed set difference
def user_set_diff(sf_dir: str, tool_a: str = "k1", tool_b: str = "k2",
                  num_buckets: int = 16) -> rd.Dataset:
    """Users who used ``tool_a`` but never ``tool_b`` (the transcripts
    tool mapping, ``sources.transcripts.TRANSCRIPTS_FROM_EVENTS_SQL``)
    — distributed EXCEPT over per-key flags. One scan; each batch
    pre-aggregates (user, saw_a, saw_b) bits, the bucketed merge ORs
    them, and the filter emits the difference. The shuffle carries one
    row per (user, block), never per event."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        props = pd.Series(t["props"].to_numpy(zero_copy_only=False))
        tool = "k" + props.str.extract(r"([0-9]+)", expand=False).fillna("")
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "saw_a": (tool == tool_a).to_numpy().astype(np.int8),
            "saw_b": (tool == tool_b).to_numpy().astype(np.int8),
        })
        out = (df.groupby("user_id", sort=False)[["saw_a", "saw_b"]]
               .max().reset_index())
        out["bucket"] = (hash_ints(out["user_id"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", sort=False)[["saw_a", "saw_b"]].max()
        keep = m[(m["saw_a"] == 1) & (m["saw_b"] == 0)]
        return pd.DataFrame({"user_id":
                             keep.index.to_numpy(np.int64)})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: diff_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_user_set_diff(sf_dir: str) -> rd.Dataset:
    return user_set_diff(sf_dir)


# ------------------------------------------------------- argmin / argmax
def customer_order_span(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Per customer: order count, first/last order date, the orderkey
    of the FIRST order (ties on date broken by MIN orderkey — pinned,
    since SQL ``arg_min`` tie-breaks are unspecified), and total spend
    — the distributed argmin/argmax pattern. Each batch reduces to one
    partial row per (customer, batch); partials combine by
    lexicographic (date, orderkey) sort inside the bucketed merge, so
    the shuffle never carries raw orders."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        # tie-break pool is the exact MIN TIMESTAMP (matching the
        # oracle's self-join on o_orderdate = MIN(o_orderdate)), not
        # the min day — dates are derived only at the very end
        df = pd.DataFrame({
            "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
            "key": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "ts": _ts_us(t["o_orderdate"]),
            "spend": _cents(t["o_totalprice"]).to_numpy(),
        }).sort_values(["c_custkey", "ts", "key"], kind="mergesort")
        g = df.groupby("c_custkey", sort=False)
        out = pd.DataFrame({
            "n_orders": g.size(),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
            "first_key": g["key"].first(),  # min key at min ts (sorted)
            "spend_cents": g["spend"].sum(),
        }).reset_index()
        out["bucket"] = (hash_ints(out["c_custkey"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_custkey", "first_ts", "first_key"],
                          kind="mergesort")
        gg = g.groupby("c_custkey", sort=False)
        out = pd.DataFrame({
            "n_orders": gg["n_orders"].sum().astype(np.int64),
            "first_ts": gg["first_ts"].min(),
            "last_ts": gg["last_ts"].max(),
            "first_orderkey": gg["first_key"].first().astype(np.int64),
            "spend_cents": gg["spend_cents"].sum().astype(np.int64),
        }).reset_index()
        epoch = np.datetime64("1970-01-01", "D")
        for c, name in (("first_ts", "first_date"), ("last_ts", "last_date")):
            days = (epoch + day_num_trunc(out.pop(c).to_numpy(np.int64))
                    ).astype("datetime64[D]")
            out[name] = np.datetime_as_string(days, unit="D")
        return out[["c_custkey", "n_orders", "first_date", "last_date",
                    "first_orderkey", "spend_cents"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_customer_order_span(sf_dir: str) -> rd.Dataset:
    return customer_order_span(sf_dir)


# -------------------------------------------------------- left join aggregate
def customer_order_counts(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """customer LEFT JOIN orders, aggregated: per customer the order
    count INCLUDING zero — the outer-join shape the inner/anti joins
    don't cover. Both sides bucket on hash(custkey); the probe side
    pre-counts per (custkey, block) so the shuffle carries count
    partials, not order rows; each bucket reindexes its customers over
    the summed counts with a zero fill."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def prep_cust(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "key": t["c_custkey"].to_numpy(zero_copy_only=False),
            "n": np.zeros(t.num_rows, np.int64),
        })
        df["side"] = np.int8(0)
        df["bucket"] = (hash_ints(df["key"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def prep_orders(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        keys = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False))
        cnt = keys.value_counts().rename_axis("key").rename("n").reset_index()
        cnt["n"] = cnt["n"].astype(np.int64)
        cnt["side"] = np.int8(1)
        cnt["bucket"] = (hash_ints(cnt["key"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return cnt

    tagged = (cust.map_batches(prep_cust, batch_format="pyarrow")
              .union(orders.map_batches(prep_orders, batch_format="pyarrow")))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one output row per DISTINCT key (the oracle GROUP BYs the
        # key); same-key rows always land in the same bucket, so the
        # per-bucket unique is globally unique
        left_keys = np.unique(g.loc[g["side"] == 0, "key"]
                              .to_numpy(np.int64))
        sums = (g[g["side"] == 1].groupby("key", sort=False)["n"].sum())
        n = sums.reindex(left_keys, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame({"c_custkey": left_keys, "n_orders": n})

    return (tagged.groupby("bucket")
            .map_groups(lambda g: join_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_customer_order_counts(sf_dir: str) -> rd.Dataset:
    return customer_order_counts(sf_dir)


# ------------------------------------------------------ relational division
def users_all_types(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Relational DIVISION: users who performed EVERY event type seen
    in the corpus — the ``HAVING COUNT(DISTINCT x) = |X|`` shape (the
    reference's "rule covers all required constraints" check,
    ``src/eval/RuleEvaluator.py:10-30``, as a set-containment query).

    Two passes, both bounded: the divisor (distinct event types) is a
    types-sized per-batch-unique union — broadcast as one int; the
    dividend deduplicates (user, type) per batch so the user-bucketed
    shuffle carries at most |users|×|types| rows per block. No raw
    event ever shuffles."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def batch_types(t: pa.Table) -> pd.DataFrame:
        # divisor counts every non-null type, even on null-user rows
        # (the oracle's subquery has no user predicate)
        col = t["event_type"]
        if col.null_count:
            col = col.filter(pc.is_valid(col))
        return pd.DataFrame({
            "event_type": pd.unique(col.to_numpy(zero_copy_only=False))})

    # divisor: types-sized (documented small side — a handful of rows)
    n_types = len(set(
        ev.map_batches(batch_types, batch_format="pyarrow")
        .to_pandas()["event_type"]))

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        df["bucket"] = (hash_ints(df["user_id"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def div_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = (g.drop_duplicates()
              .groupby("user_id", sort=False)["event_type"].size())
        keep = nd[nd == n_types]
        return pd.DataFrame({
            "user_id": keep.index.to_numpy(np.int64),
            "n_types": keep.to_numpy(np.int64),
        })

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: div_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_users_all_types(sf_dir: str) -> rd.Dataset:
    return users_all_types(sf_dir)


# ---------------------------------------------------- full outer aggregate
def nation_parties(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """customer-count per nation FULL OUTER JOIN supplier-count per
    nation, zero-filled on both sides — the outer-join shape where the
    key spine is the UNION of both sides (customer_order_counts covers
    LEFT; at sf0.001 suppliers populate only 10 of 25 nations, so the
    outer rows are real). Each side pre-counts per (nation, block);
    the nation-bucketed merge pivots the tagged partials with zero
    fill. Shuffle volume = nations × blocks, never rows."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey"])
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_nationkey"])

    def prep(col: str, side: int):
        def fn(t: pa.Table) -> pd.DataFrame:
            t = t.drop_null()
            keys = pd.Series(t[col].to_numpy(zero_copy_only=False))
            cnt = (keys.value_counts().rename_axis("nationkey")
                   .rename("n").reset_index())
            cnt["n"] = cnt["n"].astype(np.int64)
            cnt["side"] = np.int8(side)
            cnt["bucket"] = (hash_ints(cnt["nationkey"]) %
                             np.uint64(num_buckets)).astype(np.int32)
            return cnt
        return fn

    tagged = (cust.map_batches(prep("c_nationkey", 0),
                               batch_format="pyarrow")
              .union(supp.map_batches(prep("s_nationkey", 1),
                                      batch_format="pyarrow")))

    def outer_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(g["nationkey"].to_numpy(np.int64))
        out = pd.DataFrame({"nationkey": keys})
        for side, name in ((0, "n_cust"), (1, "n_supp")):
            sums = (g[g["side"] == side]
                    .groupby("nationkey", sort=False)["n"].sum())
            out[name] = sums.reindex(keys, fill_value=0).to_numpy(np.int64)
        return out

    return (tagged.groupby("bucket")
            .map_groups(lambda g: outer_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_nation_parties(sf_dir: str) -> rd.Dataset:
    return nation_parties(sf_dir)


# ---------------------------------------------------------------- CUBE
def type_hour_cube(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """``GROUP BY CUBE(event_type, hour)``: all four grouping sets —
    (type, hour), (type), (hour), () — with sentinels ``'ALL'`` /
    ``-1``, derived from ONE scan of the finest aggregate exactly like
    ``daily_rollup`` (the shuffle is bounded by |types| × 24 cells; the
    three coarser levels are driver math over that small table)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "hour": pc.hour(t["ts"]).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        out = (df.groupby(["event_type", "hour"], sort=False)
               .size().rename("n").reset_index())
        out["bucket"] = (hash_ints(out["hour"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["event_type", "hour"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    finest = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: merge_bucket(g.drop(columns=["bucket"])),
                          batch_format="pandas")
              .to_pandas())
    finest["hour"] = finest["hour"].astype(np.int64)
    finest["n"] = finest["n"].astype(np.int64)

    by_type = finest.groupby("event_type", sort=False)["n"].sum().reset_index()
    by_type["hour"] = np.int64(-1)
    by_hour = finest.groupby("hour", sort=False)["n"].sum().reset_index()
    by_hour["event_type"] = "ALL"
    total = pd.DataFrame({"event_type": ["ALL"],
                          "hour": np.array([-1], np.int64),
                          "n": np.array([finest["n"].sum()], np.int64)})
    out = pd.concat([finest, by_type[["event_type", "hour", "n"]],
                     by_hour[["event_type", "hour", "n"]], total],
                    ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    out["hour"] = out["hour"].astype(np.int64)
    return out[["event_type", "hour", "n"]]


def q_type_hour_cube(sf_dir: str) -> pd.DataFrame:
    return type_hour_cube(sf_dir)


# ------------------------------------------------------------- semi-join
ACTIVE_FROM_US = np.int64(820_454_400_000_000)   # 1996-01-01 UTC
ACTIVE_TO_US = np.int64(852_076_800_000_000)     # 1997-01-01 UTC


def active_customers(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Customers with >=1 order in 1996 — the exact hash SEMI-join
    (EXISTS), completing the join matrix next to the anti-join twin
    ``inactive_customers``. The probe side is filtered at the read and
    deduplicated per batch, so the bucketed shuffle carries distinct
    custkeys per block; each bucket keeps build rows via ``np.isin``.
    Exact (no Bloom): a false positive would ADD a wrong customer."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def prep_cust(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "key": t["c_custkey"].to_numpy(zero_copy_only=False),
            "c_mktsegment": t["c_mktsegment"]
            .to_numpy(zero_copy_only=False),
        })
        df["side"] = np.int8(0)
        df["bucket"] = (hash_ints(df["key"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    def prep_orders(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        d = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(d, int(ACTIVE_FROM_US)),
                       pc.less(d, int(ACTIVE_TO_US)))
        t = t.filter(keep)
        keys = pd.unique(t["o_custkey"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"key": keys,
                           "c_mktsegment": np.full(len(keys), "",
                                                   dtype=object)})
        df["side"] = np.int8(1)
        df["bucket"] = (hash_ints(df["key"]) %
                        np.uint64(num_buckets)).astype(np.int32)
        return df

    tagged = (cust.map_batches(prep_cust, batch_format="pyarrow")
              .union(orders.map_batches(prep_orders,
                                        batch_format="pyarrow")))

    def semi_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right_keys = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        keep = np.isin(left["key"].to_numpy(np.int64), right_keys)
        out = left[keep]
        return pd.DataFrame({
            "c_custkey": out["key"].to_numpy(np.int64),
            "c_mktsegment": out["c_mktsegment"].to_numpy(object),
        })

    return (tagged.groupby("bucket")
            .map_groups(lambda g: semi_bucket(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_active_customers(sf_dir: str) -> rd.Dataset:
    return active_customers(sf_dir)


# --------------------------------------------------------------- UNPIVOT
def unpivot_wide(ds: rd.Dataset, id_cols: list[str],
                 value_cols: list[str], var_name: str,
                 value_name: str) -> rd.Dataset:
    """Generic UNPIVOT (wide → long melt): each batch emits one row per
    (input row × value column). A pure streaming map — no shuffle at
    any scale; output volume = rows × |value_cols| by definition."""

    def melt(b: pd.DataFrame) -> pd.DataFrame:
        # value dtype is the caller's concern — a generic melt must not
        # force integers on float/string value columns
        return b.melt(id_vars=id_cols, value_vars=value_cols,
                      var_name=var_name, value_name=value_name)

    return ds.map_batches(melt, batch_format="pandas")


def q_type_hour_unpivot(sf_dir: str) -> rd.Dataset:
    """UNPIVOT over the type×hour crosstab: melt h0..h23 back to long
    (event_type, hour, n) INCLUDING the zero cells the pivot filled —
    the exact inverse of q_type_hour_pivot (round-trip asserted in
    tests)."""
    hcols = [f"h{h}" for h in range(N_HOURS)]
    wide = type_hour_pivot(sf_dir)
    long = unpivot_wide(wide, ["event_type"], hcols, "hour_col", "n")

    def decode_hour(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy(object),
            "hour": b["hour_col"].str.slice(1).astype(np.int64),
            "n": b["n"].to_numpy(np.int64),
        })

    return long.map_batches(decode_hour, batch_format="pandas")


# --------------------------------------------- correlated scalar subquery
def q_orders_above_cust_avg(sf_dir: str, num_buckets: int = 8):
    """Per customer: order count and how many of their orders exceed
    their OWN average order value — the correlated-scalar-subquery
    shape (``o_totalprice > (SELECT AVG(...) WHERE same customer)``)
    without a float average: compare cross-multiplied integers,
    ``cents·n > Σcents`` (both sides pin this inequality, so DOUBLE
    AVG rounding can never flip a count). One customer-keyed hash
    shuffle; avg and comparison are local to the bucket."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        return pd.DataFrame({
            "c_custkey": t["o_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "cents": _cents(t["o_totalprice"])
            .to_numpy(zero_copy_only=False),
        })

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        gr = g.groupby("c_custkey", sort=False)["cents"]
        n = gr.transform("size").to_numpy(np.int64)
        s = gr.transform("sum").to_numpy(np.int64)
        above = g["cents"].to_numpy(np.int64) * n > s
        out = pd.DataFrame({"c_custkey": g["c_custkey"].to_numpy(np.int64),
                            "one": np.int64(1),
                            "above": above.astype(np.int64)})
        res = out.groupby("c_custkey", sort=False).agg(
            n_orders=("one", "sum"),
            n_above_avg=("above", "sum")).reset_index()
        res["n_orders"] = res["n_orders"].astype(np.int64)
        res["n_above_avg"] = res["n_above_avg"].astype(np.int64)
        return res

    return bucketed_group_agg(ds.map_batches(prep, batch_format="pyarrow"),
                              ["c_custkey"], per_cust,
                              num_buckets=num_buckets)
