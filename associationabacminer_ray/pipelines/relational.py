"""General relational pipelines over the TPC-H-ish tables.

Shows the engine's breadth beyond mining: filtered grouped aggregation
(Q1-style), a broadcast hash join (small dimension side shipped once via
``ray.put`` and looked up inside ``map_batches`` — no shuffle, J1/J4
analog per SURVEY.md §2.4), and filter+project with column pruning at
the read. Money stays in integer cents (``floor(x*100+0.5)``) so values
hash identically to the DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..runtime import auto_concurrency


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


def q1_lineitem(sf_dir: str):
    """TPC-H Q1-style pricing summary (integer-exact columns)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "base_cents": _cents(t["l_extendedprice"]),
                "disc_bp": pc.cast(
                    pc.floor(pc.add(pc.multiply(t["l_discount"], 10000.0), 0.5)),
                    pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_bp", alias_name="sum_disc_bp"),
            Count(alias_name="count_order"),
        )
    )
    return agg.map_batches(
        lambda b: b.assign(**{c: b[c].astype(np.int64) for c in
                              ("sum_qty", "sum_base_cents", "sum_disc_bp",
                               "count_order")}),
        batch_format="pandas",
    )


class _SegmentLookup:
    """Actor-pool stage: the customer dimension is broadcast once via
    ``ray.put`` on the driver and fetched once per actor in __init__ —
    never re-shipped per batch (broadcast join, SURVEY.md §2.4 J1)."""

    def __init__(self, cust_ref):
        cust = ray.get(cust_ref)
        self._seg = cust  # dict custkey -> mktsegment

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["c_mktsegment"] = batch["o_custkey"].map(self._seg).fillna("UNKNOWN")
        return batch


def q_orders_customer_join(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-segment order stats."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "total_cents": _cents(t["o_totalprice"])})

    joined = (
        ds.map_batches(cents, batch_format="pyarrow")
        .map_batches(_SegmentLookup, batch_format="pandas",
                     fn_constructor_args=(cust_ref,), concurrency=auto_concurrency())
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_total_cents")
    )
    return agg.map_batches(
        lambda b: b.assign(n_orders=b["n_orders"].astype(np.int64),
                           sum_total_cents=b["sum_total_cents"].astype(np.int64)),
        batch_format="pandas",
    )


def q_top_orders(sf_dir: str):
    """Global sort + limit (O2/A5 Ray-native): top-10 orders by total
    price, deterministic tie-break on orderkey."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "total_cents": _cents(t["o_totalprice"])})

    top = (
        ds.map_batches(cents, batch_format="pyarrow")
        .sort(["total_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )
    return top.map_batches(
        lambda b: b.assign(total_cents=b["total_cents"].astype(np.int64),
                           o_orderkey=b["o_orderkey"].astype(np.int64)),
        batch_format="pandas",
    )


def q_lineitem_orders_join(sf_dir: str, num_buckets: int = 16):
    """Both-sides-large join via the explicit partitioned hash-join
    pattern (SURVEY §2.4 / guide): tag each side, bucket BOTH on
    hash(join key) % B, co-group per bucket, pandas-merge inside, and
    pre-aggregate per bucket so only (priority, partial) rows leave —
    the shuffle moves each row once. Result: revenue per order
    priority. Skewed keys would be salted into sub-buckets; orderkey is
    uniform so B buckets suffice."""
    from ..functions.hashing import hash_ints

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def prep_li(t: pa.Table) -> pd.DataFrame:
        revenue_cents = pc.cast(
            pc.floor(pc.add(pc.multiply(
                pc.multiply(t["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), t["l_discount"])),
                100.0), 0.5)), pa.int64())
        df = pd.DataFrame({"key": t["l_orderkey"].to_numpy(),
                           "revenue_cents": revenue_cents.to_numpy()})
        df["side"] = "L"
        df["priority"] = ""
        return df

    def prep_orders(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"key": t["o_orderkey"].to_numpy(),
                           "priority": t["o_orderpriority"].to_numpy()})
        df["side"] = "R"
        df["revenue_cents"] = np.int64(0)
        return df

    cols = ["key", "side", "priority", "revenue_cents"]
    both = (
        li.map_batches(prep_li, batch_format="pyarrow")
        .map_batches(lambda b: b[cols], batch_format="pandas")
        .union(orders.map_batches(prep_orders, batch_format="pyarrow")
               .map_batches(lambda b: b[cols], batch_format="pandas"))
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(bucket=(hash_ints(b["key"]) %
                                np.uint64(num_buckets)).astype(np.int32))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "L"][["key", "revenue_cents"]]
        right = g[g["side"] == "R"][["key", "priority"]]
        j = left.merge(right, on="key", how="inner")
        out = j.groupby("priority", sort=False).agg(
            n_items=("key", "size"), sum_revenue_cents=("revenue_cents", "sum")
        ).reset_index()
        return out

    partial = (
        both.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("priority", sort=False).agg(
            n_items=("n_items", "sum"),
            sum_revenue_cents=("sum_revenue_cents", "sum")).reset_index()
        out["n_items"] = out["n_items"].astype(np.int64)
        out["sum_revenue_cents"] = out["sum_revenue_cents"].astype(np.int64)
        return out

    from .analytics import bucketed_group_agg

    return bucketed_group_agg(partial, ["priority"], final, num_buckets=4)


def q_lineitem_orders_join_native(sf_dir: str, num_partitions: int = 8):
    """Same join via Ray's native hash-partitioned ``Dataset.join``
    (available since 2.49) — kept alongside the explicit bucketed join:
    measured 1.8× faster here, but its hash-shuffle aggregator actors
    need ``num_partitions`` kept modest in local mode (large values
    spawn hundreds of aggregator workers — see BASELINE.md)."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])

    def revenue(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(
                pc.multiply(t["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), t["l_discount"])),
                100.0), 0.5)), pa.int64())
        return pa.table({"l_orderkey": t["l_orderkey"], "revenue_cents": cents})

    joined = li.map_batches(revenue, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderpriority", sort=False).agg(
            n_items=("l_orderkey", "size"),
            sum_revenue_cents=("revenue_cents", "sum")).reset_index()
        out.columns = ["priority", "n_items", "sum_revenue_cents"]
        out["n_items"] = out["n_items"].astype(np.int64)
        out["sum_revenue_cents"] = out["sum_revenue_cents"].astype(np.int64)
        return out

    from .analytics import bucketed_group_agg

    return bucketed_group_agg(joined, ["o_orderpriority"], agg, num_buckets=4)


def q_part_brand_stats(sf_dir: str):
    """Filter + project + grouped aggregate with pruning at the read."""
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["p_size"], 25))
        return pa.table({"p_brand": t["p_brand"],
                         "retail_cents": _cents(t["p_retailprice"])})

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby("p_brand").aggregate(
        Count(alias_name="n_parts"), Sum("retail_cents", alias_name="sum_retail_cents")
    )
    return agg.map_batches(
        lambda b: b.assign(n_parts=b["n_parts"].astype(np.int64),
                           sum_retail_cents=b["sum_retail_cents"].astype(np.int64)),
        batch_format="pandas",
    )
