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
                     fn_constructor_args=(cust_ref,), concurrency=2)
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_total_cents")
    )
    return agg.map_batches(
        lambda b: b.assign(n_orders=b["n_orders"].astype(np.int64),
                           sum_total_cents=b["sum_total_cents"].astype(np.int64)),
        batch_format="pandas",
    )


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
