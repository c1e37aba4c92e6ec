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


def _revenue_cents(t: pa.Table) -> pa.ChunkedArray:
    """price·(1−discount) folded to cents — ONE implementation so the
    op sequence can never drift between the join/TPC-H queries and
    their oracles (gate convention, see functions.scoring.fold_bp)."""
    return _cents(pc.multiply(t["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), t["l_discount"])))


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
        df = pd.DataFrame({"key": t["l_orderkey"].to_numpy(),
                           "revenue_cents": _revenue_cents(t).to_numpy()})
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
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_cents": _revenue_cents(t)})

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


def q_revenue_filter(sf_dir: str):
    """TPC-H Q6-style forecast-revenue: single-scan filter + global sum,
    the cheapest possible shape (no shuffle at all — per-block partials
    reduced by one tree aggregate). Predicates compare on folded integer
    basis points so the float discount column can never straddle a
    DECIMAL-vs-DOUBLE literal boundary between engine and oracle."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount", "l_quantity",
                                  "l_extendedprice"])
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        disc_bp = pc.cast(pc.floor(pc.add(pc.multiply(
            t["l_discount"], 10000.0), 0.5)), pa.int64())
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(pc.and_(pc.greater_equal(disc_bp, 500),
                            pc.less_equal(disc_bp, 700)),
                    pc.less(t["l_quantity"], 24.0)))
        t = t.filter(mask)
        rev = _cents(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({"revenue_cents": rev})

    filtered = ds.map_batches(prep, batch_format="pyarrow")
    res = filtered.aggregate(Sum("revenue_cents", alias_name="sum_revenue_cents"),
                             Count(alias_name="n_items"))
    return pd.DataFrame([{
        "sum_revenue_cents": np.int64(res["sum_revenue_cents"] or 0),
        "n_items": np.int64(res["n_items"]),
    }])


def q_top_shipping(sf_dir: str, num_partitions: int = 8):
    """TPC-H Q3-style: segment-filtered customers (broadcast key set) ⋈
    date-filtered orders ⋈ shipped lineitems, grouped per order, global
    top-10 by revenue. The only all-to-all exchange is the
    lineitem⋈orders hash join; the customer dimension ships once."""
    import pyarrow.parquet as pq

    cutoff = pa.scalar(np.datetime64("1998-06-01", "us"), pa.timestamp("us"))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    building = np.sort(cust.filter(
        pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_numpy())
    bset_ref = ray.put(building)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    class _SegmentFilter:
        def __init__(self, ref):
            self._keys = ray.get(ref)  # sorted ndarray — np.isin is a search

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["o_orderdate"], cutoff))
            mask = np.isin(t["o_custkey"].to_numpy(), self._keys)
            return t.filter(pa.array(mask)).select(["o_orderkey", "o_orderdate"])

    filtered_orders = orders.map_batches(
        _SegmentFilter, batch_format="pyarrow",
        fn_constructor_args=(bset_ref,), concurrency=auto_concurrency())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])
    ship_after = pa.scalar(np.datetime64("1997-06-01", "us"), pa.timestamp("us"))

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], ship_after))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "revenue_cents": _revenue_cents(t)})

    joined = li.map_batches(prep_li, batch_format="pyarrow").join(
        filtered_orders, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",))

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["l_orderkey", "o_orderdate"], sort=False).agg(
            revenue_cents=("revenue_cents", "sum")).reset_index()
        return out

    from .analytics import bucketed_group_agg

    per = bucketed_group_agg(joined, ["l_orderkey"], per_order, num_buckets=8)
    top = (per.sort(["revenue_cents", "l_orderkey"], descending=[True, False])
           .limit(10).to_pandas())
    return pd.DataFrame({
        "o_orderkey": top["l_orderkey"].astype(np.int64),
        "o_orderdate": pd.to_datetime(top["o_orderdate"]).dt.strftime("%Y-%m-%d"),
        "revenue_cents": top["revenue_cents"].astype(np.int64),
    })


def q_region_revenue(sf_dir: str, region: str = "ASIA", num_partitions: int = 8):
    """TPC-H Q5-style: revenue per nation for one region and year where
    the supplying nation equals the customer nation. All four dimension
    tables (region, nation, customer, supplier) collapse to two
    broadcast key→nation maps; the single large-large exchange is the
    lineitem⋈orders hash join, with the nation-equality filter applied
    in the join output before the tiny per-nation aggregate."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], rkey))
    nat_keys = set(nat["n_nationkey"].to_pylist())
    nat_names = dict(zip(nat["n_nationkey"].to_pylist(),
                         nat["n_name"].to_pylist()))

    def nation_lut(table, key_col, nat_col):
        """Dense key→nationkey int array (-1 = absent / outside region):
        TPC-H keys are small contiguous ints, so a direct-indexed array
        beats a hash map and keeps the batch lookup fully vectorized."""
        keys = table[key_col].to_numpy()
        nats = table[nat_col].to_numpy().astype(np.int64)
        lut = np.full(int(keys.max()) + 1, -1, dtype=np.int64)
        in_region = np.isin(nats, np.fromiter(nat_keys, dtype=np.int64))
        lut[keys[in_region]] = nats[in_region]
        return lut

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cust_ref = ray.put(nation_lut(cust, "c_custkey", "c_nationkey"))
    supp_ref = ray.put(nation_lut(supp, "s_suppkey", "s_nationkey"))

    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def lut_lookup(lut: np.ndarray, keys: np.ndarray) -> np.ndarray:
        out = np.full(keys.shape, -1, dtype=np.int64)
        ok = (keys >= 0) & (keys < lut.size)
        out[ok] = lut[keys[ok]]
        return out

    class _CustNation:
        def __init__(self, ref):
            self._lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                                 pc.less(t["o_orderdate"], hi)))
            nk = lut_lookup(self._lut, t["o_custkey"].to_numpy())
            t = t.append_column("cust_nation", pa.array(nk))
            return t.filter(pc.greater_equal(t["cust_nation"], 0)).select(
                ["o_orderkey", "cust_nation"])

    class _SuppNation:
        def __init__(self, ref):
            self._lut = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = lut_lookup(self._lut, t["l_suppkey"].to_numpy())
            t = pa.table({"l_orderkey": t["l_orderkey"],
                          "supp_nation": pa.array(nk),
                          "revenue_cents": _revenue_cents(t)})
            return t.filter(pc.greater_equal(t["supp_nation"], 0))

    forders = orders.map_batches(_CustNation, batch_format="pyarrow",
                                 fn_constructor_args=(cust_ref,),
                                 concurrency=auto_concurrency())
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    fli = li.map_batches(_SuppNation, batch_format="pyarrow",
                         fn_constructor_args=(supp_ref,),
                         concurrency=auto_concurrency())
    joined = fli.join(forders, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["supp_nation"] == g["cust_nation"]]
        if g.empty:
            return pd.DataFrame({"supp_nation": pd.Series(dtype=np.int64),
                                 "revenue_cents": pd.Series(dtype=np.int64),
                                 "n_items": pd.Series(dtype=np.int64)})
        return g.groupby("supp_nation", sort=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_items=("revenue_cents", "size")).reset_index()

    from .analytics import bucketed_group_agg

    out = bucketed_group_agg(joined, ["supp_nation"], per_nation,
                             num_buckets=4).to_pandas()
    return pd.DataFrame({
        "n_name": out["supp_nation"].map(nat_names),
        "revenue_cents": out["revenue_cents"].astype(np.int64),
        "n_items": out["n_items"].astype(np.int64),
    })


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
