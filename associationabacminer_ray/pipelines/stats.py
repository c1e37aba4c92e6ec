"""Distributed statistics primitives with integer-exact gate outputs:
global NTILE-style bucketing via a broadcast rank histogram, grouped
moment sums (the covariance/correlation building blocks), and an
equi-width histogram.

Reference analogs: the per-user mean/stddev activity stats
(``src/util/user_table_generator.py:19-47``) are grouped moments; the
hour histogram (``src/util/EventTimeBucketCounter.py:37-60``) is the
1-D histogram special case; ranking/quartiles extend the score-sort
selection (``src/EnvAbacRuleMiner.py:107-122``) to a whole-population
statistic.

Gate conventions: money folds through the shared cents/bp op sequence
(``functions.scoring.fold_bp``), moments stay int64 end to end (no
float sums → no order sensitivity), integer division is pinned to
truncation on both sides (values are non-negative, so numpy floor
division equals DuckDB ``//`` truncation — see
``temporal.epoch_div_trunc`` for the signed-case discussion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .analytics import bucketed_group_agg
from .relational import _cents

PRICE_BIN_CENTS = 5_000_000  # $50k equi-width bins over o_totalprice
NTILE_K = 4


def customer_spend(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Per-customer total order value in integer cents (bucketed sum)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["o_custkey"],
                         "spend_cents": _cents(t["o_totalprice"])})

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("c_custkey", sort=False).agg(
            spend_cents=("spend_cents", "sum")).reset_index()
        out["spend_cents"] = out["spend_cents"].astype(np.int64)
        return out

    return bucketed_group_agg(ds.map_batches(cents, batch_format="pyarrow"),
                              ["c_custkey"], per_cust,
                              num_buckets=num_buckets)


def _spend_histogram(sf_dir: str):
    """Shared driver-side distinct-spend histogram (bounded by the
    distinct-cents domain — a documented small side): returns the
    materialized spend Dataset plus ascending (vals, cnts). One copy so
    ntile / dense-rank / Gini cannot drift on the reduction."""
    spend = customer_spend(sf_dir).materialize()

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["spend_cents"].value_counts()
        return pd.DataFrame({"spend_cents": h.index.to_numpy(np.int64),
                             "cnt": h.to_numpy(np.int64)})

    from ray.data.aggregate import Sum

    # partials merged by Ray's grouped aggregate: the driver sees the
    # distinct-cents domain, never |blocks| x domain
    hist = (spend.map_batches(hist_partial, batch_format="pandas")
            .groupby("spend_cents").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().groupby("spend_cents", sort=True)["cnt"].sum())
    return (spend, hist.index.to_numpy(np.int64),
            hist.to_numpy(np.int64))


def q_customer_ntile(sf_dir: str, k: int = NTILE_K) -> rd.Dataset:
    """Global rank + ``k``-tile label per customer by total spend,
    WITHOUT a global sort: pass 1 reduces spend to a (distinct spend →
    count) histogram (bounded by the distinct-cents domain, a
    documented small-side broadcast); pass 2 is a stateless map that
    looks up rank = 1 + Σ counts of strictly-greater cells.

    Tie semantics are RANK() (min rank shared by ties), and the tile is
    the rank-based closed form ``((rank−1)·k)//n + 1`` — deterministic
    under ties with NO row-order dependence, unlike ROW_NUMBER NTILE
    (both sides pin this exact formula)."""
    spend, vals, cnts = _spend_histogram(sf_dir)
    n_total = int(cnts.sum())
    # greater[i] = number of customers with spend strictly > vals[i]
    greater = np.r_[np.cumsum(cnts[::-1])[::-1][1:], np.int64(0)]
    lut_ref = ray.put((vals, greater, n_total))

    def rank_batch(b: pd.DataFrame) -> pd.DataFrame:
        v, g, n = ray.get(lut_ref)
        idx = np.searchsorted(v, b["spend_cents"].to_numpy(np.int64))
        rank = g[idx] + 1
        return pd.DataFrame({
            "c_custkey": b["c_custkey"].astype(np.int64),
            "spend_cents": b["spend_cents"].astype(np.int64),
            "spend_rank": rank,
            "quartile": ((rank - 1) * k) // n + 1,
        })

    return spend.map_batches(rank_batch, batch_format="pandas")


def q_moment_stats(sf_dir: str) -> rd.Dataset:
    """Per returnflag: exact integer moment sums over (quantity,
    discount-bp) pairs — n, Σx, Σy, Σxy and the covariance numerator
    n·Σxy − Σx·Σy. Everything stays int64 so the distributed sum is
    order-independent and bit-exact (float covariance would carry the
    info_gain-style merge-order flake the gate conventions forbid);
    callers derive covariance/correlation by dividing on the driver."""
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pd.DataFrame:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = pc.cast(pc.floor(pc.add(pc.multiply(
            t["l_discount"], 10000.0), 0.5)), pa.int64()).to_numpy()
        df = pd.DataFrame({"l_returnflag":
                           t["l_returnflag"].to_numpy(zero_copy_only=False),
                           "n": np.int64(1), "sum_qty": q, "sum_disc_bp": d,
                           "sum_qty_disc": q * d})
        return df.groupby("l_returnflag", sort=False).sum().reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_returnflag", sort=False).sum().reset_index()
        for c in ("n", "sum_qty", "sum_disc_bp", "sum_qty_disc"):
            out[c] = out[c].astype(np.int64)
        out["cov_num"] = (out["n"] * out["sum_qty_disc"]
                          - out["sum_qty"] * out["sum_disc_bp"])
        return out

    return bucketed_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"], final, num_buckets=4)


def q_price_histogram(sf_dir: str,
                      bin_cents: int = PRICE_BIN_CENTS) -> rd.Dataset:
    """Equi-width histogram of order totals: per-batch (bin → count,
    min, max) partials, merged in one tiny bin-keyed reduce — the
    histogram never sees row-level data after the first map."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        c = _cents(t["o_totalprice"]).to_numpy()
        df = pd.DataFrame({"bin_id": c // bin_cents, "n_orders": np.int64(1),
                           "min_cents": c, "max_cents": c})
        return df.groupby("bin_id", sort=False).agg(
            n_orders=("n_orders", "sum"), min_cents=("min_cents", "min"),
            max_cents=("max_cents", "max")).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bin_id", sort=False).agg(
            n_orders=("n_orders", "sum"), min_cents=("min_cents", "min"),
            max_cents=("max_cents", "max")).reset_index()
        out.insert(1, "lo_cents", out["bin_id"] * bin_cents)
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    return bucketed_group_agg(ds.map_batches(partial, batch_format="pyarrow"),
                              ["bin_id"], final, num_buckets=2)


def q_f2_moment(sf_dir: str, num_buckets: int = 32) -> pd.DataFrame:
    """Second frequency moment F2 = Σ c(k)² of the (user_id, event_type)
    key distribution — the self-join size / key-concentration statistic
    that tells a planner how badly a hash partition on this key will
    skew (AMS 1996).  Exact path: per-batch combiner (one row per
    DISTINCT key per block) → ONE bucketed count shuffle → per-block
    Σ c² partials → driver sum over one tiny row per block.  c² sums
    are int64 (exact up to per-key counts ~3·10⁹); past that regime the
    sketch twin is the answer anyway
    (``sketch_queries.q_f2_moment_sketch`` — NO shuffle, √(2/width)
    relative error).  Oracle: SUM(c*c) over a GROUP BY subquery."""
    from .itemsets import sum_by_key_bucketed

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        key = b["user_id"].astype(str) + "\x1f" + b["event_type"].astype(str)
        out = (pd.DataFrame({"_key": key}).groupby("_key", sort=False)
               .size().reset_index(name="_c"))
        out["_c"] = out["_c"].astype(np.int64)
        return out

    counts = sum_by_key_bucketed(
        ds.map_batches(combine, batch_format="pandas"),
        "_key", "_c", num_buckets=num_buckets)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        c = b["_c"].to_numpy(np.int64)
        return pd.DataFrame({"f2": [np.int64((c * c).sum())],
                             "n_keys": [np.int64(c.size)],
                             "n_rows": [np.int64(c.sum())]})

    parts = counts.map_batches(partials, batch_format="pandas").to_pandas()
    return pd.DataFrame({"f2": [np.int64(parts["f2"].sum())],
                         "n_keys": [np.int64(parts["n_keys"].sum())],
                         "n_rows": [np.int64(parts["n_rows"].sum())]})


# ------------------------------------------- grouped discrete quantiles
DOC_LEN_PCTS = np.array([25, 50, 75, 90, 99], np.int64)


def doc_len_quantiles_by_source(sf_dir: str,
                                num_buckets: int = 8) -> pd.DataFrame:
    """Exact per-source quantiles of document length (n_chars) via THE
    shared discrete-quantile rank rule (``temporal.quantile_rank_pick``
    — same closed form as value_quantiles_exact, here over the
    documents table). The shuffle carries (source, n_chars) histogram
    cells per block — bounded by the length domain, not rows."""
    from .temporal import quantile_rank_pick

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        out = (df.groupby(["source", "n_chars"], sort=False)
               .size().rename("n").reset_index())
        from ..functions.hashing import hash_strings
        out["bucket"] = (hash_strings(out["source"].to_numpy(object)) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, grp in g.groupby("source", sort=False):
            h = (grp.groupby("n_chars", sort=True)["n"].sum())
            vals = quantile_rank_pick(h.index.to_numpy(np.int64),
                                      h.to_numpy(np.int64), DOC_LEN_PCTS)
            rows.append(pd.DataFrame({
                "source": src,
                "q_pct": DOC_LEN_PCTS.astype(np.int32),
                "n_chars": vals.astype(np.int64)}))
        return (pd.concat(rows, ignore_index=True) if rows else
                pd.DataFrame({"source": np.array([], object),
                              "q_pct": np.array([], np.int32),
                              "n_chars": np.array([], np.int64)}))

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: pick(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_doc_len_quantiles(sf_dir: str) -> pd.DataFrame:
    return doc_len_quantiles_by_source(sf_dir)


# ------------------------------------------- DENSE_RANK + integer CUME_DIST
def q_spend_dense_rank(sf_dir: str) -> rd.Dataset:
    """Per-customer DENSE_RANK (descending spend) and CUME_DIST folded
    to truncated basis points ``(10000 · c_ge) // n`` (c_ge = rows with
    spend ≥ mine — peers inclusive, the CUME_DIST numerator) — the two
    rank flavors ``customer_ntile`` doesn't cover, from the SAME
    distinct-spend histogram broadcast: dense rank of value v_i
    (ascending index i of m distinct values) is ``m − i``; no global
    sort anywhere. The oracle states the count window form, not
    DuckDB's float ``cume_dist()``."""
    spend, vals, cnts = _spend_histogram(sf_dir)
    csum = np.cumsum(cnts)
    n = np.int64(csum[-1])
    m = len(vals)
    # value at ascending index i: dense rank desc = m - i;
    # c_ge = n - csum[i-1] = n - (csum[i] - cnt[i])
    dr_lut = np.arange(m, 0, -1, dtype=np.int64)
    cge_lut = n - (csum - cnts)
    # LUT goes through the object store (one copy per node), not the
    # per-task pickled closure — same pattern as customer_ntile
    lut_ref = ray.put((vals, dr_lut, cge_lut, n))

    def rank_rows(b: pd.DataFrame) -> pd.DataFrame:
        v, dr, cge, nn = ray.get(lut_ref)
        idx = np.searchsorted(v, b["spend_cents"].to_numpy(np.int64))
        return pd.DataFrame({
            "c_custkey": b["c_custkey"].to_numpy(np.int64),
            "spend_cents": b["spend_cents"].to_numpy(np.int64),
            "dense_rank": dr[idx],
            "cume_bp": (10000 * cge[idx]) // nn,
        })

    return spend.map_batches(rank_rows, batch_format="pandas")


# ------------------------------------------------------- weighted median
def q_weighted_median(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Per-returnflag LOWER WEIGHTED MEDIAN of extended price (cents)
    weighted by quantity: the smallest v with ``2·cumweight(v) ≥ W``
    (deterministic under any tie layout — both sides pin this exact
    inequality, never a float midpoint). Reduction = (flag, cents,
    Σqty) histogram cells, bounded by the price domain; the pick is a
    cumsum scan over the tiny merged histogram."""
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "flag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "cents": _cents(t["l_extendedprice"])
            .to_numpy(zero_copy_only=False),
            "w": t["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        return (df.groupby(["flag", "cents"], sort=False)["w"]
                .sum().reset_index())

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, grp in g.groupby("flag", sort=False):
            h = grp.groupby("cents", sort=True)["w"].sum()
            v = h.index.to_numpy(np.int64)
            cw = np.cumsum(h.to_numpy(np.int64))
            tw = cw[-1]
            med = v[np.searchsorted(2 * cw, tw, side="left")]
            rows.append((flag, int(med), int(tw)))
        return pd.DataFrame(rows, columns=["l_returnflag",
                                           "wmedian_cents",
                                           "total_qty"]).astype(
            {"wmedian_cents": np.int64, "total_qty": np.int64})

    return bucketed_group_agg(
        li.map_batches(partial, batch_format="pyarrow"),
        ["flag"], pick, num_buckets=num_buckets)


# ---------------------------------------------------------- Gini coefficient
def q_spend_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-customer spend in truncated basis
    points: ``G_bp = (10000·(2·Σᵢ i·xᵢ − (n+1)·S)) // (n·S)`` over the
    ascending sort (ranks of equal values are interchangeable — the
    rank-weighted sum is tie-invariant, so SQL ROW_NUMBER and the
    histogram arithmetic-series form agree exactly). Computed from the
    distinct-spend histogram with Python ints on the driver (no int64
    overflow at any corpus size); one grouped-sum shuffle total."""
    _, vals_arr, cnts_arr = _spend_histogram(sf_dir)
    vals = [int(v) for v in vals_arr]
    cnts = [int(c) for c in cnts_arr]
    n = sum(cnts)
    if n == 0 or sum(v * c for v, c in zip(vals, cnts)) == 0:
        # Degenerate inputs (no orders, or all-zero total spend) have
        # no defined Gini — emit zero rows; the SQL oracle pins the
        # same via WHERE n > 0 AND s > 0.
        return pd.DataFrame({"n_customers": pd.Series([], dtype=np.int64),
                             "total_cents": pd.Series([], dtype=np.int64),
                             "gini_bp": pd.Series([], dtype=np.int64)})
    s = 0       # Σ x_i
    s1 = 0      # Σ i·x_i, i = 1..n ascending
    rank = 0
    for v, c in zip(vals, cnts):
        # ranks rank+1 .. rank+c hold value v; Σ of that run is an
        # arithmetic series — exact in Python ints
        s1 += v * (rank + 1 + rank + c) * c // 2
        s += v * c
        rank += c
    gini_bp = (10000 * (2 * s1 - (n + 1) * s)) // (n * s)
    return pd.DataFrame({"n_customers": [np.int64(n)],
                         "total_cents": [np.int64(s)],
                         "gini_bp": [np.int64(gini_bp)]})


# -------------------------------------------- correlation / regression
def q_value_hour_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation AND OLS slope between the folded (bp) event
    value and the event's UTC hour-of-day — the distributed two-pass-
    free moments shape: per-batch INTEGER partial sums (n, Σx, Σy,
    Σxy, Σx², Σy² — each batch-safe in int64), merged on the driver in
    Python-int arithmetic (overflow-safe at any scale; DuckDB's BIGINT
    SUM widens to HUGEINT the same way), then ONE pinned float op
    sequence stated identically in the SQL oracle:
      corr  = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))
      slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)          (x = hour)
    both folded to bp. No shuffle anywhere — the reduction is sums."""
    from ..functions.scoring import fold_bp, fold_bp_strict

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["value", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        y = fold_bp(t["value"].to_numpy(zero_copy_only=False))
        x = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(y))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [np.dot(x, y)],
            "sxx": [np.dot(x, x)], "syy": [np.dot(y, y)],
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy, sxy, sxx, syy = (int(parts[c].astype(object).sum())
                                for c in ("n", "sx", "sy", "sxy",
                                          "sxx", "syy"))
    cov_n = float(n * sxy - sx * sy)
    varx_n = float(n * sxx - sx * sx)
    vary_n = float(n * syy - sy * sy)
    corr = cov_n / (np.sqrt(varx_n) * np.sqrt(vary_n))
    slope = cov_n / varx_n
    return pd.DataFrame({
        "n": [np.int64(n)],
        "corr_bp": fold_bp_strict([corr], "corr"),
        "slope_bp": fold_bp_strict([slope], "slope"),
    })
