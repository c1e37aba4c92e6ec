"""Table profiling + distribution-entropy operators.

``profile_events`` is the schema-inference / data-quality scan every
ingestion pipeline runs first — the reference does this implicitly
when it collects per-key value sets to freeze the Orange domain
(``src/TableCreator.py:113-151``) and when ``EnvLogUniverseGenerator``
builds ``possible_params`` (``src/model/EnvLogUniverseGenerator.py:
256-258``); here it is one generic operator over any table.

``field_entropy`` is Shannon entropy per categorical field — the
selection signal behind the experiment family's info-gain scripts
(``src/experiment/info_gain.py``: H(label) is the first term of MI),
as a standalone distribution summary.

Layout: one scan each; per-batch partials are column-bounded (one row
per column, or one row per (field, value)), merged in a bucketed
reduce. Nothing row-sized ever shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import hash_strings

PROFILE_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value",
                   "props"]


def profile_table(ds: rd.Dataset, columns: list[str],
                  num_buckets: int = 8) -> rd.Dataset:
    """Per-column profile: row count, null count, EXACT distinct count.

    Distinct is computed by a per-batch unique on (column, hash64) —
    the shuffle carries distinct hashes per block, not rows; at true
    100 TB cardinalities the HLL twin (``udaf.HllAgg``) is the scale
    path, kept exact here because the gate compares integers. Hash
    collisions: 64-bit over ≤1e12 distinct values ⇒ P(any collision)
    < 3e-8; the oracle counts raw values, so a collision would show as
    an off-by-one — accepted and documented."""

    def partial(t: pa.Table) -> pd.DataFrame:
        # per column: ONE header row (is_head=1, carries the batch's
        # row/null counts — emitted even when every value is null) plus
        # one row per distinct hash (is_head=0)
        frames = []
        for col in columns:
            c = t[col]
            nn = c.null_count
            valid = c.filter(pc.is_valid(c)) if nn else c
            s = pd.Series(valid.to_numpy(zero_copy_only=False))
            if s.dtype.kind == "f":
                # -0.0 + 0.0 == +0.0 (IEEE): canonicalize so the str
                # round-trip doesn't split a distinct the SQL
                # COUNT(DISTINCT) counts once
                s = s + 0.0
            hashes = pd.unique(hash_strings(s.astype(str)
                                            .to_numpy(object)))
            frames.append(pd.DataFrame({
                "column_name": col,
                "n": np.zeros(len(hashes), np.int64),
                "n_null": np.zeros(len(hashes), np.int64),
                "h": hashes,
                "is_head": np.zeros(len(hashes), np.int8)}))
            frames.append(pd.DataFrame({
                "column_name": [col], "n": np.array([len(c)], np.int64),
                "n_null": np.array([nn], np.int64),
                "h": np.zeros(1, np.uint64),
                "is_head": np.ones(1, np.int8)}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (hash_strings(out["column_name"].to_numpy(object)) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("column_name", sort=False)
        return pd.DataFrame({
            "n_rows": gg["n"].sum().astype(np.int64),
            "n_null": gg["n_null"].sum().astype(np.int64),
            "n_distinct": gg.apply(
                lambda x: x.loc[x["is_head"] == 0, "h"].nunique()
            ).astype(np.int64),
        }).reset_index()

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: merge(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_profile_events(sf_dir: str) -> rd.Dataset:
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=PROFILE_COLUMNS)
    return profile_table(ev, PROFILE_COLUMNS)


# ------------------------------------------------------------- entropy
def field_entropy(sf_dir: str, num_buckets: int = 8) -> pd.DataFrame:
    """Shannon entropy H = -Σ p ln p of the event_type and
    user_id distributions, in milli-nats. Per-batch (field, value)
    partial counts → one bucketed sum (vocabulary-bounded) → driver
    folds the closed form over the tiny counts table. Float caveat as
    ``features.info_gain``: both sides sum identical ln() terms in
    different order; the milli-nat fold flip risk is ~1e-11."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        frames = []
        for field in ("event_type", "user_id"):
            c = t[field]
            c = c.filter(pc.is_valid(c)) if c.null_count else c
            vc = (pd.Series(c.to_numpy(zero_copy_only=False))
                  .astype(str).value_counts())
            frames.append(pd.DataFrame({
                "field": field,
                "value": vc.index.to_numpy(object),
                "n": vc.to_numpy(np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (hash_strings(out["value"].to_numpy(object)) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["field", "value"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: merge(g.drop(columns=["bucket"])),
                          batch_format="pandas")
              .to_pandas())  # (field, value) cells — vocabulary-sized

    rows = []
    for field, grp in counts.groupby("field", sort=False):
        n = grp["n"].to_numpy(np.float64)
        p = n / n.sum()
        h = float(-(p * np.log(p)).sum())
        rows.append((field, len(grp), int(np.floor(h * 1000 + 0.5))))
    out = pd.DataFrame(rows, columns=["field", "n_distinct",
                                      "entropy_millinats"])
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["entropy_millinats"] = out["entropy_millinats"].astype(np.int64)
    return out.sort_values("field").reset_index(drop=True)


def q_field_entropy(sf_dir: str) -> pd.DataFrame:
    return field_entropy(sf_dir)
