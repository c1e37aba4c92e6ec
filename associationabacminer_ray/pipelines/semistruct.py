"""Semi-structured (JSON) column extraction — the M1-flatten analog
for payload columns that arrive as JSON strings instead of structs.

The reference's events are nested JSON documents flattened to scalar
string columns before any mining (``src/model/event_flattner.py:20-82``,
``requestParameters.*`` keys); our events table carries the same idea
as the ``props`` JSON-string column. This module extracts scalar keys
from such columns VECTORIZED (pyarrow RE2 kernel — no per-row
``json.loads`` in the hot path) under an explicit contract:

**Contract (mirrors M1):** values are flat JSON objects — scalar
values, keys at the top level only, no string value containing a
``"key":`` lookalike. The reference's flattener guarantees exactly
this shape for its output (nesting is joined into the key, lists are
dropped), so the contract is the data model, not a shortcut. The gate
oracle guards with ``json_valid`` + ``TRY_CAST`` so both sides agree
on well-formed flat objects; malformed rows are out of contract.

At 100 TB: extraction is one zero-copy Arrow kernel per batch; the
per-type aggregate ships one partial row per (type, block) into a
types-bounded bucketed merge — never raw events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.hashing import hash_strings


def json_int_field(col: pa.ChunkedArray | pa.Array, key: str) -> pa.Array:
    """Extract top-level integer ``key`` from a JSON-string column as
    int64 (null when the key is absent / non-integer / row is null).
    Vectorized RE2 — see module contract."""
    # the integer must be followed by a JSON delimiter so a float/exp
    # value ("k": 6.9) does NOT half-match its integer prefix, and is
    # capped at 18 digits so the int64 cast can never overflow — the
    # oracle carries the identical digit-length guard (values beyond
    # 18 digits are out of contract and null on BOTH sides)
    pat = '"' + "".join("\\" + c if not c.isalnum() else c for c in key) \
          + '"\\s*:\\s*(?P<v>-?\\d{1,18})[,}\\s]'
    ex = pc.extract_regex(col, pattern=pat)
    vals = pc.struct_field(ex, "v")
    return pc.cast(vals, pa.int64())


def props_key_stats(sf_dir: str, key: str = "k",
                    num_buckets: int = 8) -> rd.Dataset:
    """Per event_type stats of the integer ``props.$key`` payload:
    rows with an extractable value, their sum/min/max. Integer-only
    output; rows whose key is missing are excluded on both sides
    (the oracle filters ``k IS NOT NULL`` before grouping)."""

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.and_(pc.is_valid(t["event_type"]),
                             pc.is_valid(t["props"])))
        k = json_int_field(t["props"], key)
        mask = pc.is_valid(k)
        df = pd.DataFrame({
            "event_type": pc.array_filter(t["event_type"].combine_chunks(),
                                          mask).to_numpy(
                                              zero_copy_only=False),
            "k": pc.array_filter(k, mask).to_numpy(zero_copy_only=False),
        })
        g = df.groupby("event_type", sort=False)["k"]
        out = pd.DataFrame({"n": g.size().astype(np.int64),
                            "sum_k": g.sum().astype(np.int64),
                            "min_k": g.min().astype(np.int64),
                            "max_k": g.max().astype(np.int64)}).reset_index()
        out["bucket"] = (hash_strings(out["event_type"].to_numpy(object)) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("event_type", sort=False)
        return pd.DataFrame({
            "n": gg["n"].sum().astype(np.int64),
            "sum_k": gg["sum_k"].sum().astype(np.int64),
            "min_k": gg["min_k"].min().astype(np.int64),
            "max_k": gg["max_k"].max().astype(np.int64),
        }).reset_index()

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: merge(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_props_key_stats(sf_dir: str) -> rd.Dataset:
    return props_key_stats(sf_dir)
