"""A11: the enumerated allowed-universe as a *generated Dataset*.

The reference materializes each policy statement's allowed event space
as the Cartesian product of its per-field allowed value sets and counts
DISTINCT tuple hashes across statements
(``src/eval/EnvPolicyEvaluator.py:79-169`` count_positives;
per-field generators ``src/model/EnvParamGenerators.py:87-110``; hash
set union ``:192-199``). Round 1 substituted the observed obs∪opr
transaction universe; this module builds the SPECIFIED shape
(VERDICT r1 #6):

- per-field domains = distinct observed values (the possible_params
  analog) — small, collected once;
- each statement's allowed space = ∏ (constraint value set or full
  domain), generated as ``ray.data.range(product) → map_batches`` with
  a vectorized mixed-radix decode — no driver loop, blocks stream;
- tuples are hashed per field and combined (the sha1-of-tuple analog);
- uPos = #distinct hashes across statements: exact via a bucketed
  unique (small/medium spaces), or HLL via the ``HllAgg`` UDAF at
  cluster scale (fixed-register exchange only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.hashing import combine_hashes, hash_strings
# the shared bucketed distinct kernel lives with the aggregation
# primitives (sum_by_key_bucketed etc.)
from .itemsets import distinct_count_exact


def statement_product_size(statement: dict[str, list[str]],
                           domains: dict[str, list[str]]) -> int:
    """A10: closed-form cardinality of one statement's allowed space."""
    total = 1
    for field, dom in domains.items():
        total *= len(statement.get(field, dom))
    return total


def allowed_tuple_hashes(statement: dict[str, list[str]],
                         domains: dict[str, list[str]]):
    """One statement's allowed space as a Dataset of uint64 tuple
    hashes: ``rd.range(∏ sizes)`` decoded mixed-radix per batch. The
    per-field value-hash tables are tiny and shipped in the closure."""
    fields = sorted(domains)
    value_lists = [sorted(statement.get(f, domains[f])) for f in fields]
    sizes = np.array([len(v) for v in value_lists], dtype=np.int64)
    if (sizes == 0).any():
        return rd.from_pandas(pd.DataFrame({"h": pd.Series(dtype=np.uint64)}))
    total = int(np.prod(sizes))
    # pre-hash each field's values once; a tuple's hash is the ordered
    # combine of its field-value hashes (order-sensitive fold, so
    # (a,b) ≠ (b,a))
    vhashes = [hash_strings(pd.Series([f"{f}={v}" for v in vals]))
               for f, vals in zip(fields, value_lists)]
    radix = np.concatenate([np.cumprod(sizes[::-1])[::-1][1:], [1]]).astype(np.int64)

    def decode(b: pd.DataFrame) -> pd.DataFrame:
        idx = b["id"].to_numpy()
        h = None
        for k in range(len(sizes)):
            digit = (idx // radix[k]) % sizes[k]
            fh = vhashes[k][digit]
            h = fh if h is None else combine_hashes(h, fh)
        return pd.DataFrame({"h": h})

    return rd.range(total).map_batches(decode, batch_format="pandas")




def distinct_count_hll(hash_ds, p: int = 14) -> int:
    """HLL estimate of the same union (the 10¹²-scale path: fixed
    2^p-register partials are the only exchange)."""
    from ..udaf import HllAgg

    res = hash_ds.aggregate(HllAgg("h", p=p, alias="est"))
    return int(res["est"]) if res and res.get("est") is not None else 0


def count_allowed_universe(statements: list[dict[str, list[str]]],
                           domains: dict[str, list[str]],
                           mode: str = "exact") -> dict:
    """uPos across statements (distinct union) + per-statement product
    sizes + the total possible space (A10)."""
    per_stmt = [statement_product_size(s, domains) for s in statements]
    union = None
    for s in statements:
        ds = allowed_tuple_hashes(s, domains)
        union = ds if union is None else union.union(ds)
    if union is None:
        u_pos = 0
    elif mode == "hll":
        u_pos = distinct_count_hll(union)
    else:
        u_pos = distinct_count_exact(union)
    return {
        "u_pos": u_pos,
        "per_statement": per_stmt,
        "universe_total": statement_product_size({}, domains),
    }


def count_allowed_universe_pyset(statements, domains) -> int:
    """Driver-side brute-force set union (the reference's in-memory
    inner_allowed_hashes) — the small-fixture parity oracle for tests."""
    import itertools

    fields = sorted(domains)
    seen: set[tuple] = set()
    for s in statements:
        lists = [sorted(s.get(f, domains[f])) for f in fields]
        for combo in itertools.product(*lists):
            seen.add(combo)
    return len(seen)


def statements_from_rules(rules, domains: dict[str, list[str]],
                          pair_field: str = "role_tool") -> list[dict]:
    """Mined itemset rules → enumerable policy statements: a rule's
    items are the allowed values of the joint (role,tool) field; every
    other field ranges over its full observed domain (the
    constraints_map construction, ``src/EnvAbacRuleMiner.py:207-232`` →
    ``EnvPolicyEvaluator.count_positives``)."""
    from ..stages.transactionize import ITEM_SEP

    stmts = []
    for _, r in rules.iterrows():
        items = sorted(set(r["antecedent"].split(ITEM_SEP)
                           + r["consequent"].split(ITEM_SEP)))
        allowed = [v for v in items if v in set(domains[pair_field])]
        stmts.append({pair_field: allowed})
    return stmts


def score_policy_turns_generated(opr_ds, rules, domains: dict[str, list[str]],
                                 mode: str = "exact") -> dict:
    """The reference's ACTUAL uPos semantics end-to-end (turn/event
    level, ``EnvPolicyEvaluator.py:202-252``): a turn tuple
    (role_tool, hour, weekday) is allowed iff some statement's
    constraint covers it; uTP/uFN count DISTINCT exercised tuples,
    uPos counts the DISTINCT generated allowed tuples, uFP = uPos−uTP
    (allowed-but-never-exercised states). Exercised-tuple distincts run
    through the same bucketed-unique pipeline as the generated side."""
    stmts = statements_from_rules(rules, domains)
    allowed_items = sorted({v for s in stmts for v in s["role_tool"]})

    def tuple_hashes(b: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(b["ts"])
        fields = {
            "hour": ts.dt.hour.astype(str),
            "role_tool": b["role"].astype(str) + "=" + b["tool"].astype(str),
            "weekday": ts.dt.dayofweek.astype(str),
        }
        h = None
        # sorted(field) order must match allowed_tuple_hashes' fold
        for f in sorted(fields):
            fh = hash_strings(f + "=" + fields[f])
            h = fh if h is None else combine_hashes(h, fh)
        allowed = fields["role_tool"].isin(allowed_items).to_numpy()
        return pd.DataFrame({"h": h, "allowed": allowed.astype(np.int64)})

    # materialized once: four downstream actions (count, sum, two
    # distinct passes) would otherwise each re-run the opr read + hash
    tagged = opr_ds.map_batches(tuple_hashes,
                                batch_format="pandas").materialize()
    n_turns = tagged.count()
    c_tp = int(tagged.sum("allowed") or 0)
    u_tp = distinct_count_exact(
        tagged.map_batches(lambda b: b.loc[b["allowed"].astype(bool), ["h"]],
                           batch_format="pandas"))
    u_seen = distinct_count_exact(
        tagged.map_batches(lambda b: b[["h"]], batch_format="pandas"))
    u_fn = u_seen - u_tp
    res = count_allowed_universe(stmts, domains, mode=mode)
    u_pos = res["u_pos"]
    total = res["universe_total"]
    u_fp = max(0, u_pos - u_tp)
    u_tn = max(0, total - (u_tp + u_fn + u_fp))
    precision = 1.0 if (u_tp + u_fp) == 0 else u_tp / (u_tp + u_fp)
    recall = 1.0 if (u_tp + u_fn) == 0 else u_tp / (u_tp + u_fn)
    return {
        "n_turns": int(n_turns), "c_tp": c_tp, "c_fn": int(n_turns - c_tp),
        "u_tp": int(u_tp), "u_fn": int(u_fn), "u_fp": int(u_fp),
        "u_tn": int(u_tn), "u_pos": int(u_pos), "universe_total": int(total),
        "precision": precision, "recall": recall,
        "n_rules": int(len(rules)),
    }


# ----------------------------------------------------------------- query
def _event_domains(sf_dir: str) -> dict[str, list[str]]:
    """Per-field distinct observed values (possible_params analog) from
    a distributed distinct, collected once (the small side)."""
    from .features import _field_frame

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "ts", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        f = _field_frame(b)[["role", "tool", "hour", "weekday"]]
        frames = [pd.DataFrame({"field": c, "value": f[c].unique()})
                  for c in f.columns]
        return pd.concat(frames, ignore_index=True)

    from ray.data.aggregate import Count

    # distributed grouped distinct first: the driver sees at most
    # |fields x per-field distincts| rows, never |blocks| x distincts
    d = (ds.map_batches(partial, batch_format="pandas")
         .groupby(["field", "value"])
         .aggregate(Count(alias_name="n"))
         .to_pandas())
    return {f: sorted(sub["value"]) for f, sub in d.groupby("field")}


def q_allowed_universe(sf_dir: str) -> pd.DataFrame:
    """Oracle-checkable A11/A10 demo: two deterministic statements (the
    most frequent role; the most frequent tool, each with a deterministic
    count-then-name tie-break) over the (role, tool, hour, weekday)
    domains; exact uPos of their union plus per-statement product sizes."""
    domains = _event_domains(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        from .features import _tool_from_props

        r = b["event_type"].value_counts()
        t = _tool_from_props(b["props"]).value_counts()
        return pd.concat([
            pd.DataFrame({"kind": "role", "value": r.index, "n": r.to_numpy()}),
            pd.DataFrame({"kind": "tool", "value": t.index, "n": t.to_numpy()}),
        ], ignore_index=True)

    from ray.data.aggregate import Sum

    c = (ds.map_batches(counts, batch_format="pandas")
         .groupby(["kind", "value"])
         .aggregate(Sum("n", alias_name="n")).to_pandas())
    c = c.sort_values(["n", "value"], ascending=[False, True], kind="mergesort")
    top_role = c[c["kind"] == "role"].iloc[0]["value"]
    top_tool = c[c["kind"] == "tool"].iloc[0]["value"]
    statements = [{"role": [top_role]}, {"tool": [top_tool]}]
    res = count_allowed_universe(statements, domains, mode="exact")
    return pd.DataFrame([{
        "u_pos": np.int64(res["u_pos"]),
        "stmt1_allowed": np.int64(res["per_statement"][0]),
        "stmt2_allowed": np.int64(res["per_statement"][1]),
        "universe_total": np.int64(res["universe_total"]),
    }])
