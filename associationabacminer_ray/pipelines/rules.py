"""Association rules from itemset supports + greedy set-cover mining.

Rule generation mirrors FP-growth → RuleEval construction
(``src/model/RuleUtils.py:29-38``, ``src/model/RuleEval.py:4-43``):
every frequent k-itemset (k ≥ 2) is split into every non-empty
antecedent ⊂ itemset with the remainder as consequent; scores come from
``functions.scoring`` (the reference's score family).

Greedy cover mirrors ``EnvFlatAbacRuleMiner.mine_rules_for_window``
(``src/EnvAbacRuleMiner.py:133-232``): rounds are inherently sequential
driver iterations; within a round, support counting is the fully
data-parallel bucketed pipeline. Covered conversations are removed via a
**Bloom filter** broadcast into ``map_batches`` (the sketch replacement
for the reference's per-round ES ``delete_by_query`` anti-join,
``src/EnvAbacRuleMiner.py:268-272``) — false positives can only
*over*-remove, mirroring the reference's monotone shrinkage; exact mode
uses the materialized conv-id set when it fits.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from ..functions.hashing import hash_strings
from ..functions.scoring import MINIMIZED_METRICS, score_columns
from ..sketches import BloomFilter
from ..stages.transactionize import ITEM_SEP


def rules_from_supports(supports: pd.DataFrame, n_transactions: int,
                        min_support: int = 1, beta: float = 1.0,
                        max_consequent: int | None = 1) -> pd.DataFrame:
    """Expand a (itemset, k, support) table into scored rules.

    The supports table is the *post-aggregation* small side (bounded by
    min_support / top-k) so this runs driver-side or inside one
    map_batches over its partitions with the 1..(k-1)-itemset supports
    broadcast as a dict.
    """
    sup_map: dict[str, int] = dict(zip(supports["itemset"], supports["support"]))
    rows: list[tuple] = []
    multi = supports[supports["k"] >= 2]
    for itemset, support_ab in zip(multi["itemset"], multi["support"]):
        if support_ab < min_support:
            continue
        items = itemset.split(ITEM_SEP)
        n = len(items)
        for r in range(1, n):
            if max_consequent is not None and n - r > max_consequent:
                continue
            for ante in itertools.combinations(items, r):
                cons = tuple(x for x in items if x not in ante)
                a_key = ITEM_SEP.join(ante)
                b_key = ITEM_SEP.join(cons)
                support_a = sup_map.get(a_key)
                support_b = sup_map.get(b_key)
                if support_a is None or support_b is None:
                    continue  # below min_support upstream
                rows.append((a_key, b_key, support_ab, support_a, support_b,
                             len(ante), len(cons)))
    df = pd.DataFrame(rows, columns=["antecedent", "consequent", "support_ab",
                                     "support_a", "support_b", "n_antecedent",
                                     "n_consequent"])
    if len(df):
        for c in ("support_ab", "support_a", "support_b"):
            df[c] = df[c].astype(np.int64)
        df = score_columns(df, n_transactions, beta)
        df = df.sort_values(["cscore", "antecedent", "consequent"],
                            ascending=[False, True, True], kind="mergesort")
        df = df.reset_index(drop=True)
    return df


def best_rule(rules: pd.DataFrame, metric: str = "cscore") -> pd.Series:
    """Global argmax (min for l_dist), tie-break on fewer total constraints
    then lexicographic — src/EnvAbacRuleMiner.py:107-122."""
    if not len(rules):
        raise ValueError("no candidate rules")
    asc = metric in MINIMIZED_METRICS
    n_items = rules["n_antecedent"] + rules["n_consequent"]
    order = rules.assign(_n=n_items).sort_values(
        [metric, "_n", "antecedent", "consequent"],
        ascending=[asc, True, True, True], kind="mergesort",
    )
    return order.iloc[0].drop(labels=["_n"])


def _matches_rule(items_joined: pd.Series, rule_items: list[str]) -> np.ndarray:
    """Vectorized: does the transaction (',' joined sorted items) contain
    every rule item?"""
    padded = "," + items_joined + ","
    mask = np.ones(len(items_joined), dtype=bool)
    for it in rule_items:
        mask &= padded.str.contains("," + it + ",", regex=False).to_numpy()
    return mask


def greedy_cover(transactions_df: pd.DataFrame, n_transactions: int | None = None,
                 metric: str = "cscore", max_rounds: int = 20,
                 coverage_target: float = 0.95, min_support: int = 2,
                 max_k: int = 2, beta: float = 1.0,
                 use_bloom: bool = True, bloom_bits: int = 1 << 22) -> pd.DataFrame:
    """Greedy rule selection over a (conv_id, items) transactions table.

    Each round: count itemset supports over *uncovered* transactions,
    score candidate rules, select the best, mark every conversation
    matching the rule's full itemset as covered. Returns the selected
    policy with per-round coverage stats.

    Driver-side variant for window-scale data (the reference mines one
    30-day window at a time); `pipelines.mining.mine_window` wires the
    distributed support counting per round.
    """
    from collections import Counter

    covered = BloomFilter(num_bits=bloom_bits) if use_bloom else None
    have_covered = False
    df = transactions_df.copy()
    if n_transactions is None:
        n_transactions = len(df)
    selected: list[dict] = []
    for rnd in range(max_rounds):
        if covered is not None and have_covered:
            conv_h = hash_strings(df["conv_id"])
            df = df[~covered.contains_hashed(conv_h)]
        uncovered = len(df)
        if uncovered == 0 or 1 - uncovered / n_transactions >= coverage_target:
            break
        # exact per-round supports (small side: one window's transactions)
        counter: Counter = Counter()
        tx_mult = df["items"].str.split(",").apply(tuple).value_counts()
        for items, mult in tx_mult.items():
            for k in range(1, min(max_k, len(items)) + 1):
                for combo in itertools.combinations(items, k):
                    counter[ITEM_SEP.join(combo)] += mult
        supports = pd.DataFrame(
            {"itemset": list(counter.keys()),
             "k": [c.count(ITEM_SEP) + 1 for c in counter.keys()],
             "support": list(counter.values())}
        )
        rules = rules_from_supports(supports[supports["support"] >= min_support],
                                    uncovered, min_support, beta)
        if not len(rules):
            break
        top = best_rule(rules, metric)
        rule_items = (top["antecedent"].split(ITEM_SEP)
                      + top["consequent"].split(ITEM_SEP))
        m = _matches_rule(df["items"], sorted(rule_items))
        newly = df.loc[m, "conv_id"]
        if covered is not None:
            if len(newly):
                covered.add_hashed(hash_strings(newly))
                have_covered = True
        else:
            df = df[~m]
        selected.append(
            {
                "round": rnd,
                "antecedent": top["antecedent"],
                "consequent": top["consequent"],
                metric: float(top[metric]),
                "support_ab": int(top["support_ab"]),
                "covered_this_round": int(m.sum()),
                "uncovered_before": uncovered,
            }
        )
        if covered is None and len(df) == 0:
            break
    return pd.DataFrame(selected)
