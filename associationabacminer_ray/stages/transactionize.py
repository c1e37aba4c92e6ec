"""Transaction building + k-itemset expansion (bucketed, vectorized).

Semantic transplant of the reference's Orange one-hot transaction table
(``src/TableCreator.py:108-163``, ``src/EnvAbacRuleMiner.py:161``): a
transaction is one conversation's *distinct* item set, where an item is
the ``"role=tool"`` string of a turn (analog of the event's ``k=v``
constraint set).

Scale design (SURVEY.md §7.3): the only row-moving shuffle is keyed by
``bucket = hash(conv_id) % B`` — conversations are high-cardinality and
un-skewed, so B buckets stay balanced regardless of how hot individual
``(role, tool)`` pairs are. Inside one bucket everything is vectorized
pandas; itemset expansion runs once per *distinct transaction* (not per
conversation) and multiplies by multiplicity, so Zipf-heavy duplicate
transactions cost one combinatorial pass each. Buckets emit pre-counted
``(itemset, k, count)`` partials, so the final ``groupby(itemset)`` only
moves O(B × distinct itemsets) aggregate rows — never raw turns.
"""

from __future__ import annotations

import itertools
from collections import Counter

import numpy as np
import pandas as pd

from ..functions.hashing import hash_strings

ITEM_SEP = "|"


def make_items(batch: pd.DataFrame, role_col: str = "role", tool_col: str = "tool",
               out_col: str = "item") -> pd.DataFrame:
    """role + '=' + tool → item (missing/empty → NONE, as the reference
    fills missing valid_keys, ``ConfigurableEventNormalizer.py:157-160``)."""
    role = batch[role_col].fillna("NONE").replace("", "NONE")
    tool = batch[tool_col].fillna("NONE").replace("", "NONE")
    return batch.assign(**{out_col: role + "=" + tool})


def distinct_pairs_with_bucket(batch: pd.DataFrame, conv_col: str = "conv_id",
                               item_col: str = "item", num_buckets: int = 64) -> pd.DataFrame:
    """Pre-shuffle combiner: dedup (conv, item) within the batch and key by
    conv-hash bucket, so the shuffle moves distinct pairs, not turns."""
    out = batch[[conv_col, item_col]].drop_duplicates()
    out = out.copy()
    out["bucket"] = (hash_strings(out[conv_col]) % np.uint64(num_buckets)).astype(np.int32)
    return out


def transactions_in_bucket(group: pd.DataFrame, conv_col: str = "conv_id",
                           item_col: str = "item") -> pd.DataFrame:
    """One row per conversation: sorted distinct items joined by ','.
    (FIXTURES.md §F2 — also the unique-logs dedup analog,
    ``EnvLogUniverseGenerator.py:84-104``.)"""
    pairs = group[[conv_col, item_col]].drop_duplicates()
    pairs = pairs.sort_values([conv_col, item_col], kind="mergesort")
    tx = pairs.groupby(conv_col, sort=False)[item_col].agg(",".join)
    return pd.DataFrame({conv_col: tx.index, "items": tx.to_numpy()})


def expand_itemsets(transactions: pd.Series, multiplicities: np.ndarray,
                    max_k: int = 2, max_transaction_items: int | None = None) -> Counter:
    """Count all 1..max_k-item subsets across transactions.

    ``transactions`` holds tuples of sorted distinct items; the expansion
    runs per DISTINCT transaction and multiplies by its multiplicity.
    ``max_transaction_items`` guards against pathological conversations
    (a 10^4-item transaction would otherwise explode combinatorially) —
    oversized transactions contribute their 1-itemsets only.
    """
    counter: Counter = Counter()
    for items, mult in zip(transactions, multiplicities):
        mult = int(mult)
        n = len(items)
        if max_transaction_items is not None and n > max_transaction_items:
            for it in items:
                counter[(it,)] += mult
            continue
        for k in range(1, min(max_k, n) + 1):
            for combo in itertools.combinations(items, k):
                counter[combo] += mult
    return counter


def itemset_partials_in_bucket(group: pd.DataFrame, conv_col: str = "conv_id",
                               item_col: str = "item", max_k: int = 2,
                               max_transaction_items: int | None = 64) -> pd.DataFrame:
    """Per-bucket exact partial supports: (itemset, k, count)."""
    pairs = group[[conv_col, item_col]].drop_duplicates()
    pairs = pairs.sort_values([conv_col, item_col], kind="mergesort")
    tx = pairs.groupby(conv_col, sort=False)[item_col].agg(tuple)
    tx_mult = tx.value_counts()  # distinct transaction -> #convs in bucket
    counter = expand_itemsets(tx_mult.index, tx_mult.to_numpy(), max_k,
                              max_transaction_items)
    if not counter:
        return pd.DataFrame({"itemset": pd.Series(dtype=object),
                             "k": pd.Series(dtype=np.int32),
                             "count": pd.Series(dtype=np.int64)})
    keys = list(counter.keys())
    return pd.DataFrame(
        {
            "itemset": [ITEM_SEP.join(c) for c in keys],
            "k": np.array([len(c) for c in keys], dtype=np.int32),
            "count": np.fromiter(counter.values(), dtype=np.int64, count=len(keys)),
        }
    )
