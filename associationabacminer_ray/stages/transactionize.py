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
    # numpy where beats pandas .replace (regex machinery) ~10x on object cols
    role = batch[role_col].fillna("NONE").to_numpy()
    tool = batch[tool_col].fillna("NONE").to_numpy()
    role = pd.Series(np.where(role == "", "NONE", role), index=batch.index)
    tool = pd.Series(np.where(tool == "", "NONE", tool), index=batch.index)
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
                    max_k: int = 2, max_transaction_items: int | None = None,
                    turn_weights: np.ndarray | None = None) -> Counter:
    """Count all 1..max_k-item subsets across transactions.

    ``transactions`` holds tuples of sorted distinct items; the expansion
    runs per DISTINCT transaction and multiplies by its multiplicity.
    ``max_transaction_items`` guards against pathological conversations
    (a 10^4-item transaction would otherwise explode combinatorially) —
    oversized transactions contribute their 1-itemsets only.

    With ``turn_weights`` (total raw turns of the conversations sharing
    each distinct transaction), counter values become ``(conv_count,
    turn_count)`` pairs — turn_count is the ``all_log_entries`` analog
    (how much raw log the itemset explains, reference
    EnvOverassignmentCalculator.py:119 'all_log_entries').
    """
    counter: Counter = Counter()
    weighted = turn_weights is not None
    tw = turn_weights if weighted else multiplicities
    for items, mult, w in zip(transactions, multiplicities, tw):
        mult = int(mult)
        inc = np.array([mult, int(w)]) if weighted else mult
        n = len(items)
        if max_transaction_items is not None and n > max_transaction_items:
            for it in items:
                counter[(it,)] += inc
            continue
        for k in range(1, min(max_k, n) + 1):
            for combo in itertools.combinations(items, k):
                counter[combo] += inc
    return counter


def itemset_partials_from_codes(conv_codes: np.ndarray, item_codes: np.ndarray,
                                item_vocab: np.ndarray, max_k: int = 2,
                                max_transaction_items: int | None = 64,
                                with_turn_counts: bool = False) -> pd.DataFrame:
    """Exact partial supports from integer codes — the zero-object hot path.

    ``conv_codes``/``item_codes`` are dense dictionary indices (parquet
    pages already store these — no string hashing or Python objects are
    touched until the per-DISTINCT-transaction expansion).
    ``item_vocab[code]`` gives the item string.

    ``with_turn_counts`` adds a ``turn_count`` column: Σ raw turns of the
    conversations containing each itemset — the ``all_log_entries``
    analog (EnvOverassignmentCalculator.py:119), making the Qrul_freq
    score family distinct from the count family.
    """
    from ..functions.hashing import splitmix64

    n = len(conv_codes)
    cols = {"itemset": pd.Series(dtype=object),
            "k": pd.Series(dtype=np.int32),
            "count": pd.Series(dtype=np.int64)}
    if with_turn_counts:
        cols["turn_count"] = pd.Series(dtype=np.int64)
    empty = pd.DataFrame(cols)
    if n == 0:
        return empty
    conv_codes = conv_codes.astype(np.int64)
    conv_turns = np.bincount(conv_codes) if with_turn_counts else None
    V = np.int64(len(item_vocab))
    key = conv_codes * V + item_codes.astype(np.int64)
    skey = np.sort(key, kind="stable")
    keep = np.ones(n, dtype=bool)
    keep[1:] = skey[1:] != skey[:-1]
    skey = skey[keep]
    conv_s = skey // V
    item_s = (skey % V).astype(np.int64)

    starts = np.flatnonzero(np.r_[True, conv_s[1:] != conv_s[:-1]])
    lengths = np.diff(np.r_[starts, len(conv_s)]).astype(np.int64)
    tx_key = np.add.reduceat(splitmix64(item_s.astype(np.uint64)), starts) ^ \
        splitmix64(lengths.astype(np.uint64))
    uniq, first, inv, counts = np.unique(tx_key, return_index=True,
                                         return_inverse=True, return_counts=True)
    turn_w = None
    if with_turn_counts:
        # Σ raw turns of the convs sharing each distinct transaction
        per_conv_turns = conv_turns[conv_s[starts]]
        turn_w = np.bincount(inv, weights=per_conv_turns).astype(np.int64)

    transactions = [
        tuple(sorted(item_vocab[item_s[s:s + ln]]))
        for s, ln in zip(starts[first], lengths[first])
    ]
    counter = expand_itemsets(transactions, counts, max_k, max_transaction_items,
                              turn_weights=turn_w)
    if not counter:
        return empty
    keys = list(counter.keys())
    out = {
        "itemset": [ITEM_SEP.join(c) for c in keys],
        "k": np.array([len(c) for c in keys], dtype=np.int32),
    }
    if with_turn_counts:
        vals = np.array(list(counter.values()), dtype=np.int64)
        out["count"] = vals[:, 0]
        out["turn_count"] = vals[:, 1]
    else:
        out["count"] = np.fromiter(counter.values(), dtype=np.int64,
                                   count=len(keys))
    return pd.DataFrame(out)


def read_shard_codes(path: str, conv_col: str = "conv_id", role_col: str = "role",
                     tool_col: str = "tool"):
    """Read one parquet shard dictionary-encoded and return
    (conv_codes, item_codes, item_vocab, conv_vocab) with normalization
    (''/null → NONE) applied at VOCAB level — O(vocab), not O(rows)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[conv_col, role_col, tool_col],
                      read_dictionary=[conv_col, role_col, tool_col])

    def codes_and_vocab(col):
        arr = t.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not isinstance(arr, pa.DictionaryArray):
            arr = arr.dictionary_encode()
        vocab = arr.dictionary.to_numpy(zero_copy_only=False).astype(object)
        # nulls live in the INDICES (not the vocab): a raw to_numpy gives
        # NaN → astype(int64) garbage. Map nulls to an appended None slot
        # so the vocab-level NONE normalization handles them.
        import pyarrow.compute as pc_

        indices = arr.indices
        if indices.null_count:
            indices = pc_.fill_null(indices, len(vocab))
            vocab = np.append(vocab, None)
        return indices.to_numpy(zero_copy_only=False).astype(np.int64), vocab

    conv_codes, conv_vocab = codes_and_vocab(conv_col)
    conv_vocab = np.where(pd.isna(conv_vocab), "NONE", conv_vocab)
    r_codes, r_vocab = codes_and_vocab(role_col)
    t_codes, t_vocab = codes_and_vocab(tool_col)
    r_vocab = np.where(pd.isna(r_vocab) | (r_vocab == ""), "NONE", r_vocab)
    t_vocab = np.where(pd.isna(t_vocab) | (t_vocab == ""), "NONE", t_vocab)
    T = len(t_vocab)
    grid_codes = r_codes.astype(np.int64) * T + t_codes
    # canonicalize through the item STRING (vocab-level): normalization can
    # alias two grid codes (e.g. '' and 'NONE') onto one item
    present, inv = np.unique(grid_codes, return_inverse=True)
    strs = np.array([f"{r_vocab[c // T]}={t_vocab[c % T]}" for c in present],
                    dtype=object)
    item_vocab, canon = np.unique(strs, return_inverse=True)
    item_codes = canon[inv]
    return conv_codes, item_codes, item_vocab.astype(object), conv_vocab


def itemset_partials_in_bucket(group: pd.DataFrame, conv_col: str = "conv_id",
                               item_col: str = "item", max_k: int = 2,
                               max_transaction_items: int | None = 64,
                               tx_count_key: str | None = None) -> pd.DataFrame:
    """Per-bucket exact partial supports: (itemset, k, count).

    Hash-numeric hot path: rows are deduped / grouped via uint64 hashes
    (radix-friendly lexsort + reduceat) so no per-row Python objects are
    created; strings are only touched for the (few) DISTINCT
    transactions during subset expansion. Distinct transactions are
    identified by a (Σ mix(item_hash), length) key — a collision there
    needs two different item sets with equal sum and size within one
    bucket (~n²/2⁶⁴, negligible, and detected by the oracle tests).
    """
    from ..functions.hashing import splitmix64

    n = len(group)
    if n == 0:
        return pd.DataFrame({"itemset": pd.Series(dtype=object),
                             "k": pd.Series(dtype=np.int32),
                             "count": pd.Series(dtype=np.int64)})
    conv_h = hash_strings(group[conv_col])
    item_strs = group[item_col].to_numpy()
    item_h = hash_strings(group[item_col])

    # dedupe (conv, item) pairs and group by conv — all in hash space
    order = np.lexsort((item_h, conv_h))
    ch, ih = conv_h[order], item_h[order]
    keep = np.ones(n, dtype=bool)
    keep[1:] = (ch[1:] != ch[:-1]) | (ih[1:] != ih[:-1])
    sel = order[keep]
    ch, ih = ch[keep], ih[keep]

    starts = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
    lengths = np.diff(np.r_[starts, len(ch)]).astype(np.int64)
    tx_key = np.add.reduceat(splitmix64(ih), starts) ^ splitmix64(
        lengths.astype(np.uint64))
    uniq, first, counts = np.unique(tx_key, return_index=True, return_counts=True)

    # expansion touches only distinct transactions; items sorted
    # lexicographically so itemset identity matches the string oracle
    rep_starts = starts[first]
    rep_lens = lengths[first]
    transactions = [
        tuple(sorted(item_strs[sel[s:s + ln]])) for s, ln in zip(rep_starts, rep_lens)
    ]
    counter = expand_itemsets(transactions, counts, max_k, max_transaction_items)
    keys = list(counter.keys())
    itemsets = [ITEM_SEP.join(c) for c in keys]
    ks = [len(c) for c in keys]
    cnts = list(counter.values())
    if tx_count_key is not None:
        # conv buckets are disjoint in hash space, so the per-bucket
        # distinct-conversation count sums to the global n_transactions
        # in the same shuffle as the supports — no second corpus scan
        # (mine_window previously paid a full distinct_conv_count pass)
        itemsets.append(tx_count_key)
        ks.append(0)
        cnts.append(int(len(starts)))
    if not itemsets:
        return pd.DataFrame({"itemset": pd.Series(dtype=object),
                             "k": pd.Series(dtype=np.int32),
                             "count": pd.Series(dtype=np.int64)})
    return pd.DataFrame(
        {
            "itemset": itemsets,
            "k": np.array(ks, dtype=np.int32),
            "count": np.array(cnts, dtype=np.int64),
        }
    )
