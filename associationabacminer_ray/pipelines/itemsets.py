"""Frequent-itemset support counting — exact and sketch modes.

The centerpiece transplant (SURVEY.md §7.0): the reference one-hot
encodes normalized events and runs FP-growth
(``src/EnvAbacRuleMiner.py:161-168``); here a conversation's distinct
``role=tool`` turn-set is the transaction, and support counting is a
Ray Data pipeline:

  read → map_batches(make_items + per-batch (conv,item) dedup + bucket)
       → groupby(bucket).map_groups(vectorized expansion → partial counts)
       → groupby(itemset).sum                       [exact mode]
       → or: per-bucket CMS/top-k/HLL partial blobs
             → groupby(name[, salt]).aggregate(SketchMergeAgg)   [sketch mode]

Exact mode is the small-scale oracle (and the correctness-gate path);
sketch mode is the 100 TB path — its shuffle moves only fixed-size
registers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.hashing import hash_strings
from ..sketches import CountMinSketch, HyperLogLog, SpaceSaving
from ..stages.transactionize import (
    ITEM_SEP,
    distinct_pairs_with_bucket,
    itemset_partials_in_bucket,
    make_items,
    transactions_in_bucket,
)
from ..udaf import SketchMergeAgg

_EMPTY_SUPPORTS = pd.DataFrame({"itemset": pd.Series(dtype=object),
                                "k": pd.Series(dtype="int32"),
                                "support": pd.Series(dtype="int64")})


def sum_by_key_bucketed(ds: Dataset, key_col: str, value_col: str,
                        out_col: str | None = None,
                        num_buckets: int = 64,
                        extra_value_cols: list[str] | None = None) -> Dataset:
    """High-cardinality SUM-by-key.

    Ray's ``groupby(key).aggregate(...)`` pays a per-GROUP Python/slicing
    overhead (~ms each) — catastrophic for 10^5+ distinct keys. This
    instead shuffles on ``hash(key) % num_buckets`` and runs a vectorized
    pandas groupby inside each bucket group: per-group cost becomes
    C-level, per-bucket cost one Python call.
    """
    out_col = out_col or value_col

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _mb=(hash_strings(b[key_col]) % np.uint64(num_buckets)).astype(np.int32))

    extra = list(extra_value_cols or [])

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, sort=False)[[value_col] + extra].sum().reset_index()
        out.columns = [key_col, out_col] + extra
        for c in [out_col] + extra:
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_mb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def item_pairs(ds: Dataset, conv_col: str = "conv_id", role_col: str = "role",
               tool_col: str = "tool", num_buckets: int = 64) -> Dataset:
    """transcripts → distinct (conv_id, item, bucket) pairs (pre-shuffle combiner)."""
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = make_items(batch, role_col, tool_col)
        return distinct_pairs_with_bucket(batch, conv_col, "item", num_buckets)

    cols = [conv_col, role_col, tool_col]
    return ds.select_columns(cols).map_batches(fn, batch_format="pandas")


def transactions(ds: Dataset, conv_col: str = "conv_id", num_buckets: int = 64) -> Dataset:
    """One row per conversation: (conv_id, items) with items = sorted
    distinct role=tool strings joined by ',' (FIXTURES.md §F2)."""
    pairs = item_pairs(ds, conv_col=conv_col, num_buckets=num_buckets)
    return pairs.groupby("bucket").map_groups(
        lambda g: transactions_in_bucket(g, conv_col, "item"),
        batch_format="pandas",
    )


def distinct_count_exact(hash_ds: Dataset, num_buckets: int = 64,
                         col: str = "h") -> int:
    """Exact distinct over a uint64 hash Dataset: per-batch unique →
    bucketed per-bucket nunique → sum. Only unique hashes shuffle. THE
    shared distinct-count kernel (conv counts, universe unions)."""
    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b[col].to_numpy().astype(np.uint64))
        return pd.DataFrame({"h": u,
                             "_b": (u % np.uint64(num_buckets)).astype(np.int32)})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g["h"].nunique())]})

    out = (hash_ds.map_batches(uniq, batch_format="pandas")
           .groupby("_b").map_groups(count_bucket, batch_format="pandas")
           .to_pandas())
    return int(out["n"].sum()) if len(out) else 0


def distinct_conv_count(ds: Dataset, conv_col: str = "conv_id",
                        num_buckets: int = 64) -> int:
    """Exact #distinct conversations WITHOUT building transactions
    (2.6× faster than ``transactions(ds).count()`` on the 80M-turn
    bench window): hash the conv column, then the shared bucketed
    distinct kernel."""
    hashed = ds.select_columns([conv_col]).map_batches(
        lambda b: pd.DataFrame({"h": hash_strings(b[conv_col])}),
        batch_format="pandas")
    return distinct_count_exact(hashed, num_buckets=num_buckets)


# unforgeable in-band key: every real item contains '=' (make_items
# builds role + "=" + tool) and this key contains none
TX_COUNT_KEY = "\x00n_tx"


def split_tx_count(supports: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    """Extract the ``include_tx_count`` sentinel from a supports frame:
    returns (supports without the sentinel, n_transactions). THE one
    place that knows the sentinel shape — callers must not re-implement
    it. Tolerates the column-less frame an empty Dataset produces."""
    if "itemset" not in supports.columns:
        return _EMPTY_SUPPORTS.copy(), 0
    sent = supports["itemset"] == TX_COUNT_KEY
    n_tx = int(supports.loc[sent, "support"].sum())
    return supports[~sent], n_tx


def exact_itemset_supports(ds: Dataset, conv_col: str = "conv_id", max_k: int = 2,
                           num_buckets: int = 64, min_support: int = 1,
                           max_transaction_items: int | None = 64,
                           min_support_frac: float | None = None,
                           itemset_limit: int | None = None,
                           include_tx_count: bool = False) -> Dataset:
    """(itemset, k, support) with support = #conversations containing the
    itemset. Exact analog of FP-growth counting at min_support.
    ``min_support_frac`` mirrors the reference's relative ``itemset_freq``
    knob (src/job/job_generator.py:114-136): the absolute threshold
    becomes ``ceil(frac × n_transactions)``. ``itemset_limit`` mirrors
    the count-threshold top-k (src/EnvAbacRuleMiner.py:234-247): keep
    only the top-N itemsets by support (Ray-native sort + limit).

    ``include_tx_count=True`` rides the distinct-conversation count
    through the SAME shuffle as the supports (one sentinel row per conv
    bucket, k=0, summed like any itemset) instead of a second full
    corpus scan — the row comes back as (TX_COUNT_KEY, k=0, n_tx) and
    is exempt from min_support/itemset_limit."""
    if include_tx_count and itemset_limit:
        raise ValueError("include_tx_count with itemset_limit would let "
                         "the sentinel row consume a top-N slot")
    if min_support_frac is not None:
        # hash-distinct kernel: no list of conv ids ever reaches the driver
        n_tx = distinct_conv_count(ds, conv_col=conv_col,
                                   num_buckets=num_buckets)
        min_support = max(min_support, int(np.ceil(min_support_frac * n_tx)))
    pairs = item_pairs(ds, conv_col=conv_col, num_buckets=num_buckets)
    # the exploded pair rows inherit the read's block count with
    # collapsed sizes; Ray's sort exchange scales with block count
    # (PERF #26/#29) — coalesce before the bucket groupby
    pairs = pairs.repartition(max(32, num_buckets))
    tx_key = TX_COUNT_KEY if include_tx_count else None
    partials = pairs.groupby("bucket").map_groups(
        lambda g: itemset_partials_in_bucket(
            g, conv_col, "item", max_k=max_k,
            max_transaction_items=max_transaction_items,
            tx_count_key=tx_key,
        ),
        batch_format="pandas",
    )
    agg = sum_by_key_bucketed(partials, "itemset", "count", "support",
                              num_buckets=max(8, num_buckets // 2))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "support" not in batch.columns:
            return _EMPTY_SUPPORTS.copy()
        sentinel = batch["itemset"] == TX_COUNT_KEY
        batch = batch[(batch["support"] >= min_support) | sentinel]
        out = batch.copy()
        out["k"] = (out["itemset"].str.count("\\" + ITEM_SEP) + 1).astype(np.int32)
        out.loc[out["itemset"] == TX_COUNT_KEY, "k"] = 0
        out["support"] = out["support"].astype(np.int64)
        return out[["itemset", "k", "support"]]

    out = agg.map_batches(finish, batch_format="pandas")
    # reference gate is `itemset_limit > 0` (src/EnvAbacRuleMiner.py:234-247):
    # 0/None both mean "no cap"
    if itemset_limit is not None and itemset_limit > 0:
        out = out.sort(["support", "itemset"],
                       descending=[True, False]).limit(itemset_limit)
    return out


def _itemset_hash_fn(itemset_hash: str):
    """Resolve the itemset-key hash family: ``"sip"`` (default,
    ``hash_strings``) or ``"poly"`` — the byte-polynomial fold whose
    SQL restatement (``functions/sqlgen.polyhash_select``) lets a
    DuckDB oracle re-derive CMS estimates independently."""
    if itemset_hash == "poly":
        from ..functions.hashing import hash_strings_poly

        return hash_strings_poly
    if itemset_hash != "sip":
        raise ValueError(f"unknown itemset_hash {itemset_hash!r}")
    return hash_strings


def _bucket_sketch_partials_fn(conv_col: str, max_k: int,
                               max_transaction_items: int | None, cms_width: int,
                               cms_depth: int, topk_capacity: int, hll_p: int,
                               num_salts: int, itemset_hash: str = "sip",
                               conv_hash: str = "sip"):
    """Build the map_groups fn: per conv-bucket, expand itemsets and update
    CMS + space-saving + an HLL of conv_ids; emit serialized partial blobs.
    ``conv_hash`` picks the HLL conv-key family — "poly" makes the
    distinct-transaction ESTIMATE SQL-derivable (see
    functions/sqlgen.windowed_sketch_sweep_events_sql)."""
    num_salts = max(1, num_salts)
    ihash = _itemset_hash_fn(itemset_hash)
    chash = _itemset_hash_fn(conv_hash)

    def bucket_sketch_partials(group: pd.DataFrame) -> pd.DataFrame:
        partial = itemset_partials_in_bucket(
            group, conv_col, "item", max_k=max_k,
            max_transaction_items=max_transaction_items,
        )
        cms = CountMinSketch(width=cms_width, depth=cms_depth)
        topk = SpaceSaving(capacity=topk_capacity)
        hll = HyperLogLog(p=hll_p)
        if len(partial):
            hashes = ihash(partial["itemset"])
            counts = partial["count"].to_numpy()
            cms.update_hashed(hashes, counts)
            topk.update(partial["itemset"].tolist(), counts)
        hll.update_hashed(chash(group[conv_col].drop_duplicates()))
        salt = int(group["bucket"].iloc[0]) % num_salts if len(group) else 0
        n_tx = group[conv_col].nunique()
        return pd.DataFrame(
            {
                "name": ["itemset_cms", "itemset_topk", "conv_hll"],
                "salt": np.int32(salt),
                "blob": [cms.to_bytes(), topk.to_bytes(), hll.to_bytes()],
                "n_transactions": np.int64(n_tx),
            }
        )

    return bucket_sketch_partials


def item_vocab(ds: Dataset, role_col: str = "role",
               tool_col: str = "tool") -> np.ndarray:
    """Sorted distinct ``role=tool`` item strings (the dictionary for the
    coded shuffle). Per-batch distinct partials; the collected side is
    O(vocab), not O(rows)."""
    def uniq(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"item": make_items(b, role_col,
                                                tool_col)["item"].unique()})

    parts = (ds.select_columns([role_col, tool_col])
             .map_batches(uniq, batch_format="pandas").to_pandas())
    return np.sort(parts["item"].unique())


def item_pairs_coded(ds: Dataset, vocab_ref, conv_col: str = "conv_id",
                     role_col: str = "role", tool_col: str = "tool",
                     num_buckets: int = 64) -> Dataset:
    """transcripts → distinct (conv_hash u64, item code i32, bucket)
    rows: the coded pre-shuffle combiner. 16 bytes/row vs ~35 for the
    string form — the all-to-all that dominates the general-input sketch
    path moves ~2× fewer bytes, and the map side touches strings only
    per unique (role, tool) combo (PERF.md #18)."""
    import ray

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        vocab = ray.get(vocab_ref)
        b = make_items(batch, role_col, tool_col)
        codes = np.searchsorted(vocab, b["item"].to_numpy()).astype(np.int32)
        conv_h = hash_strings(b[conv_col])
        order = np.lexsort((codes, conv_h))
        ch, cd = conv_h[order], codes[order]
        keep = np.ones(len(ch), dtype=bool)
        keep[1:] = (ch[1:] != ch[:-1]) | (cd[1:] != cd[:-1])
        ch, cd = ch[keep], cd[keep]
        return pd.DataFrame({
            "conv_h": ch, "code": cd,
            "bucket": (ch % np.uint64(num_buckets)).astype(np.int32)})

    cols = [conv_col, role_col, tool_col]
    return ds.select_columns(cols).map_batches(fn, batch_format="pandas")


def _bucket_sketch_partials_coded_fn(max_k: int,
                                     max_transaction_items: int | None,
                                     cms_width: int, cms_depth: int,
                                     topk_capacity: int, hll_p: int,
                                     num_salts: int, vocab_ref,
                                     itemset_hash: str = "sip"):
    """Coded twin of ``_bucket_sketch_partials_fn``: same partial blobs,
    built from (conv_h, code) rows — conv hashes come pre-computed (the
    identical hash family the string path derives in-bucket, so HLL and
    transaction counts match bit-for-bit) and item strings are decoded
    from the broadcast vocab only for the few DISTINCT transactions."""
    import ray

    from ..stages.transactionize import itemset_partials_from_codes

    num_salts = max(1, num_salts)
    ihash = _itemset_hash_fn(itemset_hash)

    def bucket_sketch_partials(group: pd.DataFrame) -> pd.DataFrame:
        vocab = ray.get(vocab_ref)
        conv_h = group["conv_h"].to_numpy().astype(np.uint64)
        uniq_conv, conv_dense = np.unique(conv_h, return_inverse=True)
        partial = itemset_partials_from_codes(
            conv_dense.astype(np.int64),
            group["code"].to_numpy().astype(np.int64), vocab,
            max_k=max_k, max_transaction_items=max_transaction_items)
        cms = CountMinSketch(width=cms_width, depth=cms_depth)
        topk = SpaceSaving(capacity=topk_capacity)
        hll = HyperLogLog(p=hll_p)
        if len(partial):
            hashes = ihash(partial["itemset"])
            counts = partial["count"].to_numpy()
            cms.update_hashed(hashes, counts)
            topk.update(partial["itemset"].tolist(), counts)
        hll.update_hashed(uniq_conv)
        salt = int(group["bucket"].iloc[0]) % num_salts if len(group) else 0
        return pd.DataFrame(
            {
                "name": ["itemset_cms", "itemset_topk", "conv_hll"],
                "salt": np.int32(salt),
                "blob": [cms.to_bytes(), topk.to_bytes(), hll.to_bytes()],
                "n_transactions": np.int64(len(uniq_conv)),
            }
        )

    return bucket_sketch_partials


def sketched_itemset_supports(ds: Dataset, conv_col: str = "conv_id", max_k: int = 2,
                              num_buckets: int = 64, num_salts: int = 8,
                              max_transaction_items: int | None = 64,
                              cms_width: int = 1 << 13, cms_depth: int = 4,
                              topk_capacity: int = 4096, hll_p: int = 14,
                              two_phase: bool | None = None,
                              coded: bool = False,
                              itemset_hash: str = "sip",
                              conv_hash: str = "sip") -> dict:
    """Sketch-mode supports: returns
    ``{"cms": CountMinSketch, "topk": SpaceSaving, "hll": HyperLogLog,
       "n_transactions": int}``.

    Two-phase salted merge: bucket partials → groupby((name, salt)) →
    groupby(name). Estimate any itemset's support with
    ``cms.estimate_one(hash_string_scalar("a|b"))`` or read the
    heavy-hitter head from ``topk.top(k)``.

    ``coded=True``: a vocab pass first, then the all-to-all moves
    (conv_hash u64, item code i32) instead of strings — ~2× fewer
    shuffled bytes, identical estimates (CMS/HLL bit-equal,
    parity-tested). MEASURED trade-off on this corpus (short ~10-char
    items): the vocab scan + per-batch coding costs roughly what the
    sort saves, so string stays the default; flip to coded when item
    strings are long (real tool names / URLs), where shuffled-byte
    reduction grows with string length while the coding cost doesn't."""
    import ray

    if coded:
        vocab_ref = ray.put(item_vocab(ds))
        pairs = item_pairs_coded(ds, vocab_ref, conv_col=conv_col,
                                 num_buckets=num_buckets)
        fn = _bucket_sketch_partials_coded_fn(
            max_k, max_transaction_items, cms_width, cms_depth,
            topk_capacity, hll_p, num_salts, vocab_ref,
            itemset_hash=itemset_hash)
    else:
        pairs = item_pairs(ds, conv_col=conv_col, num_buckets=num_buckets)
        fn = _bucket_sketch_partials_fn(conv_col, max_k, max_transaction_items,
                                        cms_width, cms_depth, topk_capacity,
                                        hll_p, num_salts,
                                        itemset_hash=itemset_hash,
                                        conv_hash=conv_hash)
    # Ray's sort-based exchange cost scales with INPUT BLOCK COUNT, not
    # bytes (PERF #26): the exploded pair rows inherit the read's block
    # count with collapsed block sizes, and the blob partials are 3×B
    # tiny rows spread over B blocks. Coalescing both exchanges measured
    # 15.3 s → 8.9 s (pair groupby) and 5.8 s → 0.5 s (blob merge) on
    # the 20 M-turn bench corpus at 32 CPUs — results unchanged (group
    # membership is layout-independent and every blob merge on a gate
    # path is order-independent: CMS/HLL always, top-k in its exact
    # regime).
    pairs = pairs.repartition(max(32, num_buckets))
    partials = (pairs.groupby("bucket")
                .map_groups(fn, batch_format="pandas")
                .repartition(8))
    # two-phase (salted) merge only pays off when the partial count is large
    # enough that a single reduce would bottleneck on one task
    if two_phase is None:
        two_phase = num_buckets >= 256
    if two_phase:
        partials = partials.groupby(["name", "salt"]).aggregate(
            SketchMergeAgg("blob", alias="blob"),
            Sum("n_transactions", alias_name="n_transactions"),
        )
    merged = partials.groupby("name").aggregate(
        SketchMergeAgg("blob", alias="blob"),
        Sum("n_transactions", alias_name="n_transactions"),
    )
    out: dict = {}
    from ..sketches import Sketch

    for row in merged.take_all():
        key = {"itemset_cms": "cms", "itemset_topk": "topk", "conv_hll": "hll"}[row["name"]]
        out[key] = Sketch.from_bytes(bytes(row["blob"]))
        # each bucket stamps its transaction count on every name row, so any
        # single name's sum is the global total
        out["n_transactions"] = int(row["n_transactions"])
    if not out:  # empty input: fresh zero-state sketches
        out = {"cms": CountMinSketch(width=cms_width, depth=cms_depth),
               "topk": SpaceSaving(capacity=topk_capacity),
               "hll": HyperLogLog(p=hll_p), "n_transactions": 0}
    return out


def itemset_supports_partitioned(paths: list[str], mode: str = "sketch",
                                 conv_col: str = "conv_id", max_k: int = 2,
                                 max_transaction_items: int | None = 64,
                                 min_support: int = 1,
                                 cms_width: int = 1 << 13, cms_depth: int = 4,
                                 topk_capacity: int = 4096, hll_p: int = 14,
                                 merge_buckets: int = 32,
                                 with_turn_counts: bool = False):
    """Shuffle-free supports for conv-partitioned input.

    PARTITIONING ASSUMPTION (documented per the custom-operator rule): no
    conversation spans two input files — true for conversation logs
    written per conv-range shard (and for our corpus writer). Then the
    transaction build is embarrassingly parallel: one task per shard
    reads its file, transactionizes, expands itemsets and emits partial
    counts (or sketch blobs) — the only exchange left is the tiny
    partial merge. This is the 100 TB path: the general shuffle path
    (``exact_/sketched_itemset_supports``) exists for un-partitioned
    input.

    mode="exact"  → Dataset (itemset, k, support)
    mode="sketch" → {"cms", "topk", "hll", "n_transactions"}
    """
    import ray.data as rd

    sketch = mode == "sketch"

    def process_shard(batch: pd.DataFrame) -> pd.DataFrame:
        from ..stages.transactionize import (
            itemset_partials_from_codes,
            read_shard_codes,
        )

        frames = []
        for path in batch["path"]:
            conv_codes, item_codes, item_vocab, conv_vocab = read_shard_codes(
                path, conv_col=conv_col)
            partial = itemset_partials_from_codes(
                conv_codes, item_codes, item_vocab, max_k=max_k,
                max_transaction_items=max_transaction_items,
                with_turn_counts=with_turn_counts and not sketch)
            if not sketch:
                frames.append(partial)
                continue
            cms = CountMinSketch(width=cms_width, depth=cms_depth)
            topk = SpaceSaving(capacity=topk_capacity)
            hll = HyperLogLog(p=hll_p)
            if len(partial):
                hashes = hash_strings(partial["itemset"])
                counts = partial["count"].to_numpy()
                cms.update_hashed(hashes, counts)
                topk.update(partial["itemset"].tolist(), counts)
            used = np.unique(conv_codes)
            hll.update_hashed(hash_strings(conv_vocab[used]))
            frames.append(pd.DataFrame(
                {
                    "name": ["itemset_cms", "itemset_topk", "conv_hll"],
                    "blob": [cms.to_bytes(), topk.to_bytes(), hll.to_bytes()],
                    "n_transactions": np.int64(len(used)),
                }
            ))
        return pd.concat(frames, ignore_index=True)

    shards = rd.from_items([{"path": p} for p in paths])
    partials = shards.map_batches(process_shard, batch_format="pandas",
                                  batch_size=1)
    if sketch:
        merged = partials.groupby("name").aggregate(
            SketchMergeAgg("blob", alias="blob"),
            Sum("n_transactions", alias_name="n_transactions"),
        )
        out: dict = {}
        from ..sketches import Sketch

        for row in merged.take_all():
            key = {"itemset_cms": "cms", "itemset_topk": "topk",
                   "conv_hll": "hll"}[row["name"]]
            out[key] = Sketch.from_bytes(bytes(row["blob"]))
            out["n_transactions"] = int(row["n_transactions"])
        if not out:
            out = {"cms": CountMinSketch(width=cms_width, depth=cms_depth),
                   "topk": SpaceSaving(capacity=topk_capacity),
                   "hll": HyperLogLog(p=hll_p), "n_transactions": 0}
        return out

    extra = ["turn_count"] if with_turn_counts else None
    agg = sum_by_key_bucketed(partials, "itemset", "count", "support",
                              num_buckets=merge_buckets,
                              extra_value_cols=extra)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty or "support" not in batch.columns:
            out = _EMPTY_SUPPORTS.copy()
            if with_turn_counts:
                out["turn_support"] = pd.Series(dtype=np.int64)
            return out
        batch = batch[batch["support"] >= min_support]
        out = batch.copy()
        out["k"] = (out["itemset"].str.count("\\" + ITEM_SEP) + 1).astype(np.int32)
        keep = ["itemset", "k", "support"]
        if with_turn_counts:
            out["turn_support"] = out["turn_count"].astype(np.int64)
            keep.append("turn_support")
        return out[keep]

    return agg.map_batches(finish, batch_format="pandas")


def itemset_supports_apriori(paths: list[str], min_support: int,
                             conv_col: str = "conv_id",
                             max_transaction_items: int | None = 64,
                             merge_buckets: int = 32):
    """Apriori-pruned 3-itemset supports over conv-partitioned input.

    Brute k=3 expansion is C(T,3) per transaction — the itemset-space
    explosion the reference bounds with ``itemset_limit``. The Apriori
    property (every subset of a frequent set is frequent) prunes it in
    two passes:

      pass 1: k ≤ 2 supports (shuffle-free partitioned pipeline)
      pass 2: the frequent-pair hash set is broadcast (``ray.put``);
              each shard expands ONLY triples whose three member pairs
              are all frequent.

    Returns (itemset, k, support) for k ≤ 3 with k=3 complete above
    min_support (exactness of surviving counts tested vs brute force).
    """
    import itertools as _it

    import ray

    base = itemset_supports_partitioned(
        paths, mode="exact", conv_col=conv_col, max_k=2,
        max_transaction_items=max_transaction_items, min_support=1,
        merge_buckets=merge_buckets).to_pandas()
    freq_pairs = set(
        base.loc[(base["k"] == 2) & (base["support"] >= min_support), "itemset"])
    pairs_ref = ray.put(freq_pairs)

    def shard_triples(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        from ..stages.transactionize import read_shard_codes

        frequent = ray.get(pairs_ref)
        counter: Counter = Counter()
        for path in batch["path"]:
            conv_codes, item_codes, item_vocab, _ = read_shard_codes(
                path, conv_col=conv_col)
            df = pd.DataFrame({"c": conv_codes, "i": item_codes}).drop_duplicates()
            for _, grp in df.groupby("c", sort=False):
                items = sorted(item_vocab[grp["i"].to_numpy()])
                n = len(items)
                if n < 3 or (max_transaction_items is not None
                             and n > max_transaction_items):
                    continue
                # candidate triples: all three member pairs frequent
                for a, b, c in _it.combinations(items, 3):
                    if (f"{a}{ITEM_SEP}{b}" in frequent
                            and f"{a}{ITEM_SEP}{c}" in frequent
                            and f"{b}{ITEM_SEP}{c}" in frequent):
                        counter[f"{a}{ITEM_SEP}{b}{ITEM_SEP}{c}"] += 1
        if not counter:
            return pd.DataFrame({"itemset": pd.Series(dtype=object),
                                 "count": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"itemset": list(counter.keys()),
                             "count": np.fromiter(counter.values(),
                                                  dtype=np.int64,
                                                  count=len(counter))})

    import ray.data as rd

    shards = rd.from_items([{"path": p} for p in paths])
    partials = shards.map_batches(shard_triples, batch_format="pandas",
                                  batch_size=1)
    triples = sum_by_key_bucketed(partials, "itemset", "count", "support",
                                  num_buckets=merge_buckets).to_pandas()
    if len(triples):
        triples = triples[triples["support"] >= min_support].copy()
        triples["k"] = np.int32(3)
    else:
        triples = pd.DataFrame({"itemset": pd.Series(dtype=object),
                                "support": pd.Series(dtype=np.int64),
                                "k": pd.Series(dtype=np.int32)})
    out = pd.concat(
        [base[base["support"] >= min_support][["itemset", "k", "support"]],
         triples[["itemset", "k", "support"]]], ignore_index=True)
    return out


def sketched_itemset_supports_checkpointed(
        input_files: list[str], ckpt_dir: str, conv_col: str = "conv_id",
        max_k: int = 2, num_buckets: int = 64,
        max_transaction_items: int | None = 64, cms_width: int = 1 << 15,
        cms_depth: int = 4, topk_capacity: int = 4096, hll_p: int = 14) -> dict:
    """Resumable sketch-mode supports: one checkpoint partition per input
    shard (FIXTURES §F5). A killed run resumes by loading finished
    shards' blobs and recomputing only the rest; merge associativity
    makes resume == fresh bit-for-bit for CMS/HLL (property-tested)."""
    import ray.data as rd

    from ..state.checkpoint import run_with_checkpoint

    config = {
        "pipeline": "sketched_itemset_supports", "max_k": max_k,
        "conv_col": conv_col,
        "num_buckets": num_buckets, "max_tx": max_transaction_items,
        "cms_width": cms_width, "cms_depth": cms_depth,
        "topk_capacity": topk_capacity, "hll_p": hll_p,
    }

    def compute_partition(pid: int, path: str):
        ds = rd.read_parquet(path, columns=[conv_col, "role", "tool"])
        res = sketched_itemset_supports(
            ds, conv_col=conv_col, max_k=max_k, num_buckets=num_buckets,
            max_transaction_items=max_transaction_items, cms_width=cms_width,
            cms_depth=cms_depth, topk_capacity=topk_capacity, hll_p=hll_p,
        )
        return ({"cms": res["cms"], "topk": res["topk"], "hll": res["hll"]},
                res["n_transactions"])

    merged = run_with_checkpoint(input_files, ckpt_dir, compute_partition, config)
    merged["n_transactions"] = int(round(merged["hll"].estimate()))
    return merged


def item_distinct_convs_exact(ds: Dataset, conv_col: str = "conv_id",
                              num_buckets: int = 64) -> Dataset:
    """(item, distinct_convs) exactly — conv-buckets partition conversations
    disjointly, so per-bucket nunique sums to the global distinct count
    without a second dedup shuffle."""
    pairs = item_pairs(ds, conv_col=conv_col, num_buckets=num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("item", sort=False)[conv_col].nunique().reset_index()
        out.columns = ["item", "partial"]
        return out

    partial = pairs.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    return sum_by_key_bucketed(partial, "item", "partial", "distinct_convs",
                               num_buckets=max(8, num_buckets // 2))
