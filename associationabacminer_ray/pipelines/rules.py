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

from ..functions.hashing import hash_any, hash_strings
from ..functions.scoring import MINIMIZED_METRICS, score_columns
from ..sketches import BloomFilter
from ..stages.transactionize import ITEM_SEP


def extract_constant_items(supports: pd.DataFrame,
                           n_transactions: int) -> tuple[pd.DataFrame, list[str]]:
    """Single-value-column handling (``TableCreator.py:124-128`` /
    ``EnvOverassignmentCalculator.py:174``): items present in EVERY
    transaction carry no discriminative signal — pull them out of
    mining and re-inject them into every selected rule. Returns the
    pruned supports table (constant items removed from itemset strings)
    and the constant item list."""
    if not len(supports) or "k" not in supports.columns:
        return supports, []
    singles = supports[supports["k"] == 1]
    constants = sorted(singles.loc[singles["support"] >= n_transactions, "itemset"])
    if not constants:
        return supports, []
    cset = set(constants)

    def prune(itemset: str) -> str:
        return ITEM_SEP.join(x for x in itemset.split(ITEM_SEP) if x not in cset)

    pruned = supports.copy()
    pruned["itemset"] = pruned["itemset"].map(prune)
    pruned = pruned[pruned["itemset"] != ""]
    # identical pruned itemsets: keep the max support (the subset without
    # the constant has the same support as with it, by definition);
    # turn_support (when tracked) follows the same rule
    value_cols = ["support"] + (["turn_support"]
                                if "turn_support" in pruned.columns else [])
    pruned = pruned.groupby("itemset", as_index=False)[value_cols].max()
    pruned["k"] = (pruned["itemset"].str.count("\\" + ITEM_SEP) + 1).astype("int32")
    return pruned[["itemset", "k"] + value_cols], constants


def reinject_constant_items(rules: pd.DataFrame, constants: list[str]) -> pd.DataFrame:
    """Append the extracted constant items to every rule's antecedent
    (the reference re-adds them to every mined rule)."""
    if not constants or not len(rules):
        if len(rules):
            rules = rules.assign(constant_items="")
        return rules
    suffix = ITEM_SEP.join(constants)
    out = rules.copy()
    out["constant_items"] = suffix
    out["antecedent"] = out["antecedent"] + ITEM_SEP + suffix
    out["n_antecedent"] = out["n_antecedent"] + len(constants)
    return out


def policy_constraint_summary(rules: pd.DataFrame) -> pd.DataFrame:
    """A18 (``ConfigPolicySummarizer.py:18-40``): frequency of every
    constraint item and of every field (the part left of '=') across a
    policy's rules."""
    from collections import Counter

    items: Counter = Counter()
    fields: Counter = Counter()
    for _, r in rules.iterrows():
        parts = r["antecedent"].split(ITEM_SEP) + r["consequent"].split(ITEM_SEP)
        for p in parts:
            items[p] += 1
            fields[p.split("=", 1)[0]] += 1
    rows = ([("item", k, v) for k, v in items.items()]
            + [("field", k, v) for k, v in fields.items()])
    return (pd.DataFrame(rows, columns=["kind", "name", "n"])
            .sort_values(["kind", "n", "name"], ascending=[True, False, True])
            .reset_index(drop=True))


def rules_from_supports(supports: pd.DataFrame, n_transactions: int,
                        min_support: int = 1, beta: float = 1.0,
                        max_consequent: int | None = 1,
                        coverage_denominator: str = "transactions",
                        total_turns: int | None = None) -> pd.DataFrame:
    """Expand a (itemset, k, support) table into scored rules.

    The supports table is the *post-aggregation* small side (bounded by
    min_support / top-k) so this runs driver-side or inside one
    map_batches over its partitions with the 1..(k-1)-itemset supports
    broadcast as a dict.
    """
    if not len(supports) or "itemset" not in supports.columns:
        supports = pd.DataFrame({"itemset": pd.Series(dtype=object),
                                 "k": pd.Series(dtype="int32"),
                                 "support": pd.Series(dtype="int64")})
    sup_map: dict[str, int] = dict(zip(supports["itemset"], supports["support"]))
    has_turns = "turn_support" in supports.columns
    turn_map: dict[str, int] = (dict(zip(supports["itemset"],
                                         supports["turn_support"]))
                                if has_turns else {})
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
                             len(ante), len(cons),
                             turn_map.get(itemset, support_ab)))
    df = pd.DataFrame(rows, columns=["antecedent", "consequent", "support_ab",
                                     "support_a", "support_b", "n_antecedent",
                                     "n_consequent", "support_ab_turns"])
    if not has_turns and len(df):
        df = df.drop(columns=["support_ab_turns"])
    if len(df):
        for c in ("support_ab", "support_a", "support_b") + (
                ("support_ab_turns",) if has_turns else ()):
            df[c] = df[c].astype(np.int64)
        df = score_columns(df, n_transactions, beta,
                           coverage_denominator=coverage_denominator,
                           total_turns=total_turns)
        df = df.sort_values(["cscore", "antecedent", "consequent"],
                            ascending=[False, True, True], kind="mergesort")
        df = df.reset_index(drop=True)
    return df


def rules_from_supports_ray(supports_ds, n_transactions: int,
                            min_support: int = 1, beta: float = 1.0,
                            max_consequent: int | None = 1,
                            coverage_denominator: str = "transactions",
                            total_turns: int | None = None):
    """Distributed rule expansion + scoring: the supports table stays a
    Dataset; the antecedent/consequent lookup map is broadcast once via
    ``ray.put`` (bounded by the min_support/top-k pruning — the
    reference caps candidate itemsets at 600k, ~50 MB as a dict) and
    each batch of multi-itemset rows expands and scores independently.
    Use when the candidate table outgrows the driver; result matches
    ``rules_from_supports`` row-for-row (tested)."""
    import ray

    # the lookup side: every itemset's support (and turn support) —
    # collected once; rows stream back through map_batches for expansion
    sup_df = (supports_ds if isinstance(supports_ds, pd.DataFrame)
              else supports_ds.to_pandas())
    maps = {
        "sup": dict(zip(sup_df["itemset"], sup_df["support"])),
        "turns": (dict(zip(sup_df["itemset"], sup_df["turn_support"]))
                  if "turn_support" in sup_df.columns else None),
    }
    maps_ref = ray.put(maps)

    import ray.data as rd

    multi = sup_df[sup_df["k"] >= 2]
    if not len(multi):
        # keep the return type a Dataset on this data-dependent path too
        return rd.from_pandas(rules_from_supports(
            sup_df, n_transactions, min_support, beta, max_consequent,
            coverage_denominator=coverage_denominator,
            total_turns=total_turns))
    ds = rd.from_pandas(multi.reset_index(drop=True))

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(maps_ref)
        sup_map, turn_map = m["sup"], m["turns"]
        rows = []
        for itemset, support_ab in zip(batch["itemset"], batch["support"]):
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
                        continue
                    row = (a_key, b_key, support_ab, support_a, support_b,
                           len(ante), len(cons))
                    if turn_map is not None:
                        row += (turn_map.get(itemset, support_ab),)
                    rows.append(row)
        cols = ["antecedent", "consequent", "support_ab", "support_a",
                "support_b", "n_antecedent", "n_consequent"]
        if turn_map is not None:
            cols.append("support_ab_turns")
        out = pd.DataFrame(rows, columns=cols)
        if len(out):
            out = score_columns(out, n_transactions, beta,
                                coverage_denominator=coverage_denominator,
                                total_turns=total_turns)
        return out

    return ds.map_batches(expand, batch_format="pandas")


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


# shared with the policy evaluator — one implementation (evaluate.py)
from .evaluate import _rule_matches as _matches_rule  # noqa: E402


def _expand_tx_items(items_series: pd.Series, max_k: int):
    """Per-batch itemset expansion over transaction item strings — THE
    shared combiner for the greedy per-round counters (exact and sketch
    modes must expand identically): value_counts folds duplicate
    transactions first, then 1..max_k combinations weighted by
    multiplicity."""
    from collections import Counter

    counter: Counter = Counter()
    mult = items_series.value_counts()
    for items_str, m in mult.items():
        items = tuple(items_str.split(","))
        for k in range(1, min(max_k, len(items)) + 1):
            for combo in itertools.combinations(items, k):
                counter[ITEM_SEP.join(combo)] += int(m)
    return counter


def _tx_sketch_supports(tx_ds, max_k: int = 2, cms_width: int = 1 << 13,
                        cms_depth: int = 4,
                        topk_capacity: int = 4096) -> pd.DataFrame:
    """Sketch-mode per-round support counting over a (conv_id, items)
    transactions Dataset: each BATCH (rows are one-per-conversation, so
    batches never double-count) expands itemsets into a CMS + top-k
    partial; the only exchange is fixed-size blobs through
    ``SketchMergeAgg``. Returns the heavy-hitter candidates as a
    (itemset, k, support) frame, CMS-backfilling any 1-itemset subset
    the top-k head is missing so rule scoring has its antecedent
    supports. Counts are overestimates (monotone-safe for min_support
    pruning and for the greedy's shrinking cover)."""

    from ..functions.hashing import hash_string_scalar
    from ..sketches import CountMinSketch, Sketch, SpaceSaving
    from ..udaf import SketchMergeAgg

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        counter = _expand_tx_items(batch["items"], max_k)
        cms = CountMinSketch(width=cms_width, depth=cms_depth)
        topk = SpaceSaving(capacity=topk_capacity)
        if counter:
            keys = list(counter.keys())
            counts = np.fromiter(counter.values(), dtype=np.int64,
                                 count=len(counter))
            cms.update_hashed(hash_strings(pd.Series(keys, dtype=object)),
                              counts)
            topk.update(keys, counts)
        return pd.DataFrame({"name": ["cms", "topk"],
                             "blob": [cms.to_bytes(), topk.to_bytes()]})

    merged = (tx_ds.map_batches(partials, batch_format="pandas")
              .groupby("name")
              .aggregate(SketchMergeAgg("blob", alias="blob")))
    sk: dict = {}
    for row in merged.take_all():
        sk[row["name"]] = Sketch.from_bytes(bytes(row["blob"]))
    if "topk" not in sk:
        return pd.DataFrame({"itemset": pd.Series(dtype=object),
                             "k": pd.Series(dtype="int32"),
                             "support": pd.Series(dtype="int64")})
    rows = [(key, count) for key, count, _ in sk["topk"].top()]
    df = pd.DataFrame(rows, columns=["itemset", "support"])
    df["k"] = (df["itemset"].str.count("\\" + ITEM_SEP) + 1).astype("int32")
    # CMS-backfill EVERY proper subset the top-k head is missing (not
    # just singles): rules_from_supports drops a rule whose antecedent
    # or consequent support is absent, which for max_k ≥ 3 would
    # silently lose rules whose 2-item subset fell off the head
    have = set(df["itemset"])
    backfill = []
    for itemset in df.loc[df["k"] >= 2, "itemset"]:
        parts = itemset.split(ITEM_SEP)
        for r in range(1, len(parts)):
            for combo in itertools.combinations(parts, r):
                key = ITEM_SEP.join(combo)
                if key not in have:
                    have.add(key)
                    backfill.append(
                        (key, sk["cms"].estimate_one(hash_string_scalar(key)),
                         len(combo)))
    if backfill:
        df = pd.concat([df, pd.DataFrame(backfill,
                                         columns=["itemset", "support", "k"])],
                       ignore_index=True)
    df["support"] = df["support"].astype(np.int64)
    df["k"] = df["k"].astype("int32")
    return df[["itemset", "k", "support"]]


def greedy_cover_ray(transactions_ds, n_transactions: int | None = None,
                     metric: str = "cscore", max_rounds: int = 20,
                     coverage_target: float = 0.95, min_support: int = 2,
                     max_k: int = 2, beta: float = 1.0,
                     bloom_bits: int = 1 << 24,
                     merge_buckets: int = 32,
                     mode: str = "exact") -> pd.DataFrame:
    """Distributed greedy cover over a (conv_id, items) transactions
    Dataset (SURVEY.md §7.4 "greedy set-cover is inherently sequential").

    Rounds are driver iterations; within a round everything is
    data-parallel: the covered-conversation Bloom filter is broadcast
    (``ray.put``) and applied inside ``map_batches`` (anti-join J2 — no
    per-round shuffle of the corpus), supports are partial-counted per
    batch and merged through the small bucketed sum. Bloom false
    positives can only over-remove (monotone shrinkage, like the
    reference's delete_by_query). The transactions Dataset is
    materialized once so each round re-reads object-store blocks, not
    parquet.
    """
    import ray


    from ..state.broadcast import bloom_filter_stage
    from .itemsets import sum_by_key_bucketed

    tx = transactions_ds.materialize()
    if n_transactions is None:
        n_transactions = tx.count()
    covered = BloomFilter(num_bits=bloom_bits)
    have_covered = False
    selected: list[dict] = []

    def batch_partials(batch: pd.DataFrame) -> pd.DataFrame:
        counter = _expand_tx_items(batch["items"], max_k)
        return pd.DataFrame({"itemset": list(counter.keys()),
                             "count": np.fromiter(counter.values(), dtype=np.int64,
                                                  count=len(counter))})

    for rnd in range(max_rounds):
        cur = tx
        if have_covered:
            # materialize the filtered corpus once per round: three
            # downstream actions (count, supports, matched-hashes) would
            # otherwise each re-run the Bloom scan over every block
            cur = cur.map_batches(
                bloom_filter_stage(ray.put(covered), "conv_id"),
                batch_format="pandas").materialize()
        uncovered = cur.count()
        if uncovered == 0 or 1 - uncovered / n_transactions >= coverage_target:
            break
        if mode == "sketch":
            # 100 TB per-round path: fixed-size CMS/top-k blobs are the
            # only exchange — no (itemset, count) row shuffle at all
            supports = _tx_sketch_supports(cur, max_k=max_k)
        else:
            partials = cur.map_batches(batch_partials, batch_format="pandas")
            supports = sum_by_key_bucketed(
                partials, "itemset", "count", "support",
                num_buckets=merge_buckets).to_pandas()
            supports["k"] = (supports["itemset"].str.count("\\" + ITEM_SEP)
                             + 1).astype("int32")
        rules = rules_from_supports(supports[supports["support"] >= min_support],
                                    uncovered, min_support, beta)
        if not len(rules):
            break
        top = best_rule(rules, metric)
        rule_items = sorted(top["antecedent"].split(ITEM_SEP)
                            + top["consequent"].split(ITEM_SEP))

        def matched_hashes(batch: pd.DataFrame) -> pd.DataFrame:
            m = _matches_rule(batch["items"].reset_index(drop=True), rule_items)
            # hash_any, matching bloom_filter_stage's probe side — using a
            # different hash family here would make the filter never match
            return pd.DataFrame(
                {"h": hash_any(batch["conv_id"].reset_index(drop=True)[m])})

        # per-partition Bloom partials OR-merged by the BloomAgg UDAF
        # (tree merge) — the driver receives ONE fixed-size blob per
        # round, never the matched-hash stream (VERDICT r1 #3). BloomAgg
        # geometry must equal `covered`'s so the merge is bit-compatible.
        from ray.data.aggregate import Count

        from ..udaf import BloomAgg

        agg = cur.map_batches(matched_hashes, batch_format="pandas").aggregate(
            BloomAgg("h", num_bits=covered.num_bits,
                     num_hashes=covered.num_hashes, seed=covered.seed,
                     alias="bloom"),
            Count(alias_name="n"))
        newly = int(agg["n"]) if agg and agg.get("n") is not None else 0
        if newly:
            covered = covered.merge(BloomFilter.from_bytes(agg["bloom"]))
            have_covered = True
        selected.append({
            "round": rnd,
            "antecedent": top["antecedent"],
            "consequent": top["consequent"],
            metric: float(top[metric]),
            "support_ab": int(top["support_ab"]),
            "covered_this_round": int(newly),
            "uncovered_before": int(uncovered),
        })
        if newly == 0:
            break
    return pd.DataFrame(selected)


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
