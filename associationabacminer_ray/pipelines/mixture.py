"""Data-mixture operators for LLM training-data assembly: sequence
packing (concatenate-and-split at a context cap), target-mixture quota
sampling, deterministic fractional up/down-sampling ("epochs" per
source), per-source median-quality filtering, and tokenizer-fertility
stats.

These extend the reference's sampling surface (the Bernoulli
``instance_sample_rate`` skip, ``src/experiment/SeparatedVarianceSelector.py``,
and the per-stratum selection shape of ``q_stratified_sample``) to the
mixture-balancing decisions a 100 TB pretraining pipeline actually
makes: how many copies of each source, which exemplars fill a quota,
and how documents pack into fixed-length contexts.

Gate conventions shared with the rest of the repo:

- randomness = THE sampling hash (``analytics.sample_hash_values``,
  restated verbatim in every SQL oracle) so draws are reproducible
  across block layouts AND in DuckDB;
- token counts = whitespace ``\\S+`` runs (``pc.count_substring_regex``
  == ``len(regexp_extract_all(text, '\\S+'))``), the same definition
  ``text_stats`` / ``containment_dups`` pin;
- all arithmetic integer (counts, quotas, basis-point thresholds,
  truncating division on non-negative operands) — no float path can
  reorder.

Scale notes: packing is one source-keyed hash shuffle + a vectorized
cumsum per bucket (the ``user_running_total`` shape); quota sampling is
a mergeable per-batch per-source top-k prune (only ≤ quota candidate
rows per batch ever shuffle); upsampling is a stateless flat map whose
row replication happens inside the batch (NumPy ``repeat``), so the
output streams; the median filter broadcasts one (source → median)
dict built from a (source, n_chars)-histogram reduction bounded by the
length domain, not row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .analytics import bucketed_group_agg, sample_hash_values
from .temporal import quantile_rank_pick

# context cap (whitespace tokens) for concatenate-and-split packing
PACK_CAP_TOKENS = 512

# target mixture: share of the sampled corpus each source should
# contribute, in basis points (sums to 10000), and the total draw.
# quota_s = (MIXTURE_TOTAL * bp) // 10000, capped by availability.
MIXTURE_WEIGHTS_BP: dict[str, int] = {
    "src0": 2500, "src1": 500, "src2": 1500, "src3": 500, "src4": 1000,
    "src5": 1500, "src6": 500, "src7": 1000, "src8": 500, "src9": 500,
}
MIXTURE_TOTAL = 200

# per-source epoch factor in basis points: 10000 = one copy of every
# doc, 25000 = 2.5 epochs (2 copies + Bernoulli(0.5) third), 5000 =
# Bernoulli(0.5) downsample. Sources absent from the map default to
# one epoch (10000).
UPSAMPLE_EPOCHS_BP: dict[str, int] = {
    "src0": 25000, "src1": 10000, "src2": 5000, "src3": 30000,
    "src4": 15000, "src5": 2500, "src6": 10000, "src7": 7500,
}
_EPOCH_DEFAULT_BP = 10000
_HASH_MOD = 1 << 32


def _docs_tokens(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, n_tokens) with whitespace-token counts computed
    in one Arrow RE2 kernel per batch; NULL rows dropped (the oracles
    carry matching IS NOT NULL predicates)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "source": t["source"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
        })

    return docs.map_batches(count_tokens, batch_format="pyarrow")


# ------------------------------------------------------- sequence packing
def packed_chunks(sf_dir: str, cap: int = PACK_CAP_TOKENS,
                  num_buckets: int = 8) -> rd.Dataset:
    """Concatenate-and-split packing: within each source, documents are
    laid end-to-end in ``doc_id`` order and the token stream is cut
    every ``cap`` tokens; a document's ``chunk_id`` is the chunk holding
    its FIRST token, ``prev_cumsum // cap`` (docs longer than ``cap``
    simply span chunks — the standard pretraining concat-split, not
    bin packing). One source-keyed hash shuffle, then a vectorized
    sorted cumsum per bucket; cumsum operands are non-negative int64 so
    numpy floor division == DuckDB ``//`` truncation."""
    toks = _docs_tokens(sf_dir)
    return bucketed_group_agg(toks, ["source"],
                              lambda g: pack_assign(g, cap),
                              num_buckets=num_buckets)


def pack_assign(g: pd.DataFrame, cap: int) -> pd.DataFrame:
    """The packing kernel shared by ``packed_chunks`` and the assembly
    composition: per source in doc_id order, chunk of a doc's first
    token = prev-cumsum // cap."""
    g = g.sort_values(["source", "doc_id"], kind="mergesort")
    prev = (g.groupby("source", sort=False)["n_tokens"].cumsum()
            - g["n_tokens"])
    return pd.DataFrame({
        "doc_id": g["doc_id"].to_numpy(np.int64),
        "source": g["source"].to_numpy(object),
        "n_tokens": g["n_tokens"].to_numpy(np.int64),
        "chunk_id": (prev.to_numpy(np.int64) // np.int64(cap)),
    })


def q_packed_chunks(sf_dir: str) -> rd.Dataset:
    return packed_chunks(sf_dir)


# ------------------------------------------------- mixture quota sampling
def mixture_quotas(weights_bp: dict[str, int] = MIXTURE_WEIGHTS_BP,
                   total: int = MIXTURE_TOTAL) -> dict[str, int]:
    return {s: (total * bp) // 10000 for s, bp in weights_bp.items()}


def mixture_sample(sf_dir: str, weights_bp: dict[str, int] | None = None,
                   total: int = MIXTURE_TOTAL,
                   num_buckets: int = 8) -> rd.Dataset:
    """Draw a target mixture: per source ``s``, keep the ``quota_s``
    documents with the smallest ``(sample_hash(doc_id), doc_id)`` — an
    order-free deterministic 'random quota_s of source s'. Sources
    without a weight contribute nothing. Distributed as a per-batch
    per-source partial top-k prune (at most quota_s candidate rows per
    source per batch ever shuffle) → per-source exact pick in a
    bucketed merge — the ``q_stratified_sample`` shape with per-group
    k and hash-rank order."""
    quotas = mixture_quotas(weights_bp or MIXTURE_WEIGHTS_BP, total)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])

    def prune(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        d = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        d["q"] = d["source"].map(quotas)
        d = d[d["q"].notna() & (d["q"] > 0)]
        if d.empty:
            return pd.DataFrame({"source": np.array([], object),
                                 "doc_id": np.array([], np.int64),
                                 "h": np.array([], np.int64)})
        d["h"] = sample_hash_values(
            d["doc_id"].to_numpy(np.int64)).astype(np.int64)
        d = d.sort_values(["source", "h", "doc_id"], kind="mergesort")
        keep = d.groupby("source", sort=False).cumcount() < d["q"].to_numpy()
        return d.loc[keep, ["source", "doc_id", "h"]]

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "h", "doc_id"], kind="mergesort")
        q = g["source"].map(quotas).to_numpy()
        keep = g.groupby("source", sort=False).cumcount() < q
        out = g.loc[keep, ["source", "doc_id"]].reset_index(drop=True)
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    return bucketed_group_agg(
        docs.map_batches(prune, batch_format="pyarrow"),
        ["source"], pick, num_buckets=num_buckets)


def q_mixture_sample(sf_dir: str) -> rd.Dataset:
    return mixture_sample(sf_dir)


# -------------------------------------- deterministic epoch up/down-sampling
def upsample_copies(doc_ids: np.ndarray, bp: np.ndarray) -> np.ndarray:
    """Copies per doc for an epoch factor in basis points: the integer
    part unconditionally, plus one more iff sample_hash(doc_id) <
    (frac_bp · 2³²) // 10000 — Bernoulli(frac) in expectation,
    deterministic per doc, reproducible in SQL."""
    base = bp.astype(np.int64) // 10000
    frac_bp = bp.astype(np.int64) % 10000
    thresh = (frac_bp * _HASH_MOD) // 10000
    extra = sample_hash_values(doc_ids).astype(np.int64) < thresh
    return base + extra.astype(np.int64)


def upsampled_docs(sf_dir: str) -> rd.Dataset:
    """The replicated dataset itself: each doc repeated ``n_copies``
    times (``copy_idx`` 0..n-1) — a stateless in-batch NumPy repeat, so
    replication streams without any shuffle."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])

    def replicate(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        bp = np.array([UPSAMPLE_EPOCHS_BP.get(s, _EPOCH_DEFAULT_BP)
                       for s in src], np.int64)
        k = upsample_copies(ids, bp)
        idx = np.repeat(np.arange(len(ids)), k)
        copy_idx = np.concatenate(
            [np.arange(n, dtype=np.int64) for n in k if n > 0]
        ) if len(idx) else np.array([], np.int64)
        return pd.DataFrame({"doc_id": ids[idx], "source": src[idx],
                             "copy_idx": copy_idx})

    return docs.map_batches(replicate, batch_format="pyarrow")


def q_source_upsample(sf_dir: str) -> rd.Dataset:
    """Gate summary of the replicated stream: per source, rows out and
    distinct docs kept — counted AFTER the repeat so the gate verifies
    the replication path itself, not just the formula."""
    rep = upsampled_docs(sf_dir)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", sort=False).agg(
            n_rows_out=("doc_id", "size"),
            n_docs_kept=("doc_id", "nunique")).reset_index()
        out["n_rows_out"] = out["n_rows_out"].astype(np.int64)
        out["n_docs_kept"] = out["n_docs_kept"].astype(np.int64)
        return out

    return bucketed_group_agg(rep, ["source"], agg, num_buckets=8)


# --------------------------------------------- per-source median filter
def above_median_docs(sf_dir: str, num_buckets: int = 8) -> pd.DataFrame:
    """Per-source median document length (THE shared discrete-quantile
    rank rule at pct=50) and the count of docs STRICTLY above it — the
    'keep the better half of each source' curation stat. Pass 1 reduces
    to (source, n_chars) histogram cells (bounded by sources × length
    domain — a documented small side) merged on the driver into a
    (source → median) dict; pass 2 streams the corpus once against the
    broadcast dict."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "n_chars"])

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        return (df.groupby(["source", "n_chars"], sort=False)
                .size().rename("n").reset_index())

    from ray.data.aggregate import Sum

    # per-batch partials merged by Ray's grouped aggregate, so the
    # driver sees at most |sources x length domain| rows, never
    # |blocks| x domain (the q_balanced_shards pattern)
    cells = (docs.map_batches(hist_partial, batch_format="pyarrow")
             .groupby(["source", "n_chars"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas()
             .sort_values(["source", "n_chars"])
             .reset_index(drop=True))
    pct = np.array([50], np.int64)
    rows = []
    for src, grp in cells.groupby("source", sort=True):
        med = quantile_rank_pick(grp["n_chars"].to_numpy(np.int64),
                                 grp["n"].to_numpy(np.int64), pct)[0]
        above = int(grp.loc[grp["n_chars"] > med, "n"].sum())
        rows.append((src, int(med), above, int(grp["n"].sum())))
    return pd.DataFrame(rows, columns=["source", "median_n_chars",
                                       "n_above", "n_total"]).astype(
        {"median_n_chars": np.int64, "n_above": np.int64,
         "n_total": np.int64})


def q_above_median_docs(sf_dir: str) -> pd.DataFrame:
    return above_median_docs(sf_dir)


# ------------------------------------------------------ tokenizer fertility
def q_token_fertility(sf_dir: str) -> rd.Dataset:
    """Per-language corpus 'fertility': docs, whitespace tokens, chars
    (the table's n_chars column), and integer tokens-per-1000-chars
    ``(1000·Σtokens) // Σchars`` — the cheap cross-language budget stat
    a tokenizer-aware sampler reads. Per-batch partial sums per lang →
    one tiny bucketed merge (langs × blocks rows)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["lang", "text", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "tok": pc.count_substring_regex(t["text"], r"\S+")
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "ch": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })
        out = df.groupby("lang", sort=False).agg(
            n_docs=("tok", "size"), n_tokens=("tok", "sum"),
            n_chars=("ch", "sum")).reset_index()
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("lang", sort=False).sum(numeric_only=True)
        out = out.reset_index()
        for c in ("n_docs", "n_tokens", "n_chars"):
            out[c] = out[c].astype(np.int64)
        out["tokens_per_kchar"] = (
            (1000 * out["n_tokens"]) // out["n_chars"]).astype(np.int64)
        return out

    return bucketed_group_agg(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"], merge, num_buckets=4)


# ------------------------------------------ curation → packing composition
def q_assembly_pipeline(sf_dir: str, cap: int = PACK_CAP_TOKENS,
                        num_buckets: int = 8,
                        quality_min_bp: int = 7500) -> rd.Dataset:
    """The end-to-end training-data ASSEMBLY: the full curation chain
    (benchmark exclusion → keep-first dedup → quality floor → language
    match → decontamination, ``text_pipelines.curation_doc_flags``)
    feeding concat-and-split packing of the SURVIVING docs — the
    composition a pretraining job actually runs between raw corpus and
    tokenizer. Output = per kept doc its packed ``chunk_id`` (chunk
    numbering restarts densely over kept docs only, so curation
    decisions visibly reshape the packing). One extra source-keyed
    shuffle on top of the curation chain; the SQL oracle composes the
    verified curation fragments with the packing window."""
    from .text_pipelines import curation_doc_flags

    flags = curation_doc_flags(sf_dir, quality_min_bp=quality_min_bp)

    def kept_only(b: pd.DataFrame) -> pd.DataFrame:
        keep = (~b["is_bench"] & b["is_first"] & b["ok_quality"]
                & b["ok_lang"] & b["ok_contam"])
        return b.loc[keep, ["doc_id", "source", "n_tokens"]]

    kept = flags.map_batches(kept_only, batch_format="pandas")
    from ..runtime import cluster_cpus

    # same narrow-rows coalesce as the flags' keep-first pass (PERF #26)
    return bucketed_group_agg(kept, ["source"],
                              lambda g: pack_assign(g, cap),
                              num_buckets=num_buckets,
                              coalesce_to=max(32, cluster_cpus()))


# ------------------------------------------------- deterministic split
# floor(0.8 * 2^32) and floor(0.9 * 2^32): the train/val boundary of the
# shared sampling hash. Stated as literals so the SQL oracle can restate
# them verbatim.
SPLIT_TRAIN_LT = 3435973836
SPLIT_VAL_LT = 3865470566


def q_dataset_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment (80/10/10 in
    expectation) by THE sampling hash on ``doc_id`` — the split every
    training run re-derives identically with no stored assignment
    table, stable under re-partitioning, appends, and re-runs (the
    property a 100 TB corpus needs: adding documents never moves an
    existing one across splits). One streamed pass assigns the label;
    the combine is Ray's native grouped aggregate (per-block partials
    merged distributedly), so at most 3·|langs| rows ever reach the
    driver. Extends the reference's ``instance_sample_rate`` Bernoulli
    skip (``src/experiment/SeparatedVarianceSelector.py:38``) from
    sample-vs-drop to a persistent multi-way partition."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])

    def assign(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        hv = sample_hash_values(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        split = np.where(hv < np.uint64(SPLIT_TRAIN_LT), "train",
                         np.where(hv < np.uint64(SPLIT_VAL_LT), "val",
                                  "test"))
        return pd.DataFrame({
            "split": split,
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
        })

    from ray.data.aggregate import Count, Sum

    out = (docs.map_batches(assign, batch_format="pyarrow")
           .groupby(["split", "lang"])
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_chars", alias_name="sum_chars"))
           .to_pandas()
           .sort_values(["split", "lang"]).reset_index(drop=True))
    return out.astype({"n_docs": np.int64, "sum_chars": np.int64})


# --------------------------------------------------- balanced sharding
BALANCED_NUM_SHARDS = 8


def q_balanced_shards(sf_dir: str,
                      num_shards: int = BALANCED_NUM_SHARDS,
                      num_buckets: int = 8) -> pd.DataFrame:
    """Snake-order balanced sharding: rank every document by
    (n_chars DESC, doc_id ASC) and deal ranks boustrophedon across
    ``num_shards`` output shards (rank p goes to shard p mod 2S if
    < S else 2S−1−(p mod 2S)) — the deterministic LPT-style writer
    assignment that keeps per-shard byte totals within one max-doc of
    each other without any coordinator state.

    Global rank without a global sort: pass 1 reduces to an
    ``n_chars`` histogram (bounded by the length domain, a documented
    small side) whose descending cumsum gives each length's rank
    OFFSET; pass 2 co-locates equal-length docs (hash(n_chars) % B
    bucketed shuffle), ranks within a length by ``doc_id`` order, and
    emits ≤ num_shards partial rows per group. Output = per-shard doc
    count and byte total (the balance evidence itself)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        ln = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(ln, return_counts=True)
        return pd.DataFrame({"n_chars": u, "n": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    # per-batch partials merged by Ray's grouped aggregate, so the
    # driver sees at most |length domain| rows, never |blocks| x domain
    cells = (docs.map_batches(hist_partial, batch_format="pyarrow")
             .groupby("n_chars").aggregate(Sum("n", alias_name="n"))
             .to_pandas()
             .groupby("n_chars", sort=True)["n"].sum())
    # rank offset of a length = count of strictly longer docs
    # (ascending-aligned arrays so the per-bucket kernel can look
    # offsets up with one vectorized searchsorted, no per-row dict)
    lens_asc = cells.index.to_numpy().astype(np.int64)
    counts_asc = cells.to_numpy().astype(np.int64)
    # suffix-sum EXCLUDING self = docs strictly longer than this length
    gt_counts_asc = (np.cumsum(counts_asc[::-1])[::-1] - counts_asc)

    two_s = 2 * num_shards

    def shard_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # the bucket holds MANY lengths (hash(n_chars) % B co-location);
        # within each length ranks are contiguous, so the shard COUNTS
        # depend only on (offset, group size) — any within-length order
        # yields the same multiset of ranks as the (DESC, doc_id) sort
        ln = g["n_chars"].to_numpy().astype(np.int64)
        local = g.groupby("n_chars", sort=False).cumcount().to_numpy()
        off = gt_counts_asc[np.searchsorted(lens_asc, ln)]
        rank0 = off + local
        p = rank0 % two_s
        shard = np.where(p < num_shards, p, two_s - 1 - p)
        part = (pd.DataFrame({"shard": shard, "sum_chars": ln})
                .groupby("shard", sort=False)
                .agg(n_docs=("sum_chars", "size"),
                     sum_chars=("sum_chars", "sum"))
                .reset_index())
        return part

    nn = docs.map_batches(lambda t: t.drop_null(), batch_format="pyarrow")
    partials = bucketed_group_agg(nn, ["n_chars"], shard_bucket,
                                  num_buckets=num_buckets).to_pandas()
    out = (partials.groupby("shard", sort=True)[["n_docs", "sum_chars"]]
           .sum().reset_index())
    return out.astype({"shard": np.int64, "n_docs": np.int64,
                       "sum_chars": np.int64})
