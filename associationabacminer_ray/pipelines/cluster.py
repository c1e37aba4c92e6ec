"""Distributed k-means over the embeddings table — the iterative-ML
operator family (fixed-iteration Lloyd's), built so every step is
merge-order- and partition-independent:

- coordinates fold ONCE to integer basis points (the shared gate
  convention), so squared distances are exact int64 and argmin ties
  break deterministically on the lowest cluster id;
- per-iteration statistics are integer sums (k×d cells per block) —
  associative, so the reduce is exact regardless of block layout;
- centroids re-fold to integer bp before the next assignment pass,
  keeping every comparison integral end to end.

Result: bit-identical output at any ``num_cpus`` — validated the same
way as the other pinned goldens (``scripts/pin_goldens.py`` runs each
pin at 4, 8 and 32 CPUs).

The reference's analog is the seeded driver-side k-means used for IVF
codebooks (``pipelines/ann._kmeans_lite``, itself the scale-path
replacement for ``src/experiment/PFA.py``'s sklearn KMeans); this one
never materializes the table — the driver touches only (k × d)-cell
integer partials per block and the k seed rows.

Scale: one pass per iteration, each a streaming ``map_batches``; the
driver-side reduce is O(blocks · k · d) integers. Init gathers the k
seed embeddings by (hash, vec_id) order with per-batch top-k pruning —
no full-column materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import hash_ints

K_CLUSTERS = 8
N_ITERS = 5
BP = 10000


def _fold_bp_mat(emb_col) -> np.ndarray:
    """list<float> column -> (n, d) int64 basis-point matrix (the
    shared floor(x*10000+0.5) fold). Zero-copy flatten when the lists
    are null-free (the embeddings contract)."""
    if isinstance(emb_col, pa.ChunkedArray):
        emb_col = emb_col.combine_chunks()
    n = len(emb_col)
    flat = emb_col.flatten().to_numpy(zero_copy_only=False)
    arr = flat.astype(np.float64).reshape(n, -1)
    return np.floor(arr * BP + 0.5).astype(np.int64)


def _seed_rows(ds: rd.Dataset, k: int) -> np.ndarray:
    """The k rows with the smallest (hash64(vec_id), vec_id) — a
    deterministic, data-independent-of-layout sample. Each batch
    prunes to its own k candidates first."""

    def per_batch(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t["vec_id"]))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        h = hash_ints(ids)
        order = np.lexsort((ids, h))[:k]
        mat = _fold_bp_mat(t["embedding"].take(pa.array(order)))
        out = pd.DataFrame({"h": h[order], "vec_id": ids[order]})
        out["coords"] = list(mat)
        return out

    cand = ds.map_batches(per_batch, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["h", "vec_id"], kind="mergesort").head(k)
    return np.stack(cand["coords"].to_numpy())  # (k, d) int64


class _AssignStats:
    """One assignment pass: exact-integer argmin against the broadcast
    bp centroids, emitting the batch's (cluster, count, per-dim sum)
    partial — k×d cells, never rows."""

    def __init__(self, cent_ref):
        self._cent = ray.get(cent_ref)  # (k, d) int64

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        c = self._cent
        if t.num_rows == 0:  # empty block: a zero partial, not a crash
            k, d = c.shape
            out = pd.DataFrame({"cluster_id": np.arange(k, dtype=np.int64),
                                "n": np.zeros(k, np.int64)})
            out["sums"] = list(np.zeros((k, d), np.int64))
            return out
        x = _fold_bp_mat(t["embedding"])  # (n, d) int64
        # exact int64 squared distances; ||x||² is constant per row so
        # argmin needs only -2x·c + ||c||² (stays far from overflow:
        # |x|,|c| <= ~3e4 bp, d=64 -> |2x·c| <= 2.5e14)
        cross = x @ c.T  # int64 exact
        d2 = (c * c).sum(axis=1)[None, :] - 2 * cross
        assign = np.argmin(d2, axis=1)  # ties -> lowest cluster id
        k, d = c.shape
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, assign, x)
        out = pd.DataFrame({"cluster_id": np.arange(k, dtype=np.int64),
                            "n": cnt})
        out["sums"] = list(sums)
        return out

    @staticmethod
    def reduce(parts: pd.DataFrame, k: int, d: int):
        cnt = np.zeros(k, np.int64)
        sums = np.zeros((k, d), np.int64)
        for _, row in parts.iterrows():
            cnt[row["cluster_id"]] += row["n"]
            sums[row["cluster_id"]] += row["sums"]
        return cnt, sums


def kmeans_embeddings(sf_dir: str, k: int = K_CLUSTERS,
                      iters: int = N_ITERS) -> pd.DataFrame:
    """Returns the long-format result: one row per (cluster_id, dim)
    with the final centroid coordinate in bp plus the cluster size —
    all integers, partition-independent."""
    from ..runtime import auto_concurrency

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = _seed_rows(ds, k)  # (k, d) int64 bp
    k = cent.shape[0]  # fewer rows than k -> one cluster per row
    d = cent.shape[1]

    for _ in range(iters):
        parts = ds.map_batches(
            _AssignStats, batch_format="pyarrow",
            fn_constructor_args=(ray.put(cent),),
            concurrency=auto_concurrency()).to_pandas()
        cnt, sums = _AssignStats.reduce(parts, k, d)
        # empty cluster keeps its previous centroid (pinned rule)
        nz = cnt > 0
        new = cent.copy()
        # int sums / int count -> float64 mean, re-folded to bp so the
        # next pass compares integers again (deterministic)
        new[nz] = np.floor(sums[nz] / cnt[nz, None] + 0.5).astype(np.int64)
        cent = new

    # final sizes under the final centroids
    parts = ds.map_batches(
        _AssignStats, batch_format="pyarrow",
        fn_constructor_args=(ray.put(cent),),
        concurrency=auto_concurrency()).to_pandas()
    cnt, _ = _AssignStats.reduce(parts, k, d)

    out = pd.DataFrame({
        "cluster_id": np.repeat(np.arange(k, dtype=np.int64), d),
        "dim": np.tile(np.arange(d, dtype=np.int64), k),
        "centroid_bp": cent.reshape(-1),
        "n_points": np.repeat(cnt, d),
    })
    return out


def q_kmeans_centroids(sf_dir: str) -> pd.DataFrame:
    return kmeans_embeddings(sf_dir)


# ----------------------------------------------------- vector aggregate
def label_centroids(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Per-label embedding centroid — the exact vector AGGREGATE twin
    of the k-means loop (one pass, no iteration): per batch an int64
    (label × d) bp-sum matrix + counts, one label-bucketed merge, then
    the trunc-division centroid. All integers, so it carries a DERIVED
    SQL oracle (DuckDB list indexing × a dims series), unlike the
    pinned iterative k-means. Shuffle volume: |labels| × d cells per
    block — never vectors."""
    from ..functions.hashing import hash_ints

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.drop_null()
        if t.num_rows == 0:  # all-null block: typed empty partial
            return pd.DataFrame({"label": np.array([], np.int64),
                                 "dim": np.array([], np.int64),
                                 "s": np.array([], np.int64),
                                 "n": np.array([], np.int64),
                                 "bucket": np.array([], np.int32)})
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _fold_bp_mat(t["embedding"])  # (n, d) int64
        uniq, inv = np.unique(labels, return_inverse=True)
        d = x.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, x)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        out = pd.DataFrame({
            "label": np.repeat(uniq, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(uniq)),
            "s": sums.reshape(-1),
            "n": np.repeat(cnt, d),
        })
        out["bucket"] = (hash_ints(out["label"]) %
                         np.uint64(num_buckets)).astype(np.int32)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = (g.groupby(["label", "dim"], sort=False)[["s", "n"]]
              .sum().reset_index())
        out = pd.DataFrame({
            "label": gg["label"].to_numpy(np.int64),
            "dim": gg["dim"].to_numpy(np.int64),
            "sum_bp": gg["s"].to_numpy(np.int64),
            "n_vecs": gg["n"].to_numpy(np.int64),
        })
        # trunc integer division (DuckDB // on positives; numpy
        # floor_divide differs on negative sums, so pin trunc here)
        q = np.abs(out["sum_bp"]) // out["n_vecs"]
        out["centroid_bp"] = np.sign(out["sum_bp"]) * q
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: merge(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def q_label_centroids(sf_dir: str) -> rd.Dataset:
    return label_centroids(sf_dir)
