"""Round-4 late wave: deterministic dataset split, snake-balanced
sharding, per-language quantile-threshold filtering — brute-force
parity against a driver-side pandas derivation plus the distributed-
layout invariances the gate can't see (bucket counts must not change
results)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from associationabacminer_ray.pipelines import mixture as mx
from associationabacminer_ray.pipelines import text_pipelines as tp
from associationabacminer_ray.pipelines.analytics import sample_hash_values


def _docs_df(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def test_dataset_split_direct(ray_session, sf_dir):
    got = mx.q_dataset_split(sf_dir)
    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "lang", "n_chars"])
    hv = sample_hash_values(docs["doc_id"].to_numpy(np.int64))
    docs = docs.assign(split=np.where(
        hv < np.uint64(mx.SPLIT_TRAIN_LT), "train",
        np.where(hv < np.uint64(mx.SPLIT_VAL_LT), "val", "test")))
    want = (docs.groupby(["split", "lang"])
            .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
            .astype({"n_docs": np.int64, "sum_chars": np.int64}))
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # the three splits partition the corpus exactly
    assert got["n_docs"].sum() == len(docs)
    # expectation check: train carries the (large) majority
    by_split = got.groupby("split")["n_docs"].sum()
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_dataset_split_stable_under_appends(sf_dir):
    # the split of an existing doc never depends on the rest of the
    # corpus: pure function of doc_id (the 100 TB re-run property)
    ids = np.arange(1, 10_001, dtype=np.int64)
    h1 = sample_hash_values(ids)
    h2 = sample_hash_values(np.concatenate([ids, ids + 10_000]))[:10_000]
    assert (h1 == h2).all()


def test_balanced_shards_direct_and_bucket_invariance(ray_session, sf_dir):
    got = mx.q_balanced_shards(sf_dir)
    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "n_chars"])
    docs = docs.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True]).reset_index(drop=True)
    rank0 = np.arange(len(docs), dtype=np.int64)
    p = rank0 % 16
    docs = docs.assign(shard=np.where(p < 8, p, 15 - p))
    want = (docs.groupby("shard")
            .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
            .astype({"shard": np.int64, "n_docs": np.int64,
                     "sum_chars": np.int64}))
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # layout invariance: bucket count must not change the assignment
    alt = mx.q_balanced_shards(sf_dir, num_buckets=1)
    pd.testing.assert_frame_equal(_norm(got), _norm(alt))
    # balance: snake dealing of a descending sequence keeps shard doc
    # counts within 2 of each other
    assert got["n_docs"].max() - got["n_docs"].min() <= 2


def test_quality_topfrac_direct(ray_session, sf_dir):
    got = _norm(tp.q_quality_topfrac(sf_dir).to_pandas())
    # brute force from the already-gate-verified per-doc scores
    scored = tp.q_quality_scores(sf_dir).to_pandas()[["doc_id", "quality_bp"]]
    docs = _docs_df(sf_dir)[["doc_id", "lang"]]
    q = scored.merge(docs, on="doc_id")
    kept = []
    for lang, g in q.groupby("lang"):
        g = g.sort_values(["quality_bp", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
        k = len(g) // tp.QUALITY_TOPFRAC_DEN
        if k == 0:
            continue
        thr = int(g.loc[k - 1, "quality_bp"])
        kept.append(g.loc[g["quality_bp"] > thr,
                          ["doc_id", "lang", "quality_bp"]])
    want = _norm(pd.concat(kept, ignore_index=True).astype(
        {"doc_id": np.int64, "quality_bp": np.int64}))
    pd.testing.assert_frame_equal(got, want)
    # strict-greater keep can never exceed the quota
    n_lang = q.groupby("lang").size()
    n_kept = got.groupby("lang").size()
    for lang, n in n_kept.items():
        assert n <= n_lang[lang] // tp.QUALITY_TOPFRAC_DEN


def test_semantic_neardup_direct(ray_session, sf_dir):
    from associationabacminer_ray.pipelines import ann

    got = ann.q_semantic_neardup(sf_dir)
    # brute force: same integer arithmetic, plain numpy over the table
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.floor(np.stack(emb["embedding"].to_numpy()) * 1000 + 0.5).astype(
        np.int64)
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    rows = []
    for lab in np.unique(labs):
        m = labs == lab
        sub_ids, sub = ids[m], X[m]
        o = np.argsort(sub_ids)
        sub_ids, sub = sub_ids[o], sub[o]
        dot = sub @ sub.T
        n2 = np.einsum("ij,ij->i", sub, sub)
        keep = (dot > 0) & (100 * dot * dot >= 9 * np.outer(n2, n2))
        ia, ib = np.nonzero(np.triu(keep, 1))
        for a, b in zip(ia, ib):
            d = int(dot[a, b])
            rows.append((int(sub_ids[a]), int(sub_ids[b]), int(lab),
                         (10_000 * d * d) // int(n2[a] * n2[b])))
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "label", "cos2_bp"])
    want = want.sort_values(["id_a", "id_b"]).reset_index(drop=True).astype(
        np.int64)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0  # threshold chosen so natural pairs exist
    # layout invariance
    alt = ann.q_semantic_neardup(sf_dir, num_buckets=1)
    pd.testing.assert_frame_equal(got, alt)
    # cluster scoping: a pair never crosses labels
    assert (got["id_a"] != got["id_b"]).all()


def test_semantic_canonical_props(ray_session, sf_dir):
    from associationabacminer_ray.pipelines import ann

    pairs = ann.q_semantic_neardup(sf_dir)
    got = ann.q_semantic_canonical(sf_dir)
    # union-find reference over the verified pair set
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    want = pd.DataFrame({"vec_id": nodes,
                         "canonical_id": [find(n) for n in nodes]}).astype(
        np.int64)
    pd.testing.assert_frame_equal(got, want)
    # canonical is always a member of its own component and the min id
    assert (got["canonical_id"] <= got["vec_id"]).all()
    assert set(got["canonical_id"]) <= set(got["vec_id"])


def test_split_leakage_direct(ray_session, sf_dir):
    import re

    got = tp.q_split_leakage(sf_dir)
    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "text"])
    hv = sample_hash_values(docs["doc_id"].to_numpy(np.int64))
    W = 8
    wins = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = re.findall(r"\S+", text)
        wins[int(doc_id)] = {" ".join(toks[i:i + W])
                             for i in range(len(toks) - W + 1)}
    train_ids = docs["doc_id"].to_numpy(np.int64)[hv < np.uint64(mx.SPLIT_TRAIN_LT)]
    test_ids = docs["doc_id"].to_numpy(np.int64)[hv >= np.uint64(mx.SPLIT_VAL_LT)]
    train_wins = set().union(*(wins[int(d)] for d in train_ids)) if len(
        train_ids) else set()
    rows = [(int(d), len(wins[int(d)] & train_wins)) for d in sorted(test_ids)
            if wins[int(d)] & train_wins]
    want = pd.DataFrame(rows, columns=["test_doc_id", "leak_windows"]).astype(
        np.int64)
    if want.empty:
        assert got.empty
    else:
        pd.testing.assert_frame_equal(got, want)
    # bucket-count invariance
    alt = tp.q_split_leakage(sf_dir, num_buckets=4)
    pd.testing.assert_frame_equal(got, alt)
