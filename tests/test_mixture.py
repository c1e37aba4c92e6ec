"""Mixture-wave operators: brute-force parity and partition
invariance (the gate checks SQL parity; these pin the distributed
layout — bucket counts and block splits must not change results)."""

import numpy as np
import pandas as pd
import pytest

from associationabacminer_ray.pipelines import mixture as mx
from associationabacminer_ray.pipelines.analytics import sample_hash_values


def _docs_df(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


def test_packed_chunks_bucket_invariance(ray_session, sf_dir):
    a = _norm(mx.packed_chunks(sf_dir, num_buckets=1).to_pandas())
    b = _norm(mx.packed_chunks(sf_dir, num_buckets=16).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_packed_chunks_matches_serial_cumsum(ray_session, sf_dir):
    got = mx.packed_chunks(sf_dir).to_pandas()
    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "source", "text"])
    docs["n_tokens"] = docs["text"].str.count(r"\S+")
    docs = docs.sort_values(["source", "doc_id"])
    prev = (docs.groupby("source")["n_tokens"].cumsum()
            - docs["n_tokens"])
    want = pd.DataFrame({
        "doc_id": docs["doc_id"].astype(np.int64),
        "source": docs["source"],
        "n_tokens": docs["n_tokens"].astype(np.int64),
        "chunk_id": (prev // mx.PACK_CAP_TOKENS).astype(np.int64),
    })
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # chunk ids per source are contiguous from 0 (no gaps: every chunk
    # boundary is crossed by some doc's first token or spanned run)
    for _, g in got.groupby("source"):
        ids = np.sort(g["chunk_id"].unique())
        assert ids[0] == 0
        # gaps only where one doc spans >1 full cap — allowed; but
        # chunk_id must never exceed total_tokens // cap
        total = g["n_tokens"].sum()
        assert ids[-1] <= total // mx.PACK_CAP_TOKENS


def test_mixture_sample_quota_and_invariance(ray_session, sf_dir):
    got = mx.mixture_sample(sf_dir, num_buckets=1).to_pandas()
    got16 = mx.mixture_sample(sf_dir, num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(got16))

    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "source"])
    quotas = mx.mixture_quotas()
    per_source = docs.groupby("source").size()
    counts = got.groupby("source").size()
    for src, q in quotas.items():
        avail = int(per_source.get(src, 0))
        assert int(counts.get(src, 0)) == min(q, avail)
    # exact membership: the q smallest (hash, doc_id) per source
    docs = docs.assign(
        h=sample_hash_values(docs["doc_id"].to_numpy(np.int64)))
    want_rows = []
    for src, g in docs.groupby("source"):
        q = quotas.get(src, 0)
        if q <= 0:
            continue
        g = g.sort_values(["h", "doc_id"]).head(q)
        want_rows.append(g[["source", "doc_id"]])
    want = pd.concat(want_rows, ignore_index=True)
    want["doc_id"] = want["doc_id"].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_upsample_copies_formula_and_stream(ray_session, sf_dir):
    docs = _docs_df(sf_dir).dropna(subset=["doc_id", "source"])
    ids = docs["doc_id"].to_numpy(np.int64)
    bp = docs["source"].map(
        lambda s: mx.UPSAMPLE_EPOCHS_BP.get(s, 10000)).to_numpy(np.int64)
    k = mx.upsample_copies(ids, bp)
    # integer epochs are a floor; fractional part adds at most 1
    assert ((k >= bp // 10000) & (k <= bp // 10000 + 1)).all()
    # deterministic
    assert (k == mx.upsample_copies(ids, bp)).all()

    rep = mx.upsampled_docs(sf_dir).to_pandas()
    per_doc = rep.groupby("doc_id").size()
    want = pd.Series(k, index=ids)
    want = want[want > 0]
    pd.testing.assert_series_equal(
        per_doc.sort_index(), want.sort_index(), check_names=False)
    # copy_idx is 0..k-1 per doc
    mx_idx = rep.groupby("doc_id")["copy_idx"].agg(["min", "max", "size"])
    assert (mx_idx["min"] == 0).all()
    assert (mx_idx["max"] == mx_idx["size"] - 1).all()

    summary = mx.q_source_upsample(sf_dir).to_pandas()
    direct = pd.DataFrame({"source": docs["source"].to_numpy(),
                           "k": k, "doc_id": ids})
    want_sum = direct.groupby("source").agg(
        n_rows_out=("k", "sum"),
        n_docs_kept=("k", lambda s: int((s > 0).sum()))).reset_index()
    want_sum = want_sum[want_sum["n_rows_out"] > 0]
    pd.testing.assert_frame_equal(
        _norm(summary), _norm(want_sum.astype(
            {"n_rows_out": np.int64, "n_docs_kept": np.int64})))


def test_above_median_docs_direct(ray_session, sf_dir):
    got = mx.above_median_docs(sf_dir)
    docs = _docs_df(sf_dir).dropna(subset=["source", "n_chars"])
    rows = []
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        med = v[int(np.floor(50 / 100.0 * (n - 1)))]
        rows.append((src, med, int((v > med).sum()), n))
    want = pd.DataFrame(rows, columns=["source", "median_n_chars",
                                       "n_above", "n_total"]).astype(
        {"median_n_chars": np.int64, "n_above": np.int64,
         "n_total": np.int64})
    pd.testing.assert_frame_equal(_norm(got), _norm(want))
    # strictly-above count is below half by construction of the median
    assert (got["n_above"] * 2 <= got["n_total"]).all()


def test_token_fertility_direct(ray_session, sf_dir):
    got = mx.q_token_fertility(sf_dir).to_pandas()
    docs = _docs_df(sf_dir).dropna(subset=["lang", "text", "n_chars"])
    docs["tok"] = docs["text"].str.count(r"\S+")
    want = docs.groupby("lang").agg(
        n_docs=("tok", "size"), n_tokens=("tok", "sum"),
        n_chars=("n_chars", "sum")).reset_index()
    want["tokens_per_kchar"] = (
        (1000 * want["n_tokens"]) // want["n_chars"])
    for c in ("n_docs", "n_tokens", "n_chars", "tokens_per_kchar"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_assembly_matches_curation_counts(ray_session, sf_dir):
    from associationabacminer_ray.pipelines.text_pipelines import (
        q_curation_pipeline,
    )

    asm = mx.q_assembly_pipeline(sf_dir).to_pandas()
    cur = q_curation_pipeline(sf_dir)
    # one packed row per kept doc, per source
    got = asm.groupby("source").size().sort_index()
    want = cur.set_index("source")["n_kept"]
    want = want[want > 0].sort_index()
    pd.testing.assert_series_equal(got, want, check_names=False)
    # packing invariants on the kept stream: chunk ids start at 0 and
    # are bounded by total tokens // cap per source
    for src, g in asm.groupby("source"):
        ids = np.sort(g["chunk_id"].unique())
        assert ids[0] == 0
        assert ids[-1] <= g["n_tokens"].sum() // mx.PACK_CAP_TOKENS
    # kept docs are never benchmark docs
    assert (asm["doc_id"] % 50 != 7).all()
