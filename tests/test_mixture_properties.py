"""Hypothesis property tests for the mixture/robust-stats kernels —
the pure module-level functions every distributed wrapper delegates to
(partition layout cannot change what a pure kernel returns, so these
pin the kernel itself on adversarial inputs)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from associationabacminer_ray.pipelines.mixture import (
    pack_assign,
    upsample_copies,
)
from associationabacminer_ray.pipelines.temporal import quantile_rank_pick

docs = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),        # source
              st.integers(0, 10**6),                    # doc_id
              st.integers(0, 2000)),                    # n_tokens
    min_size=1, max_size=60, unique_by=lambda t: (t[0], t[1]))


@given(docs, st.integers(1, 600))
@settings(max_examples=60)
def test_pack_assign_matches_serial(rows, cap):
    g = pd.DataFrame(rows, columns=["source", "doc_id", "n_tokens"])
    out = pack_assign(g.sample(frac=1, random_state=0), cap)
    # serial recompute
    s = g.sort_values(["source", "doc_id"]).reset_index(drop=True)
    prev = (s.groupby("source")["n_tokens"].cumsum() - s["n_tokens"])
    want = (prev // cap).to_numpy(np.int64)
    got = (out.set_index(["source", "doc_id"])["chunk_id"]
           .loc[list(zip(s["source"], s["doc_id"]))].to_numpy(np.int64))
    assert (got == want).all()
    # chunk ids are non-decreasing within a source in doc_id order
    for _, grp in out.groupby("source"):
        grp = grp.sort_values("doc_id")
        assert (np.diff(grp["chunk_id"].to_numpy()) >= 0).all()
        assert grp["chunk_id"].iloc[0] == 0


@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=50),
       st.lists(st.integers(0, 40000), min_size=1, max_size=50))
@settings(max_examples=60)
def test_upsample_copies_bounds(ids, bps):
    n = min(len(ids), len(bps))
    ids_a = np.array(ids[:n], np.int64)
    bps_a = np.array(bps[:n], np.int64)
    k = upsample_copies(ids_a, bps_a)
    assert (k >= bps_a // 10000).all()
    assert (k <= bps_a // 10000 + 1).all()
    # whole epochs are exact: frac == 0 never adds the extra copy
    whole = bps_a % 10000 == 0
    assert (k[whole] == bps_a[whole] // 10000).all()
    # deterministic and independent of array context
    for i in range(n):
        ki = upsample_copies(ids_a[i:i + 1], bps_a[i:i + 1])[0]
        assert ki == k[i]


@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=80),
       st.lists(st.integers(0, 100), min_size=1, max_size=5))
@settings(max_examples=60)
def test_quantile_rank_pick_matches_sorted_index(values, pcts):
    vals, cnts = np.unique(np.array(values, np.int64), return_counts=True)
    pct_arr = np.array(sorted(set(pcts)), np.int64)
    got = quantile_rank_pick(vals, cnts.astype(np.int64), pct_arr)
    full = np.sort(np.array(values, np.int64))
    n = len(full)
    for p, g in zip(pct_arr, got):
        rank = int(np.floor(p / 100.0 * (n - 1))) + 1
        assert g == full[rank - 1]
