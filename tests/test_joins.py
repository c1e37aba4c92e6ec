"""Skew-salted join: row-identity with the plain join on a Zipf-skewed
key, hot-key detection, and the empty-hot-set fast path."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from associationabacminer_ray.pipelines.joins import (
    detect_hot_keys,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed_sides(ray_session):
    rng = np.random.default_rng(7)
    # Zipf head: key 1 takes ~half the fact rows
    keys = np.minimum(rng.zipf(1.3, size=40_000), 50).astype(np.int64)
    fact = pd.DataFrame({"k": keys,
                         "v": rng.integers(0, 100, size=keys.size)})
    dim = pd.DataFrame({"k": np.arange(1, 51, dtype=np.int64),
                        "name": [f"n{i}" for i in range(1, 51)]})
    left = rd.from_pandas(fact).repartition(8).materialize()
    right = rd.from_pandas(dim).repartition(2).materialize()
    return left, right, fact, dim


def _agg(df: pd.DataFrame) -> pd.DataFrame:
    out = (df.groupby("name", sort=True)
           .agg(n=("v", "size"), s=("v", "sum")).reset_index())
    out["n"] = out["n"].astype(np.int64)
    out["s"] = out["s"].astype(np.int64)
    return out


def test_salted_join_equals_plain_join(skewed_sides):
    left, right, fact, dim = skewed_sides
    hot = detect_hot_keys(left, "k", sample_frac=0.3, hot_fraction=0.02)
    assert 1 in hot  # the Zipf head must be detected
    joined = salted_join(left, right, on="k", hot_keys=hot,
                         num_salts=4).to_pandas()
    expected = fact.merge(dim, on="k", how="inner")
    assert _agg(joined).equals(_agg(expected))
    assert len(joined) == len(expected)


def test_salted_join_empty_hot_set(skewed_sides):
    left, right, fact, dim = skewed_sides
    joined = salted_join(left, right, on="k",
                         hot_keys=np.empty(0, dtype=np.int64),
                         num_salts=4).to_pandas()
    expected = fact.merge(dim, on="k", how="inner")
    assert _agg(joined).equals(_agg(expected))


def test_detect_hot_keys_threshold(skewed_sides):
    left, _, fact, _ = skewed_sides
    hot = detect_hot_keys(left, "k", sample_frac=0.5, hot_fraction=0.02)
    true_share = fact["k"].value_counts(normalize=True)
    # every detected key is genuinely ≥ half the threshold (sampling
    # noise allowance), and the true head keys are all present
    for k in hot:
        assert true_share[k] >= 0.01
    for k in true_share[true_share >= 0.04].index:
        assert k in hot
