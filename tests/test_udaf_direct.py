"""Direct coverage for the remaining UDAF wrappers (CmsAgg, BloomAgg,
KllAgg grouped, SketchMergeAgg null handling)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from associationabacminer_ray.functions.hashing import hash_any
from associationabacminer_ray.sketches import Sketch
from associationabacminer_ray.udaf import BloomAgg, CmsAgg, KllAgg, SketchMergeAgg


@pytest.fixture(scope="module")
def hashed_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    keys = rng.integers(0, 500, size=20_000)
    df = pd.DataFrame({"key": keys, "group": keys % 3,
                       "value": rng.normal(0, 1, size=20_000)})
    df["key_hash"] = hash_any(df["key"].to_numpy())
    return rd.from_pandas(df), df


def test_cms_agg_global(hashed_ds):
    ds, df = hashed_ds
    out = ds.aggregate(CmsAgg("key_hash", width=1 << 12, depth=4, alias="blob"))
    cms = Sketch.from_bytes(bytes(out["blob"]))
    exact = df["key"].value_counts()
    for key in exact.index[:20]:
        est = cms.estimate_one(int(hash_any(np.array([key]))[0]))
        assert exact[key] <= est <= exact[key] + cms.epsilon * len(df)
    assert cms.total == len(df)


def test_bloom_agg_global(hashed_ds):
    ds, df = hashed_ds
    out = ds.aggregate(BloomAgg("key_hash", num_bits=1 << 16, alias="blob"))
    bloom = Sketch.from_bytes(bytes(out["blob"]))
    assert bloom.contains_hashed(hash_any(df["key"].unique())).all()
    absent = hash_any(np.arange(10_000, 10_200))
    assert bloom.contains_hashed(absent).mean() < 0.1


def test_kll_agg_grouped(hashed_ds):
    ds, df = hashed_ds
    out = ds.groupby("group").aggregate(
        KllAgg("value", finalize_quantiles=(0.5,), alias="q")).to_pandas()
    for _, row in out.iterrows():
        vals = np.sort(df.loc[df["group"] == row["group"], "value"].to_numpy())
        est = row["q"]["q0.5"]
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - 0.5) < 0.05


def test_sketch_merge_agg_skips_nulls(ray_session):
    import ray.data as rd

    from associationabacminer_ray.sketches import HyperLogLog

    h = HyperLogLog(p=10).update_hashed(hash_any(np.arange(100)))
    ds = rd.from_pandas(pd.DataFrame({"name": ["x", "x"],
                                      "blob": [h.to_bytes(), None]}))
    out = ds.groupby("name").aggregate(SketchMergeAgg("blob", alias="blob"))
    row = out.take_all()[0]
    back = Sketch.from_bytes(bytes(row["blob"]))
    assert back.to_bytes() == h.to_bytes()
