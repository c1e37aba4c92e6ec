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


def test_theta_agg_grouped_exact_regime(hashed_ds):
    """Grouped ThetaAgg through a real multi-block Ray shuffle: below
    capacity every per-group sketch is exact, and cross-group set
    algebra matches python sets (the q_audience_overlap contract)."""
    from associationabacminer_ray.udaf import ThetaAgg

    ds, df = hashed_ds
    out = (ds.repartition(8).groupby("group")
           .aggregate(ThetaAgg("key_hash", k=2048, alias="blob"))).to_pandas()
    sks = {g: Sketch.from_bytes(bytes(b))
           for g, b in zip(out["group"], out["blob"])}
    sets = {g: set(df.loc[df["group"] == g, "key"]) for g in sks}
    for g, sk in sks.items():
        assert sk.is_exact
        assert sk.estimate() == len(sets[g])
    # groups are key%3 → pairwise disjoint; union must be exact too
    assert sks[0].intersection_estimate(sks[1]) == 0
    assert sks[0].union_estimate(sks[1]) == len(sets[0] | sets[1])
    assert sks[0].difference_estimate(sks[1]) == len(sets[0])


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


class TestNullRobustness:
    def test_hll_agg_null_bearing_hash_block(self, ray_session):
        """One null in a uint64 hash column must not corrupt the other
        hashes (Arrow null -> float64 conversion hazard)."""
        import ray.data as rd

        big = np.array([2**63 + 12345, 2**64 - 99, 17], dtype=np.uint64)
        clean = rd.from_arrow(pa.table({"h": pa.array(big, pa.uint64())}))
        dirty = rd.from_arrow(pa.table(
            {"h": pa.array(list(big) + [None], pa.uint64())}))
        from associationabacminer_ray.udaf import HllAgg

        a = Sketch.from_bytes(bytes(clean.aggregate(
            HllAgg("h", emit_blob=True, alias="b"))["b"]))
        b = Sketch.from_bytes(bytes(dirty.aggregate(
            HllAgg("h", emit_blob=True, alias="b"))["b"]))
        assert a.to_bytes() == b.to_bytes()  # null contributed nothing

    def test_topk_agg_null_keys(self, ray_session):
        import ray.data as rd

        from associationabacminer_ray.udaf import TopKAgg

        ds = rd.from_pandas(pd.DataFrame({"k": ["a", None, "a", "b", None]}))
        out = ds.aggregate(TopKAgg("k", capacity=8, alias="blob"))
        sk = Sketch.from_bytes(bytes(out["blob"]))
        assert [(k, c) for k, c, _ in sk.top()] == [("a", 2), ("b", 1)]

    def test_hash_any_block_invariant_under_nulls(self):
        from associationabacminer_ray.functions.hashing import hash_any

        with_null = hash_any(pa.array([5, None, 7], pa.int64()))
        without = hash_any(pa.array([5, 7], pa.int64()))
        assert with_null[0] == without[0] and with_null[2] == without[1]
        # huge uint64 survives exactly
        h = 2**63 + 12345
        wn = hash_any(pa.array([h, None], pa.uint64()))
        wo = hash_any(pa.array([h], pa.uint64()))
        assert wn[0] == wo[0]

    def test_fractional_weights_rejected(self, ray_session):
        import ray.data as rd

        from associationabacminer_ray.udaf import TopKAgg

        ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b"], "w": [0.5, 0.7]}))
        with pytest.raises(Exception, match="fractional"):
            ds.aggregate(TopKAgg("k", weight_col="w", alias="blob"))


class TestSketchRobustness:
    def test_bloom_seed_range_and_validation(self):
        from associationabacminer_ray.sketches import BloomFilter

        for seed in (-1, 2**40):
            bf = BloomFilter(num_bits=256, num_hashes=2, seed=seed)
            assert Sketch.from_bytes(bf.to_bytes()).seed == seed
        with pytest.raises(ValueError):
            BloomFilter(num_hashes=0)

    def test_spacesaving_rejects_float_keys(self):
        from associationabacminer_ray.sketches import SpaceSaving

        with pytest.raises(TypeError, match="float keys"):
            SpaceSaving(8).update([2.5, 2.0], [10, 5])

    def test_tdigest_merge_does_not_mutate_operand(self):
        from associationabacminer_ray.sketches import TDigest

        rng = np.random.default_rng(3)
        a = TDigest(delta=100).update(rng.normal(0, 1, 5000))
        b = TDigest(delta=100).update(rng.normal(5, 1, 500))
        q_before = b.quantile(0.5)  # quantile compresses b itself
        state_before = (len(b._buf_vals), b.means.size, b.means.tobytes())
        a.merge(b)
        assert (len(b._buf_vals), b.means.size, b.means.tobytes()) == state_before
        assert b.quantile(0.5) == q_before
