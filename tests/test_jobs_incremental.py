"""Distributed greedy cover, config-grid job loop, incremental daily
sketch store (window = merge of dailies)."""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from associationabacminer_ray.functions.hashing import hash_strings
from associationabacminer_ray.pipelines.jobs import (
    Job,
    MiningConfig,
    generate_jobs,
    run_jobs,
)
from associationabacminer_ray.pipelines.rules import greedy_cover, greedy_cover_ray
from associationabacminer_ray.sources.transcripts import write_synth_transcripts


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return write_synth_transcripts(str(d), n_convs=1500, shards=4)


class TestGreedyCoverRay:
    def test_matches_driver_version(self, ray_session, corpus):
        import ray.data as rd

        from associationabacminer_ray.pipelines.itemsets import transactions

        tx_ds = transactions(rd.read_parquet(corpus), num_buckets=8)
        tx_df = tx_ds.to_pandas()
        want = greedy_cover(tx_df, metric="cscore", max_rounds=4,
                            coverage_target=0.99, min_support=2, use_bloom=True)
        got = greedy_cover_ray(tx_ds, metric="cscore", max_rounds=4,
                               coverage_target=0.99, min_support=2)
        pd.testing.assert_frame_equal(
            got[["round", "antecedent", "consequent", "support_ab"]],
            want[["round", "antecedent", "consequent", "support_ab"]],
        )
        assert (got["covered_this_round"] == want["covered_this_round"]).all()

    def test_sketch_mode_matches_exact_at_small_scale(self, ray_session, corpus):
        """mode='sketch' swaps the per-round (itemset,count) shuffle for
        fixed CMS/top-k blobs; at this scale the space-saving head is
        exact, so round-by-round selections must match the exact mode."""
        import ray.data as rd

        from associationabacminer_ray.pipelines.itemsets import transactions

        tx_ds = transactions(rd.read_parquet(corpus), num_buckets=8)
        exact = greedy_cover_ray(tx_ds, metric="cscore", max_rounds=3,
                                 coverage_target=0.99, min_support=2)
        sketch = greedy_cover_ray(tx_ds, metric="cscore", max_rounds=3,
                                  coverage_target=0.99, min_support=2,
                                  mode="sketch")
        pd.testing.assert_frame_equal(
            sketch[["round", "antecedent", "consequent", "support_ab",
                    "covered_this_round"]],
            exact[["round", "antecedent", "consequent", "support_ab",
                   "covered_this_round"]],
        )


class TestJobs:
    def test_generate_jobs_grid(self):
        jobs = generate_jobs(datetime(2024, 1, 1), datetime(2024, 2, 10),
                             grid={"min_support": [2, 3]})
        hashes = {j.config.hash for j in jobs}
        assert len(hashes) == 2
        # same window count per config
        by_cfg = {}
        for j in jobs:
            by_cfg.setdefault(j.config.hash, []).append(j.window.window_id)
        lens = {len(v) for v in by_cfg.values()}
        assert len(lens) == 1 and lens.pop() > 0
        # job ids unique
        assert len({j.job_id for j in jobs}) == len(jobs)

    def test_run_jobs_idempotent_skip(self, ray_session, corpus, tmp_path):
        jobs = generate_jobs(datetime(2024, 1, 1), datetime(2024, 1, 25),
                             grid={})[:2]
        res_dir = str(tmp_path / "scores")
        import os

        os.makedirs(res_dir)
        first = run_jobs(corpus, jobs, results_dir=res_dir)
        assert len(first) == 2
        assert {"precision", "recall", "config_hash", "job_id"} <= set(first.columns)
        # second run loads from disk (mutate files to prove no recompute)
        marker = first.copy()
        marker["precision"] = -1.0
        for _, row in marker.iterrows():
            pd.DataFrame([row.to_dict()]).to_parquet(
                f"{res_dir}/{row['job_id']}.parquet", index=False)
        second = run_jobs(corpus, jobs, results_dir=res_dir)
        assert (second["precision"] == -1.0).all()

    def test_distributed_job_matches_pandas_parity(self, ray_session, corpus):
        """The distributed run_one_job (mine_window + score_policy_ray,
        VERDICT r3 #1) must reproduce the pandas path's scores
        row-for-row — identical integer confusion counts, so identical
        float metrics (shared _confusion_metrics closure)."""
        from associationabacminer_ray.pipelines.jobs import run_one_job

        jobs = generate_jobs(datetime(2024, 1, 1), datetime(2024, 1, 25),
                             grid={"min_support": [2, 3]})[:3]
        for job in jobs:
            got = run_one_job(corpus, job, distributed=True)
            want = run_one_job(corpus, job, distributed=False)
            assert got == want, f"job {job.job_id}: {got} != {want}"

    def test_aggregate_scores_by_config(self, ray_session, corpus):
        from associationabacminer_ray.pipelines.evaluate import aggregate_scores

        jobs = generate_jobs(datetime(2024, 1, 1), datetime(2024, 2, 1),
                             grid={})[:3]
        scores = run_jobs(corpus, jobs)
        agg = aggregate_scores(scores)
        assert len(agg) == 1  # single config
        assert 0 <= agg["recall"].iloc[0] <= 1


class TestIncrementalDailyStore:
    def test_window_merge_equals_direct(self, ray_session, corpus, tmp_path):
        from associationabacminer_ray.functions.windows import WindowSpec, read_window
        from associationabacminer_ray.pipelines.itemsets import (
            sketched_itemset_supports,
        )
        from associationabacminer_ray.state.incremental import DailySketchStore

        store = DailySketchStore(str(tmp_path / "daily"))
        start, end = datetime(2024, 1, 3), datetime(2024, 1, 8)
        built = store.ensure_days(corpus, start, end)
        assert built == 5
        # resume: nothing rebuilt
        assert store.ensure_days(corpus, start, end) == 0

        merged = store.window_sketches(start, end)
        spec = WindowSpec(start, end, end, end)
        from associationabacminer_ray.state.incremental import add_conv_day

        direct_ds = read_window(corpus, spec, "obs",
                                columns=["conv_id", "role", "tool", "ts"])
        direct = sketched_itemset_supports(
            direct_ds.map_batches(add_conv_day, batch_format="pandas"),
            conv_col="conv_day", max_k=2, num_buckets=16)
        # under the (conv, day) transaction unit, CMS/HLL merges are
        # lossless → dailies == direct, bit for bit
        assert merged["cms"].to_bytes() == direct["cms"].to_bytes()
        assert merged["hll"].to_bytes() == direct["hll"].to_bytes()
        # support estimates agree
        head = direct["topk"].top(1)[0][0]
        assert store.estimate_support(merged, head) == direct["cms"].estimate_one(
            int(hash_strings(np.array([head], dtype=object))[0]))

    def test_missing_day_raises(self, tmp_path):
        from associationabacminer_ray.state.incremental import DailySketchStore

        store = DailySketchStore(str(tmp_path / "d2"))
        with pytest.raises(KeyError, match="not built"):
            store.window_sketches(datetime(2024, 1, 1), datetime(2024, 1, 2))
