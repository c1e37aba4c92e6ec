"""Checkpoint/lineage + resume (FIXTURES §F5): resume-equals-fresh."""

import os

import numpy as np
import pytest

from associationabacminer_ray.functions.hashing import hash_ints
from associationabacminer_ray.pipelines.itemsets import (
    sketched_itemset_supports_checkpointed,
)
from associationabacminer_ray.sketches import CountMinSketch, HyperLogLog
from associationabacminer_ray.sources.transcripts import write_synth_transcripts
from associationabacminer_ray.state.checkpoint import (
    completed_partitions,
    config_hash,
    run_with_checkpoint,
    write_partition,
)


def _local_compute(pid: int, path: str):
    # deterministic fake partition: sketches over pid-derived keys
    h = hash_ints(np.arange(pid * 1000, pid * 1000 + 500))
    return ({"cms": CountMinSketch(width=256, depth=3).update_hashed(h),
             "hll": HyperLogLog(p=10).update_hashed(h)}, 500)


class TestRunWithCheckpoint:
    def test_fresh_run_writes_all_partitions(self, tmp_path):
        files = [f"shard{i}" for i in range(6)]
        cfg = {"v": 1}
        merged = run_with_checkpoint(files, str(tmp_path), _local_compute, cfg)
        assert set(completed_partitions(str(tmp_path), config_hash(cfg))) == set(range(6))
        assert merged["hll"].estimate() == pytest.approx(3000, rel=0.05)

    def test_resume_equals_fresh_bit_for_bit(self, tmp_path):
        files = [f"shard{i}" for i in range(6)]
        cfg = {"v": 1}
        fresh = run_with_checkpoint(files, str(tmp_path / "fresh"), _local_compute, cfg)

        # simulate a kill after 3 partitions: precompute only 0..2
        part_dir = str(tmp_path / "resume")
        ch = config_hash(cfg)
        for pid in range(3):
            sketches, n = _local_compute(pid, files[pid])
            write_partition(part_dir, pid, sketches, [files[pid]], n, ch)
        calls = []

        def tracking_compute(pid, path):
            calls.append(pid)
            return _local_compute(pid, path)

        resumed = run_with_checkpoint(files, part_dir, tracking_compute, cfg)
        assert calls == [3, 4, 5]  # finished partitions were NOT recomputed
        assert resumed["cms"].to_bytes() == fresh["cms"].to_bytes()
        assert resumed["hll"].to_bytes() == fresh["hll"].to_bytes()

    def test_config_change_invalidates(self, tmp_path):
        files = ["a", "b"]
        run_with_checkpoint(files, str(tmp_path), _local_compute, {"v": 1})
        calls = []

        def tracking_compute(pid, path):
            calls.append(pid)
            return _local_compute(pid, path)

        run_with_checkpoint(files, str(tmp_path), tracking_compute, {"v": 2})
        assert calls == [0, 1]  # all recomputed under the new config

    def test_partial_tmp_file_not_trusted(self, tmp_path):
        files = ["a", "b"]
        cfg = {"v": 1}
        # a stray tmp file (killed mid-write) must be ignored
        os.makedirs(tmp_path, exist_ok=True)
        (tmp_path / "part-00000.parquet.tmp").write_bytes(b"garbage")
        merged = run_with_checkpoint(files, str(tmp_path), _local_compute, cfg)
        assert merged["hll"].estimate() > 0


class TestRaySketchCheckpoint:
    def test_resume_equals_fresh_on_ray_pipeline(self, ray_session, tmp_path):
        paths = write_synth_transcripts(str(tmp_path / "corpus"), n_convs=1200,
                                        shards=4)
        fresh = sketched_itemset_supports_checkpointed(
            paths, str(tmp_path / "ck1"), num_buckets=8)

        # "kill" after 2 shards: run only those, then resume over all 4
        sketched_itemset_supports_checkpointed(
            paths[:2], str(tmp_path / "ck2"), num_buckets=8)
        resumed = sketched_itemset_supports_checkpointed(
            paths, str(tmp_path / "ck2"), num_buckets=8)

        assert resumed["cms"].to_bytes() == fresh["cms"].to_bytes()
        assert resumed["hll"].to_bytes() == fresh["hll"].to_bytes()
        assert [k for k, _, _ in resumed["topk"].top(10)] == [
            k for k, _, _ in fresh["topk"].top(10)]


def test_resume_lineage_guard_reordered_files(tmp_path):
    """A reordered/extended input list must not let a positional pid match
    absorb another shard's blobs (lineage validation)."""
    files = ["A", "B"]
    cfg = {"v": 1}
    run_with_checkpoint(files, str(tmp_path), _lineage_compute, cfg)
    calls = []

    def tracking(pid, path):
        calls.append(path)
        return _lineage_compute(pid, path)

    # new shard C prepended: pids shift, stored lineage mismatches
    out = run_with_checkpoint(["C", "A", "B"], str(tmp_path), tracking, cfg)
    assert calls == ["C", "A", "B"]  # everything recomputed, nothing absorbed wrongly
    fresh = run_with_checkpoint(["C", "A", "B"], str(tmp_path / "f"),
                                _lineage_compute, cfg)
    assert out["hll"].to_bytes() == fresh["hll"].to_bytes()


def _lineage_compute(pid, path):
    h = hash_ints(np.arange(hash(path) % 50 + pid * 100, hash(path) % 50 + pid * 100 + 60))
    return ({"hll": HyperLogLog(p=10).update_hashed(h)}, 60)


def test_checkpoint_metrics_ledger(tmp_path):
    """The per-partition metrics reader (north-rule 'lineage + metrics'):
    one row per partition with row_count and recorded wall_s; a
    pre-wall_s checkpoint file reads as wall_s = -1, not an error."""
    from associationabacminer_ray.state.checkpoint import checkpoint_metrics

    files = [f"shard{i}" for i in range(4)]
    cfg = {"v": 1}
    run_with_checkpoint(files, str(tmp_path), _local_compute, cfg)
    m = checkpoint_metrics(str(tmp_path)).sort_values("partition_id")
    assert m["partition_id"].tolist() == [0, 1, 2, 3]
    assert (m["row_count"] == 500).all()
    assert (m["wall_s"] >= 0).all()
    assert (m["n_sketches"] == 2).all()
    # legacy file without the wall_s column: reader degrades to -1
    import pyarrow.parquet as pq

    path = os.path.join(str(tmp_path), "part-00000.parquet")
    t = pq.read_table(path)
    pq.write_table(t.drop_columns(["wall_s"]), path)
    m2 = checkpoint_metrics(str(tmp_path)).sort_values("partition_id")
    assert m2.loc[m2["partition_id"] == 0, "wall_s"].iloc[0] == -1.0
    # resume still absorbs the legacy partition (schema tolerant)
    merged = run_with_checkpoint(files, str(tmp_path), _local_compute, cfg)
    assert merged["hll"].estimate() > 0
