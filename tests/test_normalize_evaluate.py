"""Normalizer (M2), policy evaluation (A12), RBAC (A14), rule merge,
score aggregation (A13), AUC (A20), anonymizer (M8) — plus the
per-turn text-equality invariant (BASELINE.md)."""

import numpy as np
import pandas as pd
import pytest

from associationabacminer_ray.pipelines.evaluate import (
    aggregate_scores,
    auc_points,
    merge_policy,
    policy_allows,
    rbac_policy,
    score_policy,
)
from associationabacminer_ray.sources.transcripts import synth_transcripts
from associationabacminer_ray.stages.anonymize import (
    KeyedHashAnonymizer,
    SequentialAnonymizer,
)
from associationabacminer_ray.stages.normalize import NormalizeTurns, normalize_transcripts


class TestNormalizer:
    def test_derived_columns(self):
        df = pd.DataFrame({
            "conv_id": ["c1"] * 4,
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user", "", None, "tool"],
            "text": ["hi", "", "x" * 600, None],
            "tool": ["tool_03", None, "", "query_db_fast"],
            "ts": pd.to_datetime(["2024-01-06 03:00", "2024-01-08 12:30",
                                  "2024-01-09 23:59", "2024-01-10 08:00"]),
        })
        out = NormalizeTurns()(df)
        assert out["weekday"].tolist() == [5, 0, 1, 2]
        assert out["is_weekend"].tolist() == [True, False, False, False]
        assert out["hour_bin"].tolist() == ["h00-04", "h12-16", "h20-24", "h08-12"]
        assert out["role"].tolist() == ["user", "NONE", "NONE", "tool"]
        assert out["tool"].tolist() == ["tool_03", "NONE", "NONE", "query_db_fast"]
        assert out["tool_bin"].tolist() == ["tool_03", "NONE", "NONE", "query_db"]
        assert out["tool_bin2"].tolist() == ["tool", "none", "none", "query"]
        assert out["action_class"].tolist() == ["other", "other", "other", "read"]
        assert out["item"].tolist() == ["user=tool_03", "NONE=NONE", "NONE=NONE",
                                        "tool=query_db_fast"]
        assert out["is_long_text"].tolist() == [False, False, True, False]
        assert out["is_empty_text"].tolist() == [False, True, False, True]

    def test_per_turn_text_equality_invariant(self, ray_session):
        """Row-preserving pipelines keep text bit-identical under stable
        (conv_id, turn_idx) ordering (BASELINE.md invariant)."""
        import ray.data as rd

        tbl = synth_transcripts(500, seed=7)
        ds = normalize_transcripts(rd.from_arrow(tbl))
        got = (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        want = (tbl.to_pandas().sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))
        assert len(got) == len(want)
        pd.testing.assert_series_equal(got["text"], want["text"])
        pd.testing.assert_series_equal(got["ts"], want["ts"])


TX = pd.DataFrame({
    "conv_id": [f"c{i}" for i in range(6)],
    "items": ["a,b", "a,b,c", "a,c", "d", "d,e", "b"],
})
RULES = pd.DataFrame({"antecedent": ["a"], "consequent": ["b"]})


class TestPolicyEvaluation:
    def test_policy_allows_first_match(self):
        allowed = policy_allows(TX, RULES)
        assert allowed.tolist() == [True, True, False, False, False, False]

    def test_score_policy_counts_and_metrics(self):
        s = score_policy(TX, RULES)
        assert (s["c_tp"], s["c_fn"]) == (2, 4)
        assert (s["u_tp"], s["u_fn"]) == (2, 4)
        assert s["recall"] == pytest.approx(2 / 6)
        assert s["precision"] == 1.0  # u_fp = 0 at window scale
        assert s["n_rules"] == 1

    def test_degenerate_overrides(self):
        empty_rules = pd.DataFrame({"antecedent": [], "consequent": []})
        s = score_policy(TX, empty_rules)
        assert s["precision"] == 1.0  # nothing allowed → precision 1
        s2 = score_policy(TX.iloc[:0], RULES)
        assert s2["recall"] == 1.0  # nothing exercised → recall 1

    def test_universe_total_fp_tn(self):
        s = score_policy(TX, RULES, universe_total=100)
        assert s["u_tn"] == 100 - (s["u_tp"] + s["u_fn"])
        assert 0 <= s["accuracy"] <= 1


class TestRbacAndMerge:
    def test_rbac_policy(self):
        p = rbac_policy(TX)
        assert len(p) == 6
        assert p.loc[1, "allowed_items"] == "a,b,c"
        assert p.loc[1, "n_items"] == 3

    def test_merge_policy(self):
        rules = pd.DataFrame({
            "antecedent": ["a", "a", "x"],
            "consequent": ["b", "c", "y|z"],
        })
        merged = merge_policy(rules)
        # {a,b} and {a,c} differ in... a^b vs a^c = {b,c} → 2 elements, no merge;
        # but {a,b,c} result only if diff ≤ 1. Here |{a,b}^{a,c}|=2 → stays split
        assert len(merged) == 3
        rules2 = pd.DataFrame({
            "antecedent": ["a|b", "a|b"],
            "consequent": ["c", "d"],
        })
        merged2 = merge_policy(rules2)  # {a,b,c}^{a,b,d} = {c,d} size 2 → no merge
        assert len(merged2) == 2
        rules3 = pd.DataFrame({
            "antecedent": ["a|b", "a|b|c", "a"],
            "consequent": ["c", "d", "b|c"],
        })
        # {a,b,c} vs {a,b,c,d}: diff={d} ≤1 → merge; third {a,b,c} merges too
        merged3 = merge_policy(rules3)
        assert len(merged3) == 1
        assert merged3.loc[0, "items"] == "a|b|c|d"


class TestScoresAndAuc:
    def test_aggregate_scores(self):
        df = pd.DataFrame({
            "config_hash": ["x", "x", "y"],
            "precision": [0.5, 0.7, 1.0],
            "recall": [0.2, 0.4, 0.6],
        })
        out = aggregate_scores(df)
        assert out.loc[out["config_hash"] == "x", "precision"].iloc[0] == pytest.approx(0.6)
        assert out.loc[out["config_hash"] == "y", "recall"].iloc[0] == pytest.approx(0.6)

    def test_auc_perfect_and_random(self):
        perfect = pd.DataFrame({"fpr": [0.0], "tpr": [1.0]})
        assert auc_points(perfect) == pytest.approx(1.0)
        diagonal = pd.DataFrame({"fpr": [0.25, 0.5, 0.75], "tpr": [0.25, 0.5, 0.75]})
        assert auc_points(diagonal) == pytest.approx(0.5)


class TestAnonymizer:
    def test_keyed_hash_consistent_and_secret_dependent(self):
        df = pd.DataFrame({"conv_id": ["u1", "u2", "u1"], "text": ["a", "b", "c"]})
        a1 = KeyedHashAnonymizer(["conv_id"])(df)
        a2 = KeyedHashAnonymizer(["conv_id"])(df)
        assert a1["conv_id"].tolist() == a2["conv_id"].tolist()
        assert a1.loc[0, "conv_id"] == a1.loc[2, "conv_id"] != a1.loc[1, "conv_id"]
        assert a1["text"].equals(df["text"])  # untouched columns preserved
        b = KeyedHashAnonymizer(["conv_id"], secret=99)(df)
        assert b.loc[0, "conv_id"] != a1.loc[0, "conv_id"]

    def test_sequential_assigns_within_actor(self):
        an = SequentialAnonymizer(["conv_id"])
        out1 = an(pd.DataFrame({"conv_id": ["x", "y"]}))
        out2 = an(pd.DataFrame({"conv_id": ["y", "z"]}))
        assert out1["conv_id"].tolist() == ["u000000", "u000001"]
        assert out2["conv_id"].tolist() == ["u000001", "u000002"]
