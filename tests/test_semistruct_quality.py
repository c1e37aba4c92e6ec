"""Unit tests for the round-3 semi-structured / text-quality batch:
JSON integer extraction (contract edges), repetition stats,
unigram-LM scoring, and relational division."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from associationabacminer_ray.pipelines.semistruct import json_int_field


class TestJsonIntField:
    def test_contract_edges(self):
        a = pa.array(['{"k": 69}', '{"k":-7, "z": 1}', '{"k": 6.9}',
                      '{"k": "9"}', '{"z": 3}', '{"k": 12e3}', None,
                      '{"k":0}'])
        got = json_int_field(a, "k").to_pylist()
        # floats / exponents / strings / missing / null -> null, matching
        # the oracle's json_type IN (BIGINT, UBIGINT) guard
        assert got == [69, -7, None, None, None, None, None, 0]

    def test_regex_key_escaping(self):
        a = pa.array(['{"a.b": 5}', '{"axb": 6}'])
        assert json_int_field(a, "a.b").to_pylist() == [5, None]


def _write_docs(tmp_path, texts):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts,
                       "lang": ["en"] * len(texts),
                       "source": ["s"] * len(texts),
                       "n_chars": [len(t or "") for t in texts]})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


class TestRepetitionStats:
    def test_values_and_ties(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.terms import repetition_stats
        sf = _write_docs(tmp_path, [
            "a a a b c",          # top=a tf=3, n=5, distinct=3
            "b a b a",            # tie 2-2 -> lexicographically 'a'
            "",                   # zero tokens -> excluded
            None,                 # null text -> excluded
            "x",                  # single token
        ])
        out = (repetition_stats(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [0, 1, 4]
        assert out["top_term"].tolist() == ["a", "a", "x"]
        assert out["top_tf"].tolist() == [3, 2, 1]
        assert out["n_tokens"].tolist() == [5, 4, 1]
        assert out["n_distinct"].tolist() == [3, 2, 1]
        assert out["top_bp"].tolist() == [6000, 5000, 10000]
        assert out["distinct_bp"].tolist() == [6000, 5000, 10000]


class TestDocLmScore:
    def test_direct_formula(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.terms import doc_lm_score
        texts = ["a a b", "b c", "a"]
        sf = _write_docs(tmp_path, texts)
        out = (doc_lm_score(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        # corpus counts: a=3, b=2, c=1, N=6
        import math
        lp = {"a": math.log(3 / 6), "b": math.log(2 / 6),
              "c": math.log(1 / 6)}
        expect = [np.mean([lp["a"], lp["a"], lp["b"]]),
                  np.mean([lp["b"], lp["c"]]),
                  lp["a"]]
        got = out["lm_millinats"].tolist()
        want = [int(np.floor(e * 1000 + 0.5)) for e in expect]
        assert got == want
        assert out["n_tokens"].tolist() == [3, 2, 1]
        # common docs score higher than rare-token docs
        assert got[0] > got[1]


class TestUsersAllTypes:
    def test_division(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.olap import users_all_types
        ev = pd.DataFrame({
            "event_id": np.arange(7, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * 7),
            "user_id": np.array([1, 1, 1, 2, 2, 3, -1], np.int64),
            "event_type": ["x", "y", "z", "x", "y", "x", "z"],
            "value": np.ones(7),
            "props": ['{"k": 1}'] * 7,
        })
        # null user row still contributes its type to the divisor
        ev.loc[6, "user_id"] = None
        ev["user_id"] = ev["user_id"].astype("Int64")
        ev.to_parquet(tmp_path / "events.parquet", index=False)
        out = users_all_types(str(tmp_path)).to_pandas()
        assert out["user_id"].tolist() == [1]
        assert out["n_types"].tolist() == [3]


class TestProfileAndEntropy:
    def test_profile_counts_nulls_and_distinct(self, ray_session, tmp_path):
        import ray.data as rd
        from associationabacminer_ray.pipelines.profile import profile_table
        df = pd.DataFrame({
            "a": pd.array([1, 1, 2, None, 3], dtype="Int64"),
            "b": ["x", "x", "x", "x", None],
        })
        df.to_parquet(tmp_path / "t.parquet", index=False)
        ds = rd.read_parquet(str(tmp_path / "t.parquet"))
        out = (profile_table(ds, ["a", "b"]).to_pandas()
               .set_index("column_name"))
        assert out.loc["a"].tolist() == [5, 1, 3]
        assert out.loc["b"].tolist() == [5, 1, 1]

    def test_profile_all_null_batch_keeps_header(self, ray_session,
                                                 tmp_path):
        import ray.data as rd
        from associationabacminer_ray.pipelines.profile import profile_table
        df = pd.DataFrame({"a": pd.array([None, None], dtype="Int64")})
        df.to_parquet(tmp_path / "t.parquet", index=False)
        out = (profile_table(rd.read_parquet(str(tmp_path / "t.parquet")),
                             ["a"]).to_pandas())
        assert out.iloc[0].tolist() == ["a", 2, 2, 0]

    def test_entropy_closed_form(self, ray_session):
        import math
        from associationabacminer_ray.pipelines.profile import field_entropy
        out = field_entropy("/root/testdata/sf0.001").set_index("field")
        # uniform bound: H <= ln(n_distinct)
        for f in ("event_type", "user_id"):
            h = out.loc[f, "entropy_millinats"] / 1000
            assert 0 < h <= math.log(out.loc[f, "n_distinct"]) + 1e-9


class TestIntervalJoin:
    def test_gap_drops_and_bands_assign(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.joins import (
            interval_join_values)
        ev = pd.DataFrame({
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * 5),
            "user_id": np.ones(5, np.int64),
            "event_type": ["x"] * 5,
            # bp: 0, 49999.99->50000, 210000 (gap), 300000, 5000000(out)
            "value": [0.0, 5.0, 21.0, 30.0, 500.0],
            "props": ["{}"] * 5,
        })
        ev.to_parquet(tmp_path / "events.parquet", index=False)
        out = (interval_join_values(str(tmp_path)).to_pandas()
               .sort_values("event_id").reset_index(drop=True))
        # id 2 in the gap, id 4 beyond the last hi -> dropped
        assert out["event_id"].tolist() == [0, 1, 3]
        assert out["band_id"].tolist() == [1, 2, 3]


class TestNationParties:
    def test_outer_zero_fill(self, ray_session):
        from associationabacminer_ray.pipelines.olap import nation_parties
        out = nation_parties("/root/testdata/sf0.001").to_pandas()
        # suppliers cover only part of the nations at sf0.001 -> the
        # outer rows must exist with a zero supplier count
        assert (out["n_supp"] == 0).any()
        assert (out["n_cust"] > 0).all() or (out["n_supp"] > 0).all()


class TestKMeans:
    def test_matches_direct_numpy(self, ray_session):
        """Engine result == single-process numpy replay of the same
        integer-exact Lloyd's iterations."""
        import pyarrow.parquet as pq
        from associationabacminer_ray.functions.hashing import hash_ints
        from associationabacminer_ray.pipelines.cluster import (
            BP, K_CLUSTERS, N_ITERS, kmeans_embeddings)

        sf = "/root/testdata/sf0.001"
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        x = np.floor(np.asarray(t["embedding"].to_pylist(), np.float64)
                     * BP + 0.5).astype(np.int64)
        h = hash_ints(ids)
        seed_order = np.lexsort((ids, h))[:K_CLUSTERS]
        cent = x[seed_order]
        for _ in range(N_ITERS):
            d2 = (cent * cent).sum(1)[None, :] - 2 * (x @ cent.T)
            a = np.argmin(d2, axis=1)
            new = cent.copy()
            for j in range(K_CLUSTERS):
                m = a == j
                if m.any():
                    new[j] = np.floor(x[m].mean(0) + 0.5).astype(np.int64)
            cent = new
        d2 = (cent * cent).sum(1)[None, :] - 2 * (x @ cent.T)
        cnt = np.bincount(np.argmin(d2, axis=1), minlength=K_CLUSTERS)

        out = (kmeans_embeddings(sf).sort_values(["cluster_id", "dim"])
               .reset_index(drop=True))
        got_cent = out["centroid_bp"].to_numpy(np.int64).reshape(
            K_CLUSTERS, -1)
        np.testing.assert_array_equal(got_cent, cent)
        got_cnt = (out.groupby("cluster_id")["n_points"].first()
                   .to_numpy(np.int64))
        np.testing.assert_array_equal(got_cnt, cnt)
        assert cnt.sum() == len(ids)


class TestCube:
    def test_grouping_set_consistency(self, ray_session):
        from associationabacminer_ray.pipelines.olap import type_hour_cube
        out = type_hour_cube("/root/testdata/sf0.001")
        finest = out[(out["event_type"] != "ALL") & (out["hour"] >= 0)]
        total = out[(out["event_type"] == "ALL") & (out["hour"] == -1)]
        assert total["n"].iloc[0] == finest["n"].sum()
        by_type = out[(out["event_type"] != "ALL") & (out["hour"] == -1)]
        assert (by_type.set_index("event_type")["n"].sort_index()
                == finest.groupby("event_type")["n"].sum().sort_index()
                ).all()
        by_hour = out[(out["event_type"] == "ALL") & (out["hour"] >= 0)]
        assert (by_hour.set_index("hour")["n"].sort_index()
                == finest.groupby("hour")["n"].sum().sort_index()).all()


class TestWeightedSample:
    def test_inclusion_proportional_to_weight(self, ray_session, tmp_path):
        """With one weight 1000x the rest, that row must be sampled;
        zero/negative weights never are; ranks follow the A-ES keys."""
        from associationabacminer_ray.pipelines.analytics import (
            weighted_sample_events)
        n = 200
        ev = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01"] * n),
            "user_id": np.ones(n, np.int64),
            "event_type": ["x"] * n,
            "value": np.full(n, 0.01),
            "props": ["{}"] * n,
        })
        ev.loc[7, "value"] = 10.0     # 1000x weight
        ev.loc[9, "value"] = 0.0      # never sampled
        ev.to_parquet(tmp_path / "events.parquet", index=False)
        out = weighted_sample_events(str(tmp_path), k=10)
        assert len(out) == 10
        assert 7 in out["event_id"].to_numpy()
        assert 9 not in out["event_id"].to_numpy()
        assert out["rank"].tolist() == list(range(1, 11))

    def test_direct_formula_parity(self, ray_session):
        """Engine top-k == single-process replay of the key formula."""
        import pyarrow.parquet as pq
        from associationabacminer_ray.functions.hashing import hash_ints
        from associationabacminer_ray.functions.scoring import fold_bp_strict
        from associationabacminer_ray.pipelines.analytics import (
            weighted_sample_events)
        t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                          columns=["event_id", "value"])
        ids = t["event_id"].to_numpy().astype(np.int64)
        w = fold_bp_strict(t["value"].to_numpy(), name="value")
        ok = w > 0
        ids, w = ids[ok], w[ok]
        u = (hash_ints(ids).astype(np.float64) + 1.0) / 2.0 ** 64
        key = np.log(u) / (w.astype(np.float64) / 10000.0)
        order = np.lexsort((ids, -key))[:20]
        out = weighted_sample_events("/root/testdata/sf0.001")
        np.testing.assert_array_equal(out["event_id"].to_numpy(np.int64),
                                      ids[order])


class TestSemiJoinAndDocLen:
    def test_semi_plus_anti_partition_customers(self, ray_session):
        """semi(1996) ∪ its complement == all customers, disjoint."""
        import duckdb
        from associationabacminer_ray.pipelines.olap import active_customers
        got = active_customers("/root/testdata/sf0.001").to_pandas()
        want = duckdb.sql("""
            SELECT DISTINCT o_custkey FROM
            '/root/testdata/sf0.001/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND o_custkey IN (SELECT c_custkey FROM
                  '/root/testdata/sf0.001/customer.parquet')
        """).df()
        assert set(got["c_custkey"]) == set(want["o_custkey"])

    def test_doc_len_quantiles_monotone(self, ray_session):
        from associationabacminer_ray.pipelines.stats import (
            doc_len_quantiles_by_source)
        out = doc_len_quantiles_by_source("/root/testdata/sf0.001")
        out = out.to_pandas() if hasattr(out, "to_pandas") else out
        for _, g in out.groupby("source"):
            g = g.sort_values("q_pct")
            assert (np.diff(g["n_chars"].to_numpy(np.int64)) >= 0).all()


class TestDecontamination:
    def test_planted_contamination_found(self, ray_session, tmp_path):
        """Doc 7 is 'benchmark' (7 % 50 == 7); doc 12 copies an exact
        16-token run from it, doc 13 shares nothing."""
        from associationabacminer_ray.pipelines.text_pipelines import (
            q_benchmark_contamination)
        passage = " ".join(f"tok{i}" for i in range(20))  # 20 tokens
        texts = {7: passage + " tail7 " + " ".join(f"b{i}" for i in range(16)),
                 12: "lead12 " + passage,
                 13: " ".join(f"c{i}" for i in range(30))}
        ids = sorted(texts)
        df = pd.DataFrame({"doc_id": np.array(ids, np.int64),
                           "text": [texts[i] for i in ids],
                           "lang": ["en"] * 3, "source": ["s"] * 3,
                           "n_chars": [len(texts[i]) for i in ids]})
        df.to_parquet(tmp_path / "documents.parquet", index=False)
        out = q_benchmark_contamination(str(tmp_path))
        assert out["doc_id"].tolist() == [12]
        # the shared 20-token passage contains 5 distinct 16-token windows
        assert out["n_contaminated"].tolist() == [5]

    def test_benchmark_side_never_flagged(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.text_pipelines import (
            q_benchmark_contamination)
        passage = " ".join(f"t{i}" for i in range(16))
        df = pd.DataFrame({"doc_id": np.array([7, 57], np.int64),
                           "text": [passage, passage],  # both benchmark
                           "lang": ["en"] * 2, "source": ["s"] * 2,
                           "n_chars": [len(passage)] * 2})
        df.to_parquet(tmp_path / "documents.parquet", index=False)
        out = q_benchmark_contamination(str(tmp_path))
        assert len(out) == 0


class TestNeardupCanonical:
    def test_collapses_planted_chains(self, ray_session):
        import duckdb
        from associationabacminer_ray.pipelines.components import (
            q_neardup_canonical)
        out = (q_neardup_canonical("/root/testdata/sf0.001").to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        docs = duckdb.sql("SELECT doc_id FROM "
                          "'/root/testdata/sf0.001/documents.parquet' "
                          "ORDER BY doc_id").df()
        # every original survives, no planted id survives
        assert out["doc_id"].tolist() == docs["doc_id"].tolist()
        assert set(out["n_members"]) <= {1, 3}
        assert (out["n_members"] == 3).any()


class TestReviewRegressions:
    def test_json_overflow_is_null(self):
        a = pa.array(['{"k": 99999999999999999999}',
                      '{"k": 123456789012345678}', '{"k": 1}'])
        assert json_int_field(a, "k").to_pylist() == [
            None, 123456789012345678, 1]

    def test_interval_overlap_refused(self):
        from associationabacminer_ray.pipelines.joins import (
            interval_join_values)
        with pytest.raises(ValueError):
            interval_join_values("/nonexistent",
                                 bands=[(1, 0, 100), (2, 50, 200)])

    def test_profile_negative_zero_single_distinct(self, ray_session,
                                                   tmp_path):
        import ray.data as rd
        from associationabacminer_ray.pipelines.profile import profile_table
        df = pd.DataFrame({"v": np.array([0.0, -0.0, 1.5])})
        df.to_parquet(tmp_path / "t.parquet", index=False)
        out = (profile_table(rd.read_parquet(str(tmp_path / "t.parquet")),
                             ["v"]).to_pandas())
        assert out.iloc[0].tolist() == ["v", 3, 0, 2]

    def test_kmeans_fewer_rows_than_k(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.cluster import (
            kmeans_embeddings)
        df = pd.DataFrame({
            "vec_id": np.arange(3, dtype=np.int64),
            "embedding": [np.full(4, float(i)) for i in range(3)],
            "label": np.zeros(3, np.int32),
        })
        df.to_parquet(tmp_path / "embeddings.parquet", index=False)
        out = kmeans_embeddings(str(tmp_path), k=8)
        assert out["cluster_id"].nunique() == 3
        assert (out.groupby("cluster_id")["n_points"].first() == 1).all()


class TestLabelCentroidsAndPatterns:
    def test_centroid_direct(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.cluster import label_centroids
        df = pd.DataFrame({
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [np.array([1.0, -1.0]), np.array([2.0, -2.0]),
                          np.array([0.5, 0.5]), np.array([-0.5, -0.5])],
            "label": np.array([1, 1, 2, 2], np.int32),
        })
        df.to_parquet(tmp_path / "embeddings.parquet", index=False)
        out = (label_centroids(str(tmp_path)).to_pandas()
               .sort_values(["label", "dim"]).reset_index(drop=True))
        assert out["sum_bp"].tolist() == [30000, -30000, 0, 0]
        assert out["n_vecs"].tolist() == [2, 2, 2, 2]
        # trunc division, incl. negative sums
        assert out["centroid_bp"].tolist() == [15000, -15000, 0, 0]

    def test_pattern_counts_semantics(self, ray_session, tmp_path):
        from associationabacminer_ray.pipelines.sequence import (
            path_pattern_counts)
        ev = pd.DataFrame({
            "event_id": np.arange(6, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 00:00:0%d" % i
                                  for i in range(6)]),
            "user_id": np.array([1, 1, 1, 2, 2, 3], np.int64),
            # u1: view>click>purchase (matches), u2: signup>error,
            # u3: error (no repeat)
            "event_type": ["view", "click", "purchase",
                           "signup", "error", "error"],
            "value": np.ones(6), "props": ["{}"] * 6,
        })
        ev.to_parquet(tmp_path / "events.parquet", index=False)
        out = path_pattern_counts(str(tmp_path)).set_index("pattern")
        assert out.loc["view_then_purchase", "n_users"] == 1
        assert out.loc["starts_with_signup", "n_users"] == 1
        assert out.loc["error_repeat", "n_users"] == 0


class TestUnpivot:
    def test_round_trip_inverse_of_pivot(self, ray_session):
        from associationabacminer_ray.pipelines.olap import (
            q_type_hour_pivot, q_type_hour_unpivot)
        sf = "/root/testdata/sf0.001"
        wide = (q_type_hour_pivot(sf).to_pandas()
                .set_index("event_type").sort_index())
        long = q_type_hour_unpivot(sf).to_pandas()
        back = (long.pivot(index="event_type", columns="hour", values="n")
                .sort_index())
        back.columns = [f"h{h}" for h in back.columns]
        pd.testing.assert_frame_equal(wide, back[wide.columns],
                                      check_names=False)


class TestCurationPipeline:
    def test_counts_are_a_partition(self, ray_session):
        """Every doc lands in exactly one bucket."""
        from associationabacminer_ray.pipelines.text_pipelines import (
            q_curation_pipeline)
        cur = q_curation_pipeline("/root/testdata/sf0.001")
        parts = cur[["n_drop_bench", "n_drop_dup", "n_drop_quality",
                     "n_drop_lang", "n_drop_contam", "n_kept"]].sum(axis=1)
        assert (parts == cur["n_docs"]).all()
        assert cur["n_docs"].sum() == 500

    def test_bench_shadow_dedup_matches_oracle(self, ray_session,
                                               tmp_path):
        """The bench-aware keep-first (a bench doc must NOT shadow a
        training doc's canonical slot) is absent from the gate corpora
        (no bench-involved dup groups there), so exercise it
        synthetically: engine == composed SQL oracle on a corpus where
        the duplicate group's MIN id is a benchmark doc."""
        import duckdb

        import __ray_entry__ as entrymod

        shared = "the quick brown fox jumps over the lazy dog again"
        df = pd.DataFrame({
            # 7 is bench (7%50==7) and the MIN id of the dup group
            # {7, 12, 30}; 8 unique; 57 bench unique
            "doc_id": np.array([7, 8, 12, 30, 57], np.int64),
            "text": [shared, "completely different words here",
                     shared, shared, "eval only text"],
            "lang": ["en"] * 5,
            "source": ["s1", "s1", "s1", "s2", "s2"],
            "n_chars": [len(shared), 31, len(shared), len(shared), 14],
        })
        df.to_parquet(tmp_path / "documents.parquet", index=False)
        got = (entrymod.queries()["curation_pipeline"](str(tmp_path))
               .sort_values("source").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        want = (con.execute(entrymod.oracle_sql()["curation_pipeline"])
                .df().sort_values("source").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({c: np.int64 for c in got.columns
                        if c != "source"}),
            want.astype({c: np.int64 for c in want.columns
                         if c != "source"}))
        # the bench doc is dropped as bench, doc 12 (not 7) is the
        # canonical copy in s1, doc 30's s2 copy is the duplicate
        s1 = got.set_index("source").loc["s1"]
        assert s1["n_drop_bench"] == 1
        assert s1["n_drop_dup"] == 0
