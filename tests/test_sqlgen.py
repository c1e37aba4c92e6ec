"""Parity tests for the derived-SQL CMS oracles (functions/sqlgen.py).

The gate-level end-to-end check (Ray pipeline vs the generated SQL at
two sf levels) runs in scripts/local_gate.py; these tests pin the
primitives the derivation rests on — SplitMix64 bit-parity between
numpy uint64 semantics and the generated DuckDB expression, including
the wraparound edge cases, and the dyadic-cover restatement.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from associationabacminer_ray.functions import sqlgen
from associationabacminer_ray.functions.hashing import splitmix64


def _sql_splitmix(values: np.ndarray) -> np.ndarray:
    vals = ", ".join(f"(CAST({int(v)} AS UBIGINT))" for v in values)
    src = f"SELECT x FROM (VALUES {vals}) t(x)"
    q = sqlgen.splitmix64_select(src, "x", "h")
    out = duckdb.connect().execute(
        f"SELECT CAST(h AS HUGEINT) FROM ({q})").fetchall()
    return np.array([int(r[0]) for r in out], dtype=object)


def test_splitmix64_sql_matches_numpy_random():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 64, size=256, dtype=np.uint64)
    want = splitmix64(xs)
    got = _sql_splitmix(xs)
    assert [int(w) for w in want] == list(got)


def test_splitmix64_sql_wraparound_edges():
    xs = np.array([0, 1, (1 << 64) - 1, (1 << 63), 0x9E3779B97F4A7C15],
                  dtype=np.uint64)
    want = [int(v) for v in splitmix64(xs)]
    assert want == list(_sql_splitmix(xs))


def test_mulmod64_exact():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
    for const in (0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 1, (1 << 64) - 1):
        vals = ", ".join(f"(CAST({int(v)} AS UBIGINT))" for v in a)
        q = (f"SELECT CAST({sqlgen._mulmod64('x', const)} AS HUGEINT) "
             f"FROM (VALUES {vals}) t(x)")
        got = [int(r[0]) for r in duckdb.connect().execute(q).fetchall()]
        want = [(int(v) * const) % (1 << 64) for v in a]
        assert got == want


def test_seed_constants_match_mix_with_seed():
    from associationabacminer_ray.functions.hashing import mix_with_seed

    # S_i in the VALUES list must equal splitmix64(seed·1315423911+i),
    # i.e. the constant mix_with_seed folds into every element
    import re

    seed, depth = 7, 4
    sql = sqlgen._seeds_values(seed, depth)
    consts = [int(m) for m in re.findall(r"CAST\((\d+) AS UBIGINT\)", sql)]
    assert len(consts) == depth
    h = np.uint64(0)
    for i in range(depth):
        want = splitmix64(np.uint64((seed * 1315423911 + i) % (1 << 64)))
        assert int(want) == consts[i]
        # and the full row map agrees with sketches/cms.py:_rows
        assert int(mix_with_seed(h, seed * 1315423911 + i)) == int(
            splitmix64(h ^ np.uint64(consts[i])))


def test_dyadic_cover_restatement_matches_engine():
    from associationabacminer_ray.pipelines.sketch_queries import dyadic_cover

    rng = np.random.default_rng(3)
    for _ in range(200):
        a, b = sorted(int(v) for v in rng.integers(0, 1 << 24, size=2))
        assert sqlgen._dyadic_cover(a, b) == dyadic_cover(a, b, 24)


@pytest.mark.parametrize("gen", [sqlgen.join_size_cms_sql,
                                 sqlgen.range_count_cms_sql,
                                 sqlgen.heavy_changers_sql,
                                 sqlgen.windowed_heavy_changers_sql,
                                 sqlgen.f2_moment_sketch_sql,
                                 sqlgen.hll_role_convs_sql])
def test_generated_sql_is_single_statement(gen):
    sql = gen()
    assert ";" not in sql
    assert "MACRO" not in sql.upper()


def test_polyhash_sql_matches_hash_strings_poly():
    """The list_reduce Horner fold + splitmix steps reproduce
    ``hash_strings_poly`` bit-for-bit on the ASCII key domain
    (tools, '='/'|'-joined itemset strings), including the empty
    string and length-1/long edges."""
    from associationabacminer_ray.functions.hashing import hash_strings_poly

    rng = np.random.default_rng(11)
    alphabet = np.array(list(
        "abcdefghijklmnopqrstuvwxyz0123456789=|k_-"))
    strs = ["", "k", "k0", "k999", "agent=k37|user=k2", "a" * 200] + [
        "".join(rng.choice(alphabet, size=int(n)))
        for n in rng.integers(1, 40, size=60)
    ]
    py = hash_strings_poly(strs)
    vals = ", ".join("('" + s + "')" for s in strs)
    q = sqlgen.polyhash_select(
        f"SELECT s FROM (VALUES {vals}) t(s)", "s", "h", ("s",))
    got = dict(duckdb.connect().execute(
        f"SELECT s, CAST(h AS HUGEINT) FROM ({q})").fetchall())
    for s, expect in zip(strs, py):
        assert int(got[s]) == int(expect), s


def test_heavy_changers_estimate_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the Ray CMS heavy-changers ESTIMATE equals the
    single-statement SQL derivation row-for-row (same candidates —
    space-saving exact regime — same point reads, same threshold)."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        HC_TOPK_CAP, q_heavy_changers)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    n_tools = con.execute(
        "SELECT COUNT(DISTINCT 'k' || regexp_extract(props, '[0-9]+')) "
        "FROM events WHERE props IS NOT NULL AND ts IS NOT NULL"
    ).fetchone()[0]
    assert n_tools <= HC_TOPK_CAP  # candidates = ALL distinct tools
    oracle = (con.execute(sqlgen.heavy_changers_sql()).df()
              .sort_values("tool").reset_index(drop=True))
    for c in ("n_even_est", "n_odd_est", "delta_abs_est"):
        oracle[c] = oracle[c].astype(np.int64)
    mine = (q_heavy_changers(sf_dir).sort_values("tool")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, oracle)


def test_windowed_heavy_changers_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the daily-store window ESTIMATES equal the
    single-statement SQL derivation row-for-row — the CMS-additivity
    argument (per-day cell updates sum to whole-window supports) plus
    the poly-hash restatement, checked against real store blobs."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        WHC_TOPK_CAP, q_windowed_heavy_changers)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    # exact-regime precondition: candidates = every itemset with
    # window support ≥ 1 (merged top-k never evicts)
    n_sets = con.execute("""
        WITH t AS (SELECT DISTINCT
                       'conv-' || CAST(user_id AS VARCHAR) || '@'
                           || strftime(ts, '%Y-%m-%d') AS txk,
                       event_type || '=k'
                           || regexp_extract(props, '[0-9]+') AS item
                   FROM events
                   WHERE ts >= TIMESTAMP '2024-01-01'
                     AND ts < TIMESTAMP '2024-01-15')
        SELECT (SELECT COUNT(DISTINCT item) FROM t)
             + (SELECT COUNT(*) FROM
                  (SELECT DISTINCT a.item, b.item AS ib FROM t a
                   JOIN t b ON a.txk = b.txk AND a.item < b.item))
    """).fetchone()[0]
    assert n_sets <= WHC_TOPK_CAP
    oracle = (con.execute(sqlgen.windowed_heavy_changers_sql()).df()
              .sort_values("itemset").reset_index(drop=True))
    for c in ("s1_est", "s2_est", "delta_abs_est"):
        oracle[c] = oracle[c].astype(np.int64)
    mine = (q_windowed_heavy_changers(sf_dir).sort_values("itemset")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, oracle)


def test_f2_moment_sketch_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the CountSketch AMS-F2 ESTIMATE equals the SQL
    derivation (signed cell table + odd-depth median) exactly."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_f2_moment_sketch)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = con.execute(sqlgen.f2_moment_sketch_sql()).df()
    for c in oracle.columns:
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(q_f2_moment_sketch(sf_dir), oracle)


def test_clz64_sql_matches_numpy():
    """The CASE-ladder clz matches the vectorized ``_clz64`` bit
    binary-search for random uint64 (nonzero — SQL ladder yields 63 for
    zero by documented contract, numpy 64)."""
    from associationabacminer_ray.sketches.hll import _clz64

    rng = np.random.default_rng(11)
    # spread across magnitudes so every ladder branch fires
    shifts = rng.integers(0, 64, size=4000, dtype=np.uint64)
    vals = (rng.integers(1, 2**63, size=4000, dtype=np.uint64)
            >> shifts) | np.uint64(1)
    con = duckdb.connect()
    import pyarrow as pa
    con.register("t", pa.table({"x": vals}))
    q = sqlgen.clz64_select("SELECT x, x AS v FROM t", "v", "clz", ("x",))
    got = con.execute(
        f"SELECT clz FROM ({q}) ORDER BY x").df()["clz"].to_numpy(np.int64)
    order = np.argsort(vals)
    assert np.array_equal(got, _clz64(vals)[order])


def test_hugeint_split_to_double_matches_python():
    """The 32-bit-aligned split conversion the HLL harmonic sum uses —
    CAST(s//2³² AS DOUBLE)·2⁻³² + CAST(s%2³² AS DOUBLE)·2⁻⁶⁴ — is
    bit-identical to the Python twin for S up to 2⁷⁹ (each half casts
    exactly; only the final add rounds, correctly, on both sides).
    The naive whole-value CAST(HUGEINT AS DOUBLE) is NOT usable: DuckDB
    double-rounds it ±1 ulp vs Python float(int)."""
    rng = np.random.default_rng(3)
    con = duckdb.connect()
    for _ in range(200):
        s = int(rng.integers(1, 2**62)) << int(rng.integers(0, 17))
        s += int(rng.integers(0, 2**40))
        got = con.execute(
            f"SELECT CAST(CAST({s} AS HUGEINT) // 4294967296 AS DOUBLE)"
            f" * power(2.0, -32)"
            f" + CAST(CAST({s} AS HUGEINT) % 4294967296 AS DOUBLE)"
            f" * power(2.0, -64)").fetchone()[0]
        want = (float(s >> 32) * 2.0 ** -32
                + float(s & 0xFFFFFFFF) * 2.0 ** -64)
        assert got == want, s


def test_hll_sql_estimator_raw_branch(tmp_path):
    """The generated HLL SQL reproduces the Python estimator on a
    synthetic corpus sized to exercise the RAW (non-linear-counting)
    branch at p=6 (m=64: 5000 distinct ≫ 2.5·m), including the exact
    HUGEINT harmonic sum and half-even rounding."""
    import pandas as pd
    import pyarrow as pa

    from associationabacminer_ray.functions.hashing import hash_strings_poly
    from associationabacminer_ray.sketches.hll import HyperLogLog

    users = np.arange(5000, dtype=np.int64)
    roles = np.where(users % 2 == 0, "a", "b")
    con = duckdb.connect()
    con.register("events", pa.table({
        "user_id": users, "event_type": roles}))
    got = (con.execute(sqlgen.hll_role_convs_sql(p=6)).df()
           .sort_values("role").reset_index(drop=True))
    want_rows = []
    for r in ("a", "b"):
        conv = np.array([f"conv-{u}" for u in users[roles == r]], object)
        sk = HyperLogLog(p=6)
        sk.update_hashed(hash_strings_poly(conv))
        est = sk.estimate()
        assert est > 2.5 * 64  # raw branch really fired
        want_rows.append({"role": r,
                          "est_distinct_convs": np.int64(round(est))})
    want = pd.DataFrame(want_rows)
    pd.testing.assert_frame_equal(
        got.astype({"est_distinct_convs": np.int64}), want)


def test_hll_role_convs_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the per-role HLL ESTIMATE equals the SQL derivation
    (register rebuild + exact harmonic sum) bit-for-bit — the former
    pinned golden, now independently derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_hll_role_convs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = (con.execute(sqlgen.hll_role_convs_sql()).df()
              .sort_values("role").reset_index(drop=True))
    oracle["est_distinct_convs"] = oracle["est_distinct_convs"].astype(
        np.int64)
    mine = (q_hll_role_convs(sf_dir).sort_values("role")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, oracle)


def test_weighted_sample_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the A-ES weighted sample equals the SQL derivation
    row-for-row (splitmix key, shared-libm ln, top-k selection) — the
    former pinned golden, now independently derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines.analytics import (
        weighted_sample_events)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = con.execute(sqlgen.weighted_sample_sql()).df()
    for c in oracle.columns:
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(weighted_sample_events(sf_dir), oracle)


def test_weighted_sample_np_prune_superset_of_exact(ray_session, sf_dir):
    """The padded np.log per-batch prune keeps every row the exact
    (math.log) global selection needs — the safety property the pad
    margin buys on the real corpus."""
    import math

    import pyarrow.parquet as pq

    from associationabacminer_ray.functions.hashing import hash_ints
    from associationabacminer_ray.functions.scoring import fold_bp_strict
    from associationabacminer_ray.pipelines.analytics import (
        WEIGHTED_SAMPLE_K, weighted_sample_events)

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "value"]).drop_null()
    ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    w_bp = fold_bp_strict(t["value"].to_numpy(zero_copy_only=False),
                          name="value")
    ok = w_bp > 0
    ids, w_bp = ids[ok], w_bp[ok]
    u = (hash_ints(ids).astype(np.float64) + 1.0) / 2.0 ** 64
    exact_key = np.array([math.log(x) for x in u]) / (w_bp / 10000.0)
    order = np.lexsort((ids, -exact_key))
    exact_top = set(ids[order[:WEIGHTED_SAMPLE_K]].tolist())
    got = set(weighted_sample_events(sf_dir)["event_id"].tolist())
    assert got == exact_top


@pytest.mark.parametrize("q_name,gen,sort_cols", [
    ("value_quantiles_dd", "value_quantiles_dd_sql", ["q_bp"]),
    ("type_value_quantiles_dd", "type_value_quantiles_dd_sql",
     ["event_type", "q_bp"]),
    ("rule_conf_quantiles", "rule_conf_quantiles_sql", ["q_pct"]),
])
def test_ddsketch_quantiles_match_derived_sql(ray_session, sf_dir, q_name,
                                              gen, sort_cols):
    """End-to-end: each DDSketch quantile ESTIMATE equals its SQL
    derivation (bucket rebuild + nearest-rank pick + shared-libm
    midpoint) exactly — three former pinned goldens, now derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines import sketch_queries as sq

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = (con.execute(getattr(sqlgen, gen)()).df()
              .sort_values(sort_cols).reset_index(drop=True))
    mine = (getattr(sq, f"q_{q_name}")(sf_dir)
            .sort_values(sort_cols).reset_index(drop=True))
    num = [c for c in oracle.columns if c != "event_type"]
    pd.testing.assert_frame_equal(
        mine.astype({c: np.int64 for c in num}),
        oracle.astype({c: np.int64 for c in num}))


def test_ddsketch_boundary_keys_match_duckdb_ln():
    """The vectorized-with-boundary-recompute ``_keys_of`` agrees with
    DuckDB's ceil(ln(v)/ln(γ)) on values planted ON the geometric
    bucket boundaries (γ^k exactly) and ulp-adjacent to them — the
    cases where numpy's SIMD log could flip the ceil."""
    import pyarrow as pa

    from associationabacminer_ray.sketches.ddsketch import DDSketch

    sk = DDSketch(alpha=0.01)
    g = sk.gamma
    ks = np.arange(-50, 51)
    exact = np.power(g, ks.astype(np.float64))
    vals = np.concatenate([exact, np.nextafter(exact, np.inf),
                           np.nextafter(exact, 0.0)])
    got = sk._keys_of(vals).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    want = con.execute(
        f"SELECT CAST(CEIL(ln(v) / ln(CAST({g!r} AS DOUBLE))) AS BIGINT) "
        f"FROM t").df().iloc[:, 0].to_numpy(np.int64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("q_name,gen,sort_cols", [
    ("simhash_bands", "simhash_bands_sql", ["doc_id"]),
    ("simhash_dups", "simhash_dups_sql", ["id_a", "id_b"]),
])
def test_simhash_matches_derived_sql(ray_session, sf_dir, q_name, gen,
                                     sort_cols):
    """End-to-end: SimHash signatures/bands and the Hamming≤3 pairs
    equal the SQL derivation (poly token hashes, ±1 bit majority,
    pigeonhole-complete pair verify) — two former pins, now derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines import text_pipelines as tp

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = (con.execute(getattr(sqlgen, gen)()).df()
              .sort_values(sort_cols).reset_index(drop=True))
    mine = (getattr(tp, f"q_{q_name}")(sf_dir)
            .sort_values(sort_cols).reset_index(drop=True))
    for c in oracle.columns:
        dt = np.uint64 if c == "simhash" else np.int64
        oracle[c] = oracle[c].astype(dt)
        mine[c] = mine[c].astype(dt)
    pd.testing.assert_frame_equal(mine, oracle)


def test_crosscorpus_bloom_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the Bloom-mode kept/dropped counts — including any
    false positives — equal the SQL derivation that rebuilds the
    filter geometry, bit set, and every probe from raw documents."""
    import pandas as pd

    from associationabacminer_ray.pipelines.text_pipelines import (
        q_crosscorpus_dedup)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle = (con.execute(sqlgen.crosscorpus_dedup_sql()).df()
              .sort_values("source").reset_index(drop=True))
    for c in ("n_kept", "n_dropped"):
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(q_crosscorpus_dedup(sf_dir), oracle)


def test_bloom_geometry_word_rounding_matches_sql():
    """for_capacity's m (ceil formula + 64-bit word round-up) and k
    (half-even round over the UNROUNDED m) match the SQL geometry CTEs
    across a sweep of capacities."""
    from associationabacminer_ray.sketches import BloomFilter

    con = duckdb.connect()
    for n in (1, 2, 7, 63, 64, 250, 1000, 12345):
        b = BloomFilter.for_capacity(n, fpr=0.001)
        row = con.execute(f"""
            WITH geom AS (
              SELECT CAST(CEIL((-CAST({n} AS DOUBLE))
                         * ln(CAST(0.001 AS DOUBLE))
                         / (ln(CAST(2.0 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE))))
                     AS BIGINT) AS m0)
            SELECT CASE WHEN m0 % 64 = 0 THEN m0
                        ELSE (m0 // 64 + 1) * 64 END,
                   GREATEST(1, CAST(CASE
                     WHEN kf - FLOOR(kf) > 0.5 THEN FLOOR(kf) + 1
                     WHEN kf - FLOOR(kf) < 0.5 THEN FLOOR(kf)
                     ELSE FLOOR(kf) + CAST(FLOOR(kf) AS BIGINT) % 2
                   END AS BIGINT))
            FROM (SELECT m0, CAST(m0 AS DOUBLE) / CAST({n} AS DOUBLE)
                             * ln(CAST(2.0 AS DOUBLE)) AS kf FROM geom)
        """).fetchone()
        assert (b.num_bits, b.num_hashes) == (row[0], row[1]), n


def test_rule_audience_overlap_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the Theta rule-audience overlaps (exact regime —
    k ≫ distinct convs) equal the composed mine→rank→audience SQL
    derivation row-for-row — a former pin, now derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_rule_audience_overlap)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = (con.execute(sqlgen.rule_audience_overlap_sql()).df()
              .sort_values(["rule_a", "rule_b"]).reset_index(drop=True))
    for c in ("common_convs", "union_convs", "jaccard_bp"):
        oracle[c] = oracle[c].astype(np.int64)
    mine = (q_rule_audience_overlap(sf_dir)
            .sort_values(["rule_a", "rule_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, oracle)


def test_greedy_policy_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the distributed multi-round greedy cover equals the
    recursive-CTE bitstring derivation round-for-round (argmax,
    remaining-count cscore denominators, terminal newly=0 row) — the
    former flagship pin, now derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_greedy_policy)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = con.execute(sqlgen.greedy_policy_sql()).df()
    for c in ("round", "support_ab", "covered_this_round",
              "uncovered_before", "cscore_bp"):
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(q_greedy_policy(sf_dir), oracle)


def test_greedy_policy_sql_refuses_oversized_universe():
    """The fixed-bitstring universe is guarded: a corpus with more
    conversations than max_convs errors loudly instead of silently
    truncating coverage. DuckDB may surface either the explicit
    error() guard or bitstring_agg's own range error first (CTE
    evaluation order is unspecified) — both are loud refusals."""
    import pyarrow as pa

    con = duckdb.connect()
    n = 40
    con.register("events", pa.table({
        "user_id": np.arange(n, dtype=np.int64),
        "event_type": ["click"] * n,
        "props": ["k1"] * n}))
    with pytest.raises(duckdb.Error,
                       match="conv universe exceeds|outside of provided"):
        con.execute(sqlgen.greedy_policy_sql(max_convs=16)).df()


def test_kmeans_centroids_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the distributed integer-exact k-means equals the
    recursive-CTE derivation across all five Lloyd iterations
    (seeding, argmin tie-breaks, empty-cluster carry, final sizes) —
    a former pin, now derived."""
    import pandas as pd

    from associationabacminer_ray.pipelines.cluster import (
        q_kmeans_centroids)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    oracle = con.execute(sqlgen.kmeans_centroids_sql()).df()
    for c in oracle.columns:
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(
        q_kmeans_centroids(sf_dir).astype(np.int64), oracle)


def test_windowed_sketch_sweep_events_matches_derived_sql(ray_session,
                                                          sf_dir):
    """End-to-end: the events-derived sweep twin's window estimates
    (HLL distinct transactions + merged top-k head) equal the SQL
    derivation, and the exact-regime precondition (top-k capacity ≫
    distinct window itemsets) actually holds."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        WHC_TOPK_CAP, q_windowed_sketch_sweep_events)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    n_sets = con.execute("""
        WITH t AS (SELECT DISTINCT
                       'conv-' || CAST(user_id AS VARCHAR) || '@'
                           || strftime(ts, '%Y-%m-%d') AS txk,
                       event_type || '=k'
                           || regexp_extract(props, '[0-9]+') AS item
                   FROM events
                   WHERE ts >= TIMESTAMP '2024-01-02'
                     AND ts < TIMESTAMP '2024-01-11')
        SELECT (SELECT COUNT(DISTINCT item) FROM t)
             + (SELECT COUNT(*) FROM
                  (SELECT DISTINCT a.item, b.item AS ib FROM t a
                   JOIN t b ON a.txk = b.txk AND a.item < b.item))
    """).fetchone()[0]
    assert n_sets <= WHC_TOPK_CAP
    oracle = (con.execute(sqlgen.windowed_sketch_sweep_events_sql()).df()
              .reset_index(drop=True))
    for c in ("est_transactions", "top_support_est"):
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(
        q_windowed_sketch_sweep_events(sf_dir), oracle)


def test_hll_role_union_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: HLL set algebra (pair-union register merge +
    inclusion-exclusion intersection) equals the SQL derivation that
    rebuilds each pair's registers from the union of the two roles'
    key sets."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_hll_role_union)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = (con.execute(sqlgen.hll_role_union_sql()).df()
              .sort_values(["role_a", "role_b"]).reset_index(drop=True))
    for c in ("est_union", "est_intersection"):
        oracle[c] = oracle[c].astype(np.int64)
    mine = (q_hll_role_union(sf_dir)
            .sort_values(["role_a", "role_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(mine, oracle)


def test_weighted_sample_by_type_matches_derived_sql(ray_session, sf_dir):
    """End-to-end: the stratified A-ES sample equals the per-type
    ROW_NUMBER SQL derivation row-for-row."""
    import pandas as pd

    from associationabacminer_ray.pipelines.analytics import (
        weighted_sample_by_type)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = con.execute(sqlgen.weighted_sample_by_type_sql()).df()
    for c in ("rank", "event_id", "weight_bp"):
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(weighted_sample_by_type(sf_dir), oracle)


def _write_random_events(tmp_path, seed: int) -> str:
    """A small random events corpus (same column contract as the
    driver's) for cross-validating the recursive-CTE oracles beyond
    the fixed testdata."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = int(rng.integers(120, 400))
    users = rng.integers(0, 12, size=n)
    types = np.array(["click", "view", "error"])[rng.integers(0, 3, size=n)]
    props = np.array([f"k{int(v)}" for v in rng.integers(0, 9, size=n)],
                     dtype=object)
    ts = (np.datetime64("2024-01-01") +
          rng.integers(0, 20 * 86400, size=n).astype("timedelta64[s]"))
    value = rng.integers(1, 500, size=n) / 7.0
    d = tmp_path / f"corpus_{seed}"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": users.astype(np.int64),
        "event_type": types,
        "props": props,
        "value": value.astype(np.float64),
        "ts": pa.array(ts),
    }), str(d / "events.parquet"))
    return str(d)


def test_greedy_policy_sql_property_random_corpora(ray_session, tmp_path):
    """The recursive bitstring greedy-cover derivation equals the
    distributed engine on RANDOM corpora (not just the fixed
    testdata) — rounds, tie-breaks, coverage stop, terminal newly=0."""
    import pandas as pd

    from associationabacminer_ray.pipelines.sketch_queries import (
        q_greedy_policy)

    for seed in (3, 11, 29):
        sf = _write_random_events(tmp_path, seed)
        got = q_greedy_policy(sf)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS "
                    f"SELECT * FROM '{sf}/events.parquet'")
        want = con.execute(sqlgen.greedy_policy_sql()).df()
        for c in ("round", "support_ab", "covered_this_round",
                  "uncovered_before", "cscore_bp"):
            want[c] = want[c].astype(np.int64)
        pd.testing.assert_frame_equal(got, want), seed


def test_hll_and_weighted_sample_sql_property_random_corpora(
        ray_session, tmp_path):
    """The HLL-estimate and A-ES derivations equal the engine on
    random corpora (covers register collisions and key-order patterns
    the fixed testdata can't)."""
    import pandas as pd

    from associationabacminer_ray.pipelines.analytics import (
        weighted_sample_events)
    from associationabacminer_ray.pipelines.sketch_queries import (
        q_hll_role_convs)

    for seed in (5, 17):
        sf = _write_random_events(tmp_path, seed)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS "
                    f"SELECT * FROM '{sf}/events.parquet'")
        got = (q_hll_role_convs(sf).sort_values("role")
               .reset_index(drop=True))
        want = (con.execute(sqlgen.hll_role_convs_sql()).df()
                .sort_values("role").reset_index(drop=True))
        want["est_distinct_convs"] = want["est_distinct_convs"].astype(
            np.int64)
        pd.testing.assert_frame_equal(got, want), seed
        got = weighted_sample_events(sf)
        want = con.execute(sqlgen.weighted_sample_sql()).df()
        for c in want.columns:
            want[c] = want[c].astype(np.int64)
        pd.testing.assert_frame_equal(got, want), seed


def test_kmeans_sql_property_random_corpora(ray_session, tmp_path):
    """The recursive-CTE k-means derivation equals the engine on random
    embedding tables (random seeds exercise empty clusters, argmin
    ties, and bp-fold boundaries the fixed corpus may not)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from associationabacminer_ray.pipelines.cluster import (
        q_kmeans_centroids)

    for seed in (7, 23):
        rng = np.random.default_rng(seed)
        n, d = int(rng.integers(40, 120)), 8
        emb = rng.normal(size=(n, d)).astype(np.float64)
        dd = tmp_path / f"emb_{seed}"
        dd.mkdir()
        pq.write_table(pa.table({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array(list(emb)),
            "label": rng.integers(0, 3, size=n).astype(np.int64),
        }), str(dd / "embeddings.parquet"))
        got = q_kmeans_centroids(str(dd))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS "
                    f"SELECT * FROM '{dd}/embeddings.parquet'")
        want = con.execute(sqlgen.kmeans_centroids_sql()).df()
        for c in want.columns:
            want[c] = want[c].astype(np.int64)
        pd.testing.assert_frame_equal(got.astype(np.int64), want), seed
