"""Distributed connected components (pipelines/components.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from associationabacminer_ray.pipelines.components import connected_components


def _uf_reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_matches_union_find_on_mixed_graph(self, ray_session):
        rng = np.random.default_rng(5)
        edges = []
        # long chain (diameter 30 — forces multiple propagation rounds)
        edges += [(i, i + 1) for i in range(100, 130)]
        # star
        edges += [(1000, 1000 + i) for i in range(1, 12)]
        # random sparse pairs over a larger id space
        a = rng.integers(2000, 2500, size=60)
        b = rng.integers(2000, 2500, size=60)
        edges += [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        df = pd.DataFrame(edges, columns=["id_a", "id_b"]).astype(np.int64)
        got = connected_components(
            rd.from_pandas(df).repartition(6), num_buckets=8).to_pandas()
        want = _uf_reference(edges)
        got_map = dict(zip(got["node"], got["component"]))
        assert got_map == want

    def test_duplicate_and_reversed_edges_are_harmless(self, ray_session):
        df = pd.DataFrame({"id_a": [1, 2, 2, 3], "id_b": [2, 1, 3, 2]},
                          dtype=np.int64)
        got = connected_components(rd.from_pandas(df), num_buckets=4).to_pandas()
        assert dict(zip(got["node"], got["component"])) == {1: 1, 2: 1, 3: 1}


def test_small_graph_fast_path_equals_distributed(ray_session):
    """The size-gated driver union-find must return exactly the
    distributed label-propagation result (same (node, min-id) rows)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from associationabacminer_ray.pipelines.components import (
        connected_components)

    rng = np.random.default_rng(7)
    a = rng.integers(0, 500, 800).astype(np.int64)
    b = rng.integers(0, 500, 800).astype(np.int64)
    edges = rd.from_pandas(pd.DataFrame({"id_a": a, "id_b": b}))
    fast = (connected_components(edges).to_pandas()
            .sort_values("node").reset_index(drop=True))
    dist = (connected_components(edges, small_graph_max_edges=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, dist)


def test_copurchase_triangles_union_find_free(ray_session, sf_dir):
    """Triangle count vs a direct in-memory recompute (sets + sorted
    adjacency), plus bucket invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from associationabacminer_ray.pipelines.components import (
        copurchase_triangles,
    )

    got = copurchase_triangles(sf_dir, num_buckets=4)
    got16 = copurchase_triangles(sf_dir, num_buckets=32)
    pd.testing.assert_frame_equal(got, got16)

    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li = li.dropna().drop_duplicates()
    from collections import Counter, defaultdict
    from itertools import combinations

    pair_orders = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"].astype(int)), 2):
            pair_orders[(a, b)] += 1
    edges = {p for p, n in pair_orders.items() if n >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    n_tri = sum(1 for a in adj for b, c in combinations(sorted(adj[a]), 2)
                if (b, c) in edges)
    n_wedges = sum(len(adj[a]) * (len(adj[a]) - 1) // 2 for a in adj)
    assert int(got["n_edges"].iloc[0]) == len(edges)
    assert int(got["n_wedges"].iloc[0]) == n_wedges
    assert int(got["n_triangles"].iloc[0]) == n_tri
    assert n_tri > 0  # the sf0.001 corpus genuinely has triangles


class TestPageRank:
    def test_kernel_matches_hand_computation(self):
        from associationabacminer_ray.pipelines.components import pagerank_edges

        e = pd.DataFrame({"src": ["a", "a", "b"], "dst": ["b", "c", "c"],
                          "w": np.array([1, 1, 2], np.int64)})
        out = (pagerank_edges(e, iters=3).set_index("tool")["pr_scaled"]
               .to_dict())
        # hand-unrolled integer iterations (see pipelines/components.py)
        assert out == {"a": 150000, "b": 213750, "c": 395437}

    def test_mass_bounds_and_dangling(self):
        from associationabacminer_ray.pipelines.components import (
            PR_SCALE, pagerank_edges)

        # c is dangling (in-edges only): keeps restart mass, forwards none
        e = pd.DataFrame({"src": ["a", "b"], "dst": ["c", "c"],
                          "w": np.array([3, 5], np.int64)})
        out = pagerank_edges(e, iters=4)
        assert set(out["tool"]) == {"a", "b", "c"}
        sc = out.set_index("tool")["pr_scaled"]
        assert sc["a"] == 150000 and sc["b"] == 150000
        # total mass never exceeds the initial n·SCALE (floor losses only)
        assert out["pr_scaled"].sum() <= 3 * PR_SCALE
        assert (out["pr_scaled"] >= 150000).all()

    def test_bucket_count_invariance(self, ray_session, sf_dir):
        from associationabacminer_ray.pipelines.components import pagerank_tools

        a = (pagerank_tools(sf_dir, num_buckets=4)
             .sort_values("tool").reset_index(drop=True))
        b = (pagerank_tools(sf_dir, num_buckets=32)
             .sort_values("tool").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_matches_duckdb_oracle(self, ray_session, sf_dir):
        import duckdb

        import __ray_entry__ as E
        from associationabacminer_ray.pipelines.components import pagerank_tools

        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS "
                    f"SELECT * FROM '{sf_dir}/events.parquet'")
        oracle = (con.execute(E.oracle_sql()["pagerank_tools"]).df()
                  .sort_values("tool").reset_index(drop=True))
        oracle["pr_scaled"] = oracle["pr_scaled"].astype(np.int64)
        mine = (pagerank_tools(sf_dir).sort_values("tool")
                .reset_index(drop=True))
        mine["pr_scaled"] = mine["pr_scaled"].astype(np.int64)
        pd.testing.assert_frame_equal(mine, oracle)
