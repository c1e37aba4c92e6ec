"""Property tests for the round-2 primitives (hypothesis).

Covers what the oracle gate can't randomize: the mixed-radix universe
decode against itertools.product over arbitrary domains, the SQL/numpy
sampling-predicate parity over arbitrary id ranges (including the
HUGEINT-overflow region), and the shared greedy itemset expansion
against a brute-force recount.
"""

import itertools

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _domain_strategy():
    value = st.text(alphabet="abcxyz01", min_size=1, max_size=4)
    field = st.sampled_from(["f1", "f2", "f3"])
    return st.dictionaries(
        field,
        st.lists(value, min_size=1, max_size=4, unique=True),
        min_size=1, max_size=3)


class TestUniverseDecode:
    @settings(max_examples=25, deadline=None)
    @given(domains=_domain_strategy(), data=st.data())
    def test_generated_union_matches_product_set(self, ray_session,
                                                 domains, data):
        from associationabacminer_ray.pipelines.universe import (
            count_allowed_universe,
            count_allowed_universe_pyset,
            statement_product_size,
        )

        # 1-2 statements, each constraining a random subset of fields to
        # random sub-lists of their domains
        stmts = []
        for _ in range(data.draw(st.integers(1, 2))):
            stmt = {}
            for f, dom in domains.items():
                if data.draw(st.booleans()):
                    k = data.draw(st.integers(0, len(dom)))
                    stmt[f] = sorted(dom)[:k]
            stmts.append(stmt)
        res = count_allowed_universe(stmts, domains, mode="exact")
        assert res["u_pos"] == count_allowed_universe_pyset(stmts, domains)
        assert res["per_statement"] == [
            statement_product_size(s, domains) for s in stmts]

    @settings(max_examples=25, deadline=None)
    @given(domains=_domain_strategy())
    def test_product_size_matches_itertools(self, domains):
        from associationabacminer_ray.pipelines.universe import (
            statement_product_size,
        )

        fields = sorted(domains)
        n = sum(1 for _ in itertools.product(*[domains[f] for f in fields]))
        assert statement_product_size({}, domains) == n


class TestSamplerParity:
    @settings(max_examples=10, deadline=None)
    @given(ids=st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200))
    def test_numpy_matches_duckdb_hugeint(self, ids):
        """The shared predicate must agree between numpy uint64 and the
        SQL HUGEINT form for ANY non-negative id — including ids past
        the BIGINT-overflow region the round-2 fix addressed."""
        from associationabacminer_ray.pipelines.analytics import (
            hash_sample_mask,
        )

        got = hash_sample_mask(np.array(ids, dtype=np.uint64))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (event_id UBIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
        want = con.execute(
            "SELECT (CAST(event_id % 4294967296 AS HUGEINT) * 2654435761) "
            "% 4294967296 < 429496729 FROM t").df().iloc[:, 0].to_numpy()
        np.testing.assert_array_equal(got, want)


class TestExpandTxItems:
    @settings(max_examples=30, deadline=None)
    @given(tx=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
                 min_size=1, max_size=4, unique=True).map(
                     lambda xs: ",".join(sorted(xs))),
        min_size=1, max_size=30),
        max_k=st.integers(1, 3))
    def test_matches_bruteforce_counts(self, tx, max_k):
        from associationabacminer_ray.pipelines.rules import _expand_tx_items
        from associationabacminer_ray.stages.transactionize import ITEM_SEP

        got = _expand_tx_items(pd.Series(tx), max_k)
        want: dict = {}
        for t in tx:
            items = tuple(t.split(","))
            for k in range(1, min(max_k, len(items)) + 1):
                for combo in itertools.combinations(items, k):
                    key = ITEM_SEP.join(combo)
                    want[key] = want.get(key, 0) + 1
        assert dict(got) == want
