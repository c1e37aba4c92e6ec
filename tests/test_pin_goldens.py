"""The golden-pin generator's SQL emission (scripts/pin_goldens.py)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "scripts")
from pin_goldens import _values_sql  # noqa: E402


def _run(sql: str, n_events: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM range(%d)" % n_events)
    return con.execute(sql).df()


class TestValuesSql:
    def test_round_trips_ints_strings_and_uint64(self):
        df = pd.DataFrame({
            "name": ["a", "it's", "c"],
            "n": np.array([1, -5, 0], dtype=np.int64),
            # top-bit-set uint64 values overflow BIGINT — the column
            # anchor must pick UBIGINT
            "sig": np.array([2**63 + 7, 3, 2**64 - 1], dtype=np.uint64),
        })
        out = _run(_values_sql(df, 1000), 1000)
        assert out["name"].tolist() == ["a", "it's", "c"]
        assert out["n"].tolist() == [1, -5, 0]
        assert out["sig"].astype(np.uint64).tolist() == df["sig"].tolist()

    def test_count_selector_gates_the_branch(self):
        df = pd.DataFrame({"n": np.array([42], dtype=np.int64)})
        sql = _values_sql(df, 1000)
        assert len(_run(sql, 1000)) == 1
        assert len(_run(sql, 999)) == 0

    def test_refuses_floats_and_empty(self):
        with pytest.raises(TypeError, match="float"):
            _values_sql(pd.DataFrame({"x": [1.5]}), 10)
        with pytest.raises(ValueError, match="0-row"):
            _values_sql(pd.DataFrame({"x": pd.Series(dtype=np.int64)}), 10)

    def test_mixed_dtype_rows_not_upcast(self):
        # the iterrows() pitfall: int64 + uint64 in one row upcasts to
        # float64 and would trip the float guard
        df = pd.DataFrame({
            "a": np.array([1], dtype=np.int64),
            "b": np.array([2**63], dtype=np.uint64),
        })
        out = _run(_values_sql(df, 5), 5)
        assert out["b"].astype(np.uint64).iloc[0] == 2**63
