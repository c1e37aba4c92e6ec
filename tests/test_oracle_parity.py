"""Mirror of the driver's correctness gate: run every oracle-backed
``queries()`` entry at sf0.001 AND sf0.01 and compare against its
``oracle_sql()`` via DuckDB — row count, column names, and
order-insensitive values must match exactly.
"""

import glob

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for path in glob.glob(f"{sf_dir}/*.parquet"):
        name = path.rsplit("/", 1)[1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_query_matches_oracle(ray_session, name, sf_dir):
    got = normalize(to_pandas(entrymod.queries()[name](sf_dir)))
    want = normalize(run_oracle(sf_dir, entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.to_numpy(dtype=float), w.to_numpy(dtype=float),
                               rtol=0, atol=0), f"{name}.{col} float mismatch"
        else:
            pd.testing.assert_series_equal(g, w, check_names=False,
                                           check_dtype=False, obj=f"{name}.{col}")


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    assert len(out) >= 0
    assert {"antecedent", "consequent", "confidence", "cscore"} <= set(out.columns)


def test_rows_only_queries_run(ray_session):
    q = entrymod.queries()
    rows_only = set(q) - set(entrymod.oracle_sql())
    assert rows_only  # sketch-mode entries exist
    for name in sorted(rows_only):
        out = to_pandas(q[name]("/root/testdata/sf0.001"))
        assert len(out) >= 0 and len(out.columns) > 0, name
