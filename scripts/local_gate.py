"""Local simulation of the driver's correctness gate: run every
``queries()`` entry that has an ``oracle_sql()`` twin at sf0.001 and
sf0.01 and compare rows / columns / order-insensitive values. Prints
one line per (sf, query): OK or FAIL <reason>. Exit code = #failures.

Usage: python scripts/local_gate.py [only_these_query_names...]
"""

import glob
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

import ray

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def run_oracle(sf_dir, sql):
    con = duckdb.connect()
    for path in glob.glob(f"{sf_dir}/*.parquet"):
        name = path.rsplit("/", 1)[1].removesuffix(".parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def normalize(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def main():
    trace = "--trace" in sys.argv[1:]
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    if not ray.is_initialized():
        from associationabacminer_ray.runtime import (
            quiet_ray_empty_schema_warnings,
        )

        quiet_ray_empty_schema_warnings()
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = 0
    for sf_dir in SF_DIRS:
        for name in sorted(oracles):
            if only and name not in only:
                continue
            try:
                res = queries[name](sf_dir)
                if hasattr(res, "to_pandas"):
                    res = res.to_pandas()
                got = normalize(pd.DataFrame(res))
                want = normalize(run_oracle(sf_dir, oracles[name]))
                if list(got.columns) != list(want.columns):
                    raise AssertionError(
                        f"columns {list(got.columns)} != {list(want.columns)}")
                if len(got) != len(want):
                    raise AssertionError(f"rows {len(got)} != {len(want)}")
                for col in got.columns:
                    g, w = got[col], want[col]
                    if g.dtype.kind == "f" or w.dtype.kind == "f":
                        if not np.allclose(g.to_numpy(float),
                                           w.to_numpy(float),
                                           rtol=0, atol=0):
                            raise AssertionError(f"{col} float mismatch")
                    else:
                        pd.testing.assert_series_equal(
                            g, w, check_names=False, check_dtype=False)
                print(f"OK   {sf_dir.rsplit('/',1)[1]} {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                fails += 1
                msg = str(e).replace("\n", " | ")[:300]
                print(f"FAIL {sf_dir.rsplit('/',1)[1]} {name}: "
                      f"{type(e).__name__} {msg}", flush=True)
                if trace:
                    traceback.print_exc()
    print(f"done: {fails} failures", flush=True)
    sys.exit(min(fails, 125))


if __name__ == "__main__":
    main()
