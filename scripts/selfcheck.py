"""Driver-mimicking correctness check: run every queries() entry and its
oracle_sql() twin at a given scale, compare row count + sorted-column
value hash. Usage:

    PYTHONPATH=/root/repo python scripts/selfcheck.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify Int64/int64/int32
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if set(ray_df.columns) != set(sql_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    for c in sorted(ray_df.columns):
        a, b = str(ray_df[c].dtype), str(sql_df[c].dtype)
        if a != b:
            print(f"    dtype-warn {name}.{c}: ray={a} sql={b}")
    a, b = canon(ray_df), canon(sql_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                      rtol=1e-7, atol=1e-9)
        return "OK"
    except AssertionError as e:
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        detail = str(e).splitlines()[0]
        return f"VALUE MISMATCH cols={diff_cols} ({detail})"


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only, skip = set(), set()
    for a in sys.argv[2:]:
        if a.startswith("--skip="):
            skip |= set(a[len("--skip="):].split(","))
        else:
            only.add(a)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(ray_df)} rows ({dt:.1f}s)")
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: ORACLE SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = "ok  " if verdict == "OK" else "FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{status} {name}: {len(ray_df)} rows ({dt:.1f}s) {verdict if verdict != 'OK' else ''}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
