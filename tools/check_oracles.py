"""Mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() DuckDB twin on the same sf dir; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns/rows and normalize dtypes the way the driver's
    value-hash does: integral floats render as ints (DuckDB fetchdf
    returns SUM(BIGINT) as float64 — a dtype artifact, not a value
    difference), non-integral floats round to 9 places."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_float_dtype(df[col]):
            vals = df[col].astype(float)
            finite = vals[np.isfinite(vals)]
            # integral check BEFORE np.round: round(x, 9) computes
            # x*1e9, which exceeds 2^53 for |x| > ~9e6 and corrupts
            # exact integers (4991067627.0 -> 4991067627.000001)
            if len(finite) == len(vals) and (finite == np.floor(finite)).all():
                df[col] = vals.astype(np.int64)
            else:
                df[col] = np.round(vals, 9)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')"
        )

    failures = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            mine = canonicalize(to_pandas(queries[name](sf_dir)))
            gold = canonicalize(con.execute(sql).df())
            if list(mine.columns) != list(gold.columns):
                raise AssertionError(
                    f"columns differ: {list(mine.columns)} vs {list(gold.columns)}"
                )
            if len(mine) != len(gold):
                raise AssertionError(f"row count {len(mine)} vs {len(gold)}")
            if not mine.equals(gold):
                diff = (mine != gold).any(axis=1)
                raise AssertionError(
                    f"value mismatch in {int(diff.sum())} rows; first:\n"
                    f"mine:\n{mine[diff].head(3)}\ngold:\n{gold[diff].head(3)}"
                )
            print(f"OK    {name:28s} rows={len(mine)}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:28s} {exc}")
    # rows-only queries: just execute them
    for name in sorted(set(queries) - set(oracles)):
        if only and name not in only:
            continue
        try:
            mine = to_pandas(queries[name](sf_dir))
            print(f"ROWS  {name:28s} rows={len(mine)}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name:28s} {exc}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
