"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + order-insensitive values (columns sorted by name, rows
sorted by all columns).  Exit 1 on any mismatch.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name:26s} rows={len(got):7d} ({dt:5.1f}s) [rows-only; no oracle]")
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            continue
        eq = got.equals(exp)
        if not eq:
            diff_cols = [c for c in got.columns if not got[c].equals(exp[c])]
            failures.append(name)
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                mask = got[c] != exp[c]
                print("  got:", got.loc[mask, c].head(3).tolist(),
                      " exp:", exp.loc[mask, c].head(3).tolist())
            continue
        print(f"PASS {name:26s} rows={len(got):7d} ({dt:5.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
