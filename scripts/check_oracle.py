"""Local mimic of the driver's t2 correctness gate: run every queries()
entry and its oracle_sql() against DuckDB on the same parquet, compare
row count + column names + exact values (sorted, column-name order).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from bytehub_spark.plans.scratch import release_scratch
from bytehub_spark.session import get_spark
from bytehub_spark.sources import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            release_scratch()  # drop per-query persisted intermediates only
        took = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(sdf)} rows  [{took:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sdf)} duckdb={len(ddf)}")
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        bad = None
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad = f"col {c}: row {i} spark={av[i]!r} duckdb={bv[i]!r} (maxdiff {np.nanmax(np.abs(av - bv))})"
                    break
            else:
                if not a[c].astype(str).equals(b[c].astype(str)):
                    neq = a[c].astype(str) != b[c].astype(str)
                    i = int(neq.idxmax())
                    bad = f"col {c}: row {i} spark={a[c].iloc[i]!r} duckdb={b[c].iloc[i]!r}"
                    break
        dtypes_differ = [
            c for c in a.columns if str(a[c].dtype) != str(b[c].dtype)
        ]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: value mismatch: {bad}")
        else:
            note = f" DTYPE? {dtypes_differ}" if dtypes_differ else ""
            print(f"ok {name}: {len(sdf)} rows exact-match  [{took:.1f}s]{note}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
