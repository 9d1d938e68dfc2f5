#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run graft.Verify output vs DuckDB.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result and
runs the matching SQL from oracle_sql.json in DuckDB (tables = views over
the sfDir parquet files), sorts columns by name and rows by all columns,
and compares values.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if (pd.isna(a) is True) != (pd.isna(b) is True):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
            continue
        bad = None
        for c in spark_df.columns:
            av, bv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(av, bv)):
                if not eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} duck={b!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    # queries without oracle => rows-only note
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
