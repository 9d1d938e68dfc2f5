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


# DuckDB result dtypes Spark can also produce when writing parquet. Anything
# outside this set (HUGEINT from sum(BIGINT), unsigned ints, INTERVAL, ...)
# hash-mismatches in the driver's dtype-sensitive canonicalization even when
# every value is equal — the r9/r10 chunkcsv saga. Nested types are scanned
# for forbidden payloads by substring.
ALLOWED_BASE = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE", "BLOB",
}
FORBIDDEN_TOKENS = [
    "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    "INTERVAL", "UUID", "ENUM", "BIT",
]


def lint_dtype_ok(t: str) -> bool:
    t = t.strip().upper()
    for tok in FORBIDDEN_TOKENS:
        if tok in t:
            return False
    if t in ALLOWED_BASE or t.startswith("DECIMAL("):
        return True
    # nested types already passed the forbidden-token scan
    return t.startswith(("STRUCT(", "LIST(", "MAP(")) or t.endswith("[]")


def lint_oracles(con, oracle: dict) -> int:
    """DESCRIBE every oracle; fail on any dtype Spark can't emit (VERDICT r10
    item 3 — makes the HUGEINT class of silent hash-red unrepresentable)."""
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"LINT FAIL {name}: DESCRIBE error: {e}")
            failures += 1
            continue
        for cname, ctype, *_ in cols:
            if not lint_dtype_ok(ctype):
                print(f"LINT FAIL {name}: column {cname} has oracle dtype "
                      f"{ctype}, outside the Spark-writable set — add a CAST")
                failures += 1
    if not failures:
        print(f"LINT PASS: {len(oracle)} oracles, all dtypes Spark-writable")
    return failures


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = lint_oracles(con, oracle)
    # Completeness: a dumped query with no oracle entry would silently
    # skip the gate (the loop below iterates oracle keys). Surface it.
    import os
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    unchecked = sorted(dumped - set(oracle))
    if unchecked:
        print(f"FAIL completeness: {len(unchecked)} dumped queries have no "
              f"oracle entry: {', '.join(unchecked)}")
        failures += len(unchecked)
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
