#!/usr/bin/env python3
"""DuckDB oracle comparison for graft.Verify output.

Usage: oracle_check.py <sf_dir> <verify_out_dir>

Loads each testdata table as a DuckDB view, runs every SQL in
<out>/oracle_sql.json, canonicalizes both sides (sort columns by name, sort
rows, integers exact, floats -> float64 round(4)), asserts frame equality.

Integer columns are compared EXACTLY and keep their integer dtype: the
driver's gate hashes values type-sensitively, so a Spark BIGINT against a
DuckDB HUGEINT-turned-float must FAIL here too (r7 shipped a red row because
this tool used to coerce every numeric to float64 and said "ALL MATCH").
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(
                df[c].dropna().iloc[0] if len(df[c].dropna()) else None,
                (datetime.date, datetime.datetime)):
            df[c] = pd.to_datetime(df[c])
        if pd.api.types.is_bool_dtype(df[c]) or pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64").round(4)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    import os as _os
    for t in TABLES:
        # fuzz corpora (tools/fuzz_diff.py) carry only the tables their
        # query subset reads; a query touching an absent table then fails
        # loudly at SQL time instead of masking every other comparison here
        if _os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    bad = []
    no_oracle = []
    import glob
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        sql = oracles.get(name)
        if not sql:
            no_oracle.append(name)
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                bad.append((name, f"schema {list(a.columns)} vs {list(b.columns)}"))
            elif len(a) != len(b):
                bad.append((name, f"rows {len(a)} vs {len(b)}"))
            elif list(a.dtypes) != list(b.dtypes):
                mism = [f"{c}: {a[c].dtype} vs {b[c].dtype}"
                        for c in a.columns if a[c].dtype != b[c].dtype]
                bad.append((name, f"dtype mismatch ({'; '.join(mism)}) — "
                                  "driver's type-sensitive hash would diverge"))
            elif not a.equals(b):
                diff = (a != b).any(axis=1)
                bad.append((name, f"values differ, first at row {diff.idxmax()}"))
            else:
                print(f"  ok   {name} ({len(a)} rows)")
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"oracle error: {e}"))
    for name in no_oracle:
        print(f"  --   {name} (no oracle, rows-only)")
    if bad:
        for name, why in bad:
            print(f"  FAIL {name}: {why}")
        print(f"{len(bad)} MISMATCH")
        return 1
    print(f"ALL MATCH ({len(names) - len(no_oracle)} oracled, {len(no_oracle)} rows-only)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
