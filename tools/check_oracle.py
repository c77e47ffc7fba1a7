#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against DuckDB oracles and compare (rows, schema, value hash).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize datetimes to naive UTC strings for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                h.update(repr(v).encode())
            else:
                h.update(repr(v).encode())
        h.update(b"\x00")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spark_path))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        if ok_hash:
            print(f"PASS     {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL     {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols}")
            if ok_cols and ok_rows:
                merged = got.compare(want) if got.shape == want.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(5))
            else:
                print(f"  spark cols: {list(got.columns)}")
                print(f"  duck  cols: {list(want.columns)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
