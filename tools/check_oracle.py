#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify parquet dump
(columns sorted by name, rows sorted, values hashed). Dev tool only — not
part of the library.

usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: timestamps->iso strings, floats keep as-is, lists->tuples
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.10g").encode()).hexdigest()

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out}/{name}")
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                fails.append((name, f"cols {list(g.columns)} vs {list(w.columns)}"))
            elif len(g) != len(w):
                fails.append((name, f"rows {len(g)} vs {len(w)}"))
            elif h(g) != h(w):
                diff = (g != w) & ~(g.isna() & w.isna())
                bad = diff.any(axis=1)
                detail = ""
                if bad.any():
                    i = bad.idxmax()
                    detail = f" first-diff row {i}: got={g.loc[i].to_dict()} want={w.loc[i].to_dict()}"
                fails.append((name, "hash mismatch" + detail))
            else:
                print(f"OK    {name} ({len(g)} rows)")
        except Exception as e:
            fails.append((name, f"EXC {type(e).__name__}: {e}"))
    for name, why in fails:
        print(f"FAIL  {name}: {why}")
    print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
