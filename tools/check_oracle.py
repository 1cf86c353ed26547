#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Verify parquet dump
(columns sorted by name, rows sorted, values hashed). Dev tool only — not
part of the library.

usage: check_oracle.py <sfDir> <verifyOutDir> [--skip name,name,...]

--skip exists for scale runs where an ORACLE is intractable, not the
engine: q_dedup_minhash's oracle is a full all-pairs jaccard (the point
of the gate at driver sf), which at 50k docs is 1.25B list-intersects in
single-threaded DuckDB. Skipped gates must be verified another way (see
tools/check_minhash_sf1.py for the copy-isomorphism cross-check).
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
    # NO float_format mask: the driver's hasher prints values as-is, so a
    # dtype drift (e.g. DuckDB HUGEINT -> pandas float64 rendering 811 as
    # "811.0" against Spark's int64 "811") must FAIL here too. Three rounds
    # of q_budget_select driver-reds passed this check only because
    # "%.10g" silently printed 811.0 as 811.
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

def main(sf, out, skip=(), only=None):
    con = duckdb.connect()
    # sandboxed runners cap thread counts; 32-thread DuckDB + pyarrow dies
    # with EAGAIN on big scale factors — 8 threads is plenty for the oracle
    con.execute("SET threads TO 8")
    # out-of-core: without a temp_directory an in-memory duckdb cannot
    # spill, and the per-char rolling-hash oracle's intermediate (~500M
    # rows at sf10) dies in RAM instead of gracefully going to disk
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIP  {name} (oracle intractable at this sf; verified separately)")
            continue
        try:
            got = pd.read_parquet(f"{out}/{name}")
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                fails.append((name, f"cols {list(g.columns)} vs {list(w.columns)}"))
            elif len(g) != len(w):
                fails.append((name, f"rows {len(g)} vs {len(w)}"))
            elif list(map(str, g.dtypes)) != list(map(str, w.dtypes)):
                # dtype-sensitive: an int64-vs-float64 drift hashes
                # differently driver-side even when every cell is equal
                fails.append((name, "dtype mismatch " + str(
                    [(c, str(g[c].dtype), str(w[c].dtype))
                     for c in g.columns if str(g[c].dtype) != str(w[c].dtype)])))
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
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_run = len(oracle) - len([s for s in skip if s in oracle])
    print(f"\n{n_run-len(fails)}/{n_run} oracle queries match"
          + (f" ({len(skip)} skipped)" if skip else ""))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    skip = ()
    args = sys.argv[1:]
    only = None
    if "--skip" in args:
        i = args.index("--skip")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    # --only name[,name…]: check just these gates — used by scale-ladder
    # runs to give each big-output gate a FRESH process (pyarrow mmaps and
    # arena pools accumulate across gates and can exhaust vm.max_map_count)
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    main(args[0], args[1], skip, only)
