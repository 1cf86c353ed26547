#!/usr/bin/env python3
"""Chunked oracle check for PER-ROW-INDEPENDENT gates whose DuckDB oracle
is memory-intractable in one shot at big scale factors (e.g.
q_rolling_fingerprint: the pure-SQL XXH64 + rolling-hash re-derivation
builds a ~100M-row HUGEINT intermediate at sf10 and the list_reduce
operator cannot spill).

Validity requires the gate to be row-per-key with NO cross-key
aggregation — then verifying each `key % nchunks == k` slice with the
same oracle SQL over a filtered base table is exactly the full check,
partitioned. Each chunk runs in this process with a fresh connection;
drive one chunk per PROCESS from the shell if pyarrow map accumulation
is also a problem.

usage: check_chunked.py <sfDir> <outDir> <gate> <keyCol> <nchunks> [chunk] [baseTable]

`baseTable` (default documents) is the table the chunk predicate applies
to — events-scale gates (q_yield, q_switch, ...) chunk on the events
table's key instead.
"""
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import TABLES, canon, h  # noqa: E402


def run_chunk(sf, out, gate, col, n, k, base="documents", out_col=None):
    import json
    # base: "table" (chunks on `col`) or "t1:c1,t2:c2" for union-shaped
    # gates whose rows come from several tables (q_fuse), each filtered by
    # its own key under the same modulus
    bases = {}
    for spec in base.split(","):
        t, _, c = spec.partition(":")
        bases[t] = c or col
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        where = f" WHERE {bases[t]} % {n} = {k}" if t in bases else ""
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet'){where}")
    sql = json.load(open(f"{out}/oracle_sql.json"))[gate]
    want = con.execute(sql).df()
    got = pd.read_parquet(f"{out}/{gate}")
    # the dump may carry the key under a different name (q_withfield emits
    # event_id as "offset"); the chunk predicate is the same modulus either way
    got = got[got[out_col or col] % n == k]
    g, w = canon(got), canon(want)
    assert list(g.columns) == list(w.columns), f"cols {list(g.columns)} vs {list(w.columns)}"
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert h(g) == h(w), "hash mismatch"
    print(f"OK    {gate} chunk {k}/{n} ({len(g)} rows)")
    con.close()


if __name__ == "__main__":
    sf, out, gate, col = sys.argv[1:5]
    n = int(sys.argv[5])
    base = sys.argv[7] if len(sys.argv) > 7 else "documents"
    out_col = sys.argv[8] if len(sys.argv) > 8 else None
    if len(sys.argv) > 6 and sys.argv[6] != "-":
        run_chunk(sf, out, gate, col, n, int(sys.argv[6]), base, out_col)
    else:
        for k in range(n):
            run_chunk(sf, out, gate, col, n, k, base, out_col)
