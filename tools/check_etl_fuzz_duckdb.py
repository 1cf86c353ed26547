#!/usr/bin/env python3
"""DuckDB authority for the ETL fuzzer (EtlFuzzSpec's dump test).

The spec dumps 30 seeded random ETL programs to target/etl-fuzz-duckdb/:
each case_NNN/ holds the envelope input + done set as parquet, the
compiled Catalyst plan's output (flattened to scalar columns) as parquet,
and oracle.sql — an independent SQL rendering of the SAME program's
documented semantics (anti-join, first-match routing, stateless/denorm,
per-out-topic dense renumbering, done markers).

This runs each oracle in DuckDB and multiset-compares it against the
Spark output: row counts equal AND symmetric EXCEPT ALL empty (NULLs
compare equal under set-operation semantics, matching the driver's
hash compare). Prints OK/FAIL per case and a summary; exit 1 on any FAIL.

usage: check_etl_fuzz_duckdb.py [dumpDir=target/etl-fuzz-duckdb]
"""
import sys
from pathlib import Path

import duckdb


def check_case(d: Path) -> str | None:
    sql = (d / "oracle.sql").read_text()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW oracle AS {sql}")
    con.execute("CREATE VIEW spark_out AS "
                f"SELECT * FROM read_parquet('{d}/spark_out.parquet/*.parquet')")
    cols = [r[0] for r in con.execute("DESCRIBE spark_out").fetchall()]
    ocols = [r[0] for r in con.execute("DESCRIBE oracle").fetchall()]
    if sorted(cols) != sorted(ocols):
        return f"column mismatch: spark={sorted(cols)} oracle={sorted(ocols)}"
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    n_s, = con.execute("SELECT count(*) FROM spark_out").fetchone()
    n_o, = con.execute("SELECT count(*) FROM oracle").fetchone()
    if n_s != n_o:
        return f"row count: spark={n_s} oracle={n_o}"
    diff, = con.execute(
        f"SELECT count(*) FROM ((SELECT {sel} FROM spark_out EXCEPT ALL "
        f"SELECT {sel} FROM oracle) UNION ALL (SELECT {sel} FROM oracle "
        f"EXCEPT ALL SELECT {sel} FROM spark_out))").fetchone()
    if diff:
        row = con.execute(
            f"SELECT {sel} FROM oracle EXCEPT ALL SELECT {sel} FROM spark_out "
            f"LIMIT 1").fetchall()
        return f"{diff} differing rows; first oracle-only row: {row}"
    return None


def main(dump: str) -> int:
    cases = sorted(Path(dump).glob("case_*"))
    if not cases:
        print(f"no cases under {dump} — run `sbt 'testOnly graft.etl.EtlFuzzSpec'` first")
        return 2
    failed = 0
    for d in cases:
        err = check_case(d)
        if err:
            failed += 1
            print(f"FAIL  {d.name}: {err}")
        else:
            print(f"OK    {d.name}")
    print(f"\n{len(cases) - failed}/{len(cases)} fuzz programs match DuckDB")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "target/etl-fuzz-duckdb"))
