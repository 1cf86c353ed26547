#!/usr/bin/env python3
"""Verify the four by-contract quadratic gates at the sf100 rung, over the
sampled sub-corpus built by make_sample_sf100.py (see its header for the
restriction-closure argument that makes this exact on the sample).

Pass 1 — oracle equality: the driver-style DuckDB compare (check_oracle)
on q_ngram_jaccard / q_dedup_embed / q_dedup_cluster / q_dedup_keep over
the sample dir — full rows+schema+dtype+hash match.

Pass 2 — planted positives: every oracle-verified small-rung pair mapped
through the generator's copy isomorphism must surface in the engine dump
(ngram sims exactly; embed sims within 1e-4 for float summation order).

usage: check_quadratic_sf100.py <sampleDir> <dumpDir> <plantedJson>
"""
import json
import sys

import duckdb

import check_oracle

GATES = {"q_ngram_jaccard", "q_dedup_embed", "q_dedup_cluster", "q_dedup_keep"}


def main(sample, dump, planted_json):
    print("== pass 1: driver-style oracle compare over the sample ==")
    try:
        check_oracle.main(sample, dump, skip=(), only=GATES)
        rc = 0
    except SystemExit as e:  # check_oracle.main sys.exit()s its verdict
        rc = int(e.code or 0)
    ok = rc == 0

    print("\n== pass 2: planted copy-isomorphism positives ==")
    planted = json.load(open(planted_json))
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    con.execute(f"CREATE VIEW ng AS SELECT * FROM read_parquet('{dump}/q_ngram_jaccard/*.parquet', union_by_name=true)")
    con.execute("CREATE TABLE want_ng (a BIGINT, b BIGINT, sim DOUBLE)")
    con.executemany("INSERT INTO want_ng VALUES (?, ?, ?)",
                    [(p["a"], p["b"], p["sim"]) for p in planted["ngram"]])
    miss_ng, = con.execute("""
        SELECT count(*) FROM want_ng w
        WHERE NOT EXISTS (SELECT 1 FROM ng
                          WHERE ng.a = w.a AND ng.b = w.b AND ng.sim = w.sim)
        """).fetchone()
    n_ng = len(planted["ngram"])
    print(f"{'OK' if miss_ng == 0 else 'FAIL':4s} ngram planted: "
          f"{n_ng - miss_ng}/{n_ng} image pairs present with exact sim")
    ok &= miss_ng == 0

    con.execute(f"CREATE VIEW em AS SELECT * FROM read_parquet('{dump}/q_dedup_embed/*.parquet', union_by_name=true)")
    con.execute("CREATE TABLE want_em (a BIGINT, b BIGINT, sim DOUBLE)")
    con.executemany("INSERT INTO want_em VALUES (?, ?, ?)",
                    [(p["a"], p["b"], p["sim"]) for p in planted["embed"]])
    miss_em, = con.execute("""
        SELECT count(*) FROM want_em w
        WHERE NOT EXISTS (SELECT 1 FROM em
                          WHERE em.a = w.a AND em.b = w.b
                            AND abs(em.sim - w.sim) <= 1e-4)
        """).fetchone()
    n_em = len(planted["embed"])
    print(f"{'OK' if miss_em == 0 else 'FAIL':4s} embed planted: "
          f"{n_em - miss_em}/{n_em} rotated image pairs present (sim +-1e-4)")
    ok &= miss_em == 0

    print("\nquadratic-gate sf100 sampled verification:",
          "ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
