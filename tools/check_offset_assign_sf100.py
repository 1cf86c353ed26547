#!/usr/bin/env python3
"""q_offset_assign check via CONTIGUOUS event_id ranges with per-topic
prior-count bases — the remedy for the r10 mismatch, which was the
CHECKER's: a `event_id % n` slice oracle computes slice-local row numbers
that cannot match the dump's global `row_number() OVER (PARTITION BY
topic ORDER BY event_id)`.

Validity: event_id is a total order within each topic, so for a
contiguous range the global row number of a row equals (# same-topic
rows in earlier ranges) + its range-local row number. The bases come
from ONE aggregate pass (group by topic × arithmetic chunk id); each
range then verifies with the standard canon+hash compare. This
partitions the EXACT full check — no approximation anywhere.

Chunk membership is the same exact integer arithmetic on both sides:
chunk(e) = (e - lo) * n // width, whose inverse gives the contiguous
bounds b(k) = lo + (k*width + n - 1) // n (floor-division duality), so
the oracle's WHERE and the dump's filter select identical row sets.

usage: check_offset_assign_sf100.py <sfDir> <outDir> [nchunks] [chunk]
"""
import glob
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import canon, h  # noqa: E402


def connect():
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    return con


def main(sf, out, n, only_chunk=None):
    ev = f"read_parquet('{sf}/events.parquet')"
    con = connect()
    lo, hi = con.execute(f"SELECT min(event_id), max(event_id) FROM {ev}").fetchone()
    width = hi - lo + 1
    # one aggregate pass: per-(topic, chunk) counts -> exclusive prefix bases
    bases = con.execute(f"""
        WITH c AS (SELECT event_type AS topic,
                          CAST((event_id - {lo}) * {n} // {width} AS INT) AS k,
                          count(*) AS cnt
                   FROM {ev} GROUP BY 1, 2)
        SELECT topic, k,
               CAST(coalesce(sum(cnt) OVER (PARTITION BY topic ORDER BY k
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
        FROM c""").df()
    con.close()
    bound = lambda k: lo + (k * width + n - 1) // n  # noqa: E731
    files = glob.glob(f"{out}/q_offset_assign/*.parquet")
    for k in range(n):
        if only_chunk is not None and k != only_chunk:
            continue
        b_lo, b_hi = bound(k), bound(k + 1)
        con = connect()
        kb = bases[bases.k == k][["topic", "base"]]
        con.register("kb", kb)
        want = con.execute(f"""
            WITH chunk AS (
              SELECT event_id, event_type AS topic,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY event_id) AS rn
              FROM {ev} WHERE event_id >= {b_lo} AND event_id < {b_hi})
            SELECT c.event_id, c.topic,
                   CAST(1000000 + coalesce(kb.base, 0) + c.rn AS BIGINT) AS new_offset
            FROM chunk c LEFT JOIN kb ON kb.topic = c.topic""").df()
        got = con.execute(f"""
            SELECT * FROM read_parquet({files!r})
            WHERE event_id >= {b_lo} AND event_id < {b_hi}""").df()
        con.close()
        g, w = canon(got), canon(want)
        assert list(g.columns) == list(w.columns), \
            f"cols {list(g.columns)} vs {list(w.columns)}"
        assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
        assert h(g) == h(w), f"hash mismatch in range [{b_lo},{b_hi})"
        print(f"OK    q_offset_assign range {k}/{n} [{b_lo},{b_hi}) ({len(g)} rows)",
              flush=True)


if __name__ == "__main__":
    sf, out = sys.argv[1:3]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    only = int(sys.argv[4]) if len(sys.argv) > 4 else None
    main(sf, out, n, only)
