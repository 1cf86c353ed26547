#!/usr/bin/env python3
"""Two-stage sf100 verification for q_dedup_simhash (the design
SimhashSigDump.scala documents; supersedes the invalid r11 doc_id-modulus
chunking of the PAIR oracle — a pair row depends on TWO docs, so modulus
slices of the pair set are not a partition of the check).

Stage A ("siga"): the gate's only data-dependent intermediate is the
per-doc 64-bit signature. SimhashSigDump dumps it row-per-doc together
with SimhashOracle.sigSql; row-per-doc means a `doc_id % n = k` slice of
the oracle over a filtered documents view is an EXACT partition of the
full signature check — the same discipline as check_chunked.py, valid
here because there is no cross-doc aggregation. Each chunk re-derives
the pure-SQL XXH64 + bit-vote signatures in DuckDB and canon+hash
compares against the dumped slice.

Stage B ("pairs"): with every signature verified, the pair gate is a
pure function of the signature table — 4x16-bit block candidates +
hamming <= maxH — in cheap BIGINT ops (no HUGEINT XXH64 intermediates,
which is what made the one-shot pair oracle overflow the box's spill
disk). Re-derive the full pair set from the DUMPED signatures and
canon+hash compare against the gate's sf100 dump. The two stages
compose to exactly the one-shot pair oracle: A proves sigs, B proves
pairs-from-sigs, and the gate's pairs are a function of nothing else.

usage:
  check_simhash_sf100_v2.py siga  <sfDir> <sigDir> <nchunks> [chunk]
  check_simhash_sf100_v2.py pairs <sigDir> <gateOutDir> [maxHamming]

<sigDir> is SimhashSigDump's outDir (simhash_sigs/ + simhash_sig_oracle.sql);
<gateOutDir> is the Verify dump dir containing q_dedup_simhash/.
"""
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


def stage_a(sf, sigdir, n, k):
    con = connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet') WHERE doc_id % {n} = {k}")
    sql = open(f"{sigdir}/simhash_sig_oracle.sql").read()
    want = con.execute(sql).df()
    got = pd.read_parquet(f"{sigdir}/simhash_sigs")
    got = got[got["doc_id"] % n == k]
    g, w = canon(got), canon(want)
    assert list(g.columns) == list(w.columns), f"cols {list(g.columns)} vs {list(w.columns)}"
    assert list(map(str, g.dtypes)) == list(map(str, w.dtypes)), \
        f"dtypes {list(g.dtypes)} vs {list(w.dtypes)}"
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert h(g) == h(w), "hash mismatch"
    print(f"OK    simhash sigs chunk {k}/{n} ({len(g)} rows)", flush=True)
    con.close()


def stage_b(sigdir, gateout, max_h=6):
    con = connect()
    # mirrors DedupOps.simhashPairs blocking and SimhashOracle.sql's ch/pr
    # CTEs, but over the VERIFIED dumped signatures (BIGINT) instead of the
    # HUGEINT XXH64 re-derivation; hamming <= maxH filters before DISTINCT
    # (hamming is a function of (a, b), so the set is identical).
    sql = f"""
    WITH sg AS (SELECT doc_id, sig,
        (CASE WHEN sig < 0 THEN sig::HUGEINT + 18446744073709551616
              ELSE sig::HUGEINT END) AS usig
      FROM read_parquet('{sigdir}/simhash_sigs/*.parquet')),
    ch AS (SELECT doc_id, sig, blk,
        ((usig // CASE blk WHEN 0 THEN 1 WHEN 1 THEN 65536
           WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536)::BIGINT AS chunk
      FROM sg CROSS JOIN (SELECT unnest([0,1,2,3]) AS blk)),
    pr AS (SELECT l.doc_id AS a, r.doc_id AS b,
        bit_count(xor(l.sig, r.sig))::INT AS hamming
      FROM ch l JOIN ch r ON l.blk = r.blk AND l.chunk = r.chunk
        AND l.doc_id < r.doc_id
      WHERE bit_count(xor(l.sig, r.sig)) <= {max_h})
    SELECT DISTINCT a, b, hamming FROM pr"""
    want = con.execute(sql).df()
    got = pd.read_parquet(f"{gateout}/q_dedup_simhash")
    g, w = canon(got), canon(want)
    assert list(g.columns) == list(w.columns), f"cols {list(g.columns)} vs {list(w.columns)}"
    assert list(map(str, g.dtypes)) == list(map(str, w.dtypes)), \
        f"dtypes {list(g.dtypes)} vs {list(w.dtypes)}"
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert h(g) == h(w), "hash mismatch"
    print(f"OK    simhash pairs from verified sigs ({len(g)} rows)", flush=True)
    con.close()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "siga" and len(sys.argv) in (5, 6):
        sf, sigdir, n = sys.argv[2], sys.argv[3], int(sys.argv[4])
        if len(sys.argv) == 6:
            stage_a(sf, sigdir, n, int(sys.argv[5]))
        else:
            for k in range(n):
                stage_a(sf, sigdir, n, k)
    elif mode == "pairs" and len(sys.argv) in (4, 5):
        stage_b(sys.argv[2], sys.argv[3],
                int(sys.argv[4]) if len(sys.argv) == 5 else 6)
    else:
        sys.exit(__doc__)
