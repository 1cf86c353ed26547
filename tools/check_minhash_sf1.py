#!/usr/bin/env python3
"""Verify q_dedup_minhash at a gen_sf1-scaled sf WITHOUT the intractable
all-pairs oracle, using two independent checks:

1. SOUNDNESS (exact): every reported pair's true trigram-shingle jaccard is
   recomputed in DuckDB on just those pairs (linear in result size) and must
   equal the reported sim and clear the threshold.

2. COMPLETENESS (exact, by construction): gen_sf1 prefixes every token of
   copy c>0 with 'k{c}', a token BIJECTION per copy — within-copy shingle
   sets are isomorphic to the base corpus's, so within-copy jaccard (and
   therefore the exact pair set) is EXACTLY the base corpus's pair set
   shifted by c*D; cross-copy shingle sets are disjoint, so no cross-copy
   pair can reach any positive threshold. The expected sf1 pair set is
   therefore `copies` shifted images of the base oracle (computed at base
   sf, where all-pairs IS tractable) — compared pair-for-pair, sim-for-sim.

A miss in check 2 is an LSH recall miss on a prefixed copy (candidate
banding is hash-dependent, so recall on copies is not logically implied by
recall on the base corpus) — reported distinctly from a wrong sim or a
spurious pair, which would be engine bugs.

usage: check_minhash_sf1.py <baseSfDir> <sf1Dir> <verifyOutDir>
                            [copies=10] [D=5000] [thr=0.5]
"""
import sys
import duckdb
import pandas as pd

GRAMS = """
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
           ELSE list_transform(generate_series(1, len(w) - 2),
                  i -> array_to_string(w[i:i+2], ' ')) END) AS grams
  FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                      x -> len(x) > 0) AS w
        FROM read_parquet('{docs}') {where})
"""

def main(base, sf1, out, copies, d_span, thr):
    con = duckdb.connect()
    got = pd.read_parquet(f"{out}/q_dedup_minhash").sort_values(["a", "b"])
    con.register("rp", got)
    print(f"sf1 result: {len(got)} pairs")

    # -- check 1: soundness of every reported pair against the sf1 text ----
    g = GRAMS.format(docs=f"{sf1}/documents.parquet",
                     where="WHERE doc_id IN (SELECT a FROM rp UNION SELECT b FROM rp)")
    sound = con.execute(f"""
        WITH g AS ({g})
        SELECT rp.a, rp.b, rp.sim,
               floor((CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
                      len(list_distinct(ga.grams || gb.grams))) * 10000 + 0.5) / 10000 AS truth
        FROM rp JOIN g ga ON ga.doc_id = rp.a JOIN g gb ON gb.doc_id = rp.b""").df()
    bad = sound[(sound.sim != sound.truth) | (sound.truth < thr)]
    print(f"soundness: {len(sound) - len(bad)}/{len(got)} reported pairs exact"
          f" (sim == true jaccard >= {thr})")
    if len(bad):
        print(bad.head(10).to_string())

    # -- check 2: completeness vs the shifted base oracle ------------------
    g0 = GRAMS.format(docs=f"{base}/documents.parquet", where="")
    base_pairs = con.execute(f"""
        WITH g AS ({g0}),
        p AS (SELECT l.doc_id AS a, r.doc_id AS b,
                     CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
                     len(list_distinct(l.grams || r.grams)) AS rawsim
              FROM g l JOIN g r ON l.doc_id < r.doc_id)
        SELECT a, b, floor(rawsim * 10000 + 0.5) / 10000 AS sim
        FROM p WHERE rawsim >= {thr}""").df()
    print(f"base oracle: {len(base_pairs)} pairs; "
          f"sim range [{base_pairs.sim.min()}, {base_pairs.sim.max()}]")
    expect = pd.concat(
        [base_pairs.assign(a=base_pairs.a + c * d_span, b=base_pairs.b + c * d_span)
         for c in range(copies)]).sort_values(["a", "b"]).reset_index(drop=True)
    gk = set(map(tuple, got[["a", "b"]].values.tolist()))
    ek = set(map(tuple, expect[["a", "b"]].values.tolist()))
    extra, missing = gk - ek, ek - gk
    m = got.merge(expect, on=["a", "b"], suffixes=("_got", "_exp"))
    sim_bad = m[m.sim_got != m.sim_exp]
    print(f"completeness: expected {len(ek)} pairs ({copies} shifted copies),"
          f" got {len(gk)}; missing={len(missing)} (LSH recall misses),"
          f" extra={len(extra)}, sim mismatches={len(sim_bad)}")
    for t, s in (("missing", missing), ("extra", extra)):
        for p in sorted(s)[:5]:
            print(f"  {t}: {p}")
    if len(sim_bad):
        print(sim_bad.head(10).to_string())
    sound_ok = len(bad) == 0 and len(extra) == 0 and len(sim_bad) == 0
    if sound_ok and not missing:
        print("PASS")
    elif sound_ok:
        print(f"PASS (soundness+precision; recall {1 - len(missing)/max(1, len(ek)):.4f})")
    else:
        print("FAIL")
    sys.exit(0 if sound_ok else 1)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 10,
         int(sys.argv[5]) if len(sys.argv) > 5 else 5000,
         float(sys.argv[6]) if len(sys.argv) > 6 else 0.5)
