#!/usr/bin/env python3
"""Verify q_dedup_minhash at the TWO-STEP-scaled sf10 (gen_sf1.py applied
sf0.1→sf1→sf10) without the intractable all-pairs oracle.

Same two checks as check_minhash_sf1.py (soundness of every reported pair
recomputed exactly; completeness against a constructed expected pair set),
with one extra term in the construction. Two-step prefixing composes:
copy (c1, c2) of the base corpus carries token prefix "k{c2}k{c1}" (c1 =
step-1 copy, c2 = step-2 copy; an absent step contributes no prefix), and
the flat copy index is c = c1 + 10*c2 with span D. Composed prefixes are
pairwise distinct EXCEPT the nine collisions (c, 0) vs (0, c): copy c and
copy 10c apply the identical prefix "k{c}", so those two copies are
token-for-token IDENTICAL corpora. Therefore the exact sf10 pair set is:

  1. 100 shifted images of the base oracle's pair set (within-copy), plus
  2. for each c in 1..9, the cross-copy pairs between copies c and 10c:
     the identity pairs (x + cD, x + 10cD) at sim 1.0 for every base doc
     x, and both cross images (x + cD, y + 10cD), (y + cD, x + 10cD) of
     every base oracle pair (x, y) at its base sim.

All other cross-copy token sets are disjoint, so no other cross pair can
reach a positive threshold.

usage: check_minhash_sf10.py <baseSfDir> <sf10Dir> <verifyOutDir>
                             [D=5000] [thr=0.5]
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


def main(base, sf10, out, d_span, thr):
    con = duckdb.connect()
    got = pd.read_parquet(f"{out}/q_dedup_minhash").sort_values(["a", "b"])
    con.register("rp", got)
    print(f"sf10 result: {len(got)} pairs")

    # -- check 1: soundness of every reported pair against the sf10 text --
    g = GRAMS.format(docs=f"{sf10}/documents.parquet",
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

    # -- check 2: completeness vs the constructed expected set ------------
    g0 = GRAMS.format(docs=f"{base}/documents.parquet", where="")
    base_pairs = con.execute(f"""
        WITH g AS ({g0}),
        p AS (SELECT l.doc_id AS a, r.doc_id AS b,
                     CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
                     len(list_distinct(l.grams || r.grams)) AS rawsim
              FROM g l JOIN g r ON l.doc_id < r.doc_id)
        SELECT a, b, floor(rawsim * 10000 + 0.5) / 10000 AS sim
        FROM p WHERE rawsim >= {thr}""").df()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{base}/documents.parquet')").fetchone()[0]
    print(f"base oracle: {len(base_pairs)} pairs over {n_docs} docs")

    pieces = [base_pairs.assign(a=base_pairs.a + c * d_span,
                                b=base_pairs.b + c * d_span)
              for c in range(100)]
    for c in range(1, 10):
        o1, o2 = c * d_span, 10 * c * d_span
        # identity cross pairs: every base doc vs its twin, jaccard 1.0
        ids = pd.DataFrame({"a": range(n_docs)})
        pieces.append(pd.DataFrame(
            {"a": ids.a + o1, "b": ids.a + o2, "sim": 1.0}))
        # both cross images of every base near-dup pair (o1-side id is
        # always the smaller: o2 - o1 = 9cD dwarfs any base id)
        pieces.append(pd.DataFrame(
            {"a": base_pairs.a + o1, "b": base_pairs.b + o2,
             "sim": base_pairs.sim}))
        pieces.append(pd.DataFrame(
            {"a": base_pairs.b + o1, "b": base_pairs.a + o2,
             "sim": base_pairs.sim}))
    expect = pd.concat(pieces).sort_values(["a", "b"]).reset_index(drop=True)

    gk = set(map(tuple, got[["a", "b"]].values.tolist()))
    ek = set(map(tuple, expect[["a", "b"]].values.tolist()))
    extra, missing = gk - ek, ek - gk
    m = got.merge(expect, on=["a", "b"], suffixes=("_got", "_exp"))
    sim_bad = m[m.sim_got != m.sim_exp]
    print(f"completeness: expected {len(ek)} pairs (100 images + 9 collision"
          f" cross-sets), got {len(gk)}; missing={len(missing)}"
          f" (LSH recall misses), extra={len(extra)}, sim mismatches={len(sim_bad)}")
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
         int(sys.argv[4]) if len(sys.argv) > 4 else 5000,
         float(sys.argv[5]) if len(sys.argv) > 5 else 0.5)
