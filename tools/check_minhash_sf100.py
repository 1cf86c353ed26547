#!/usr/bin/env python3
"""Verify q_dedup_minhash at the THREE-STEP-scaled sf100 (gen_sf1.py
applied sf0.1→sf1→sf10 with prefix letter 'k', then sf10→sf100 with
prefix letter 'j') without the intractable all-pairs oracle.

Construction: the sf10→sf100 step prefixes every token of copy c3>0 with
"j{c3}". Since no earlier step used 'j', all ten step-3 images have
pairwise-disjoint shingle sets — there are NO cross-image near-dup pairs
(unlike the k/k collision classes inside the sf10 corpus, which
check_minhash_sf10.py models). Therefore the exact sf100 pair set is
precisely TEN disjoint shifted images of the exact sf10 pair set, and the
sf10 set is the two-step construction from the base (sf0.1) oracle:

  E_sf10  = 100 shifted images of the base all-pairs oracle
          + for c in 1..9 the (c, 10c) collision-class cross pairs
  E_sf100 = union over c3 in 0..9 of (E_sf10 + c3 * 100 * D)

Checks, same discipline as the sf1/sf10 scripts:
  1. soundness — every reported pair's jaccard recomputed exactly on the
     actual sf100 text (catches any generator or construction drift
     independently of the expected-set derivation below);
  2. completeness — reported set vs E_sf100: zero extra, zero sim
     mismatches required; missing pairs are LSH recall misses, reported
     as a recall figure.

usage: check_minhash_sf100.py <baseSfDir> <sf100Dir> <verifyOutDir>
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


def expected_sf10(con, base, d_span, thr):
    """The exact sf10 pair set from the base oracle (the
    check_minhash_sf10.py construction, returned instead of compared)."""
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
        f"SELECT count(*) FROM read_parquet('{base}/documents.parquet')"
    ).fetchone()[0]
    print(f"base oracle: {len(base_pairs)} pairs over {n_docs} docs")
    pieces = [base_pairs.assign(a=base_pairs.a + c * d_span,
                                b=base_pairs.b + c * d_span)
              for c in range(100)]
    for c in range(1, 10):
        o1, o2 = c * d_span, 10 * c * d_span
        ids = pd.DataFrame({"a": range(n_docs)})
        pieces.append(pd.DataFrame(
            {"a": ids.a + o1, "b": ids.a + o2, "sim": 1.0}))
        pieces.append(pd.DataFrame(
            {"a": base_pairs.a + o1, "b": base_pairs.b + o2,
             "sim": base_pairs.sim}))
        pieces.append(pd.DataFrame(
            {"a": base_pairs.b + o1, "b": base_pairs.a + o2,
             "sim": base_pairs.sim}))
    return pd.concat(pieces).reset_index(drop=True)


def main(base, sf100, out, d_span, thr):
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    got = pd.read_parquet(f"{out}/q_dedup_minhash").sort_values(["a", "b"])
    con.register("rp", got)
    print(f"sf100 result: {len(got)} pairs")

    # -- check 1: soundness of every reported pair on the sf100 text -----
    g = GRAMS.format(
        docs=f"{sf100}/documents.parquet",
        where="WHERE doc_id IN (SELECT a FROM rp UNION SELECT b FROM rp)")
    sound = con.execute(f"""
        WITH g AS ({g})
        SELECT rp.a, rp.b, rp.sim,
               floor((CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) /
                      len(list_distinct(ga.grams || gb.grams))) * 10000 + 0.5)
                 / 10000 AS truth
        FROM rp JOIN g ga ON ga.doc_id = rp.a
                JOIN g gb ON gb.doc_id = rp.b""").df()
    bad = sound[(sound.sim != sound.truth) | (sound.truth < thr)]
    print(f"soundness: {len(sound) - len(bad)}/{len(got)} reported pairs"
          f" exact (sim == true jaccard >= {thr})")
    if len(bad):
        print(bad.head(10).to_string())

    # -- check 2: completeness vs ten disjoint images of the sf10 set ----
    e10 = expected_sf10(con, base, d_span, thr)
    d10 = 100 * d_span
    expect = pd.concat(
        [e10.assign(a=e10.a + c3 * d10, b=e10.b + c3 * d10)
         for c3 in range(10)]).reset_index(drop=True)

    gk = set(map(tuple, got[["a", "b"]].values.tolist()))
    ek = set(map(tuple, expect[["a", "b"]].values.tolist()))
    extra, missing = gk - ek, ek - gk
    m = got.merge(expect, on=["a", "b"], suffixes=("_got", "_exp"))
    sim_bad = m[m.sim_got != m.sim_exp]
    print(f"completeness: expected {len(ek)} pairs (10 j-images of the"
          f" sf10 construction), got {len(gk)}; missing={len(missing)}"
          f" (LSH recall misses), extra={len(extra)},"
          f" sim mismatches={len(sim_bad)}")
    for t, s in (("missing", missing), ("extra", extra)):
        for p in sorted(s)[:5]:
            print(f"  {t}: {p}")
    if len(sim_bad):
        print(sim_bad.head(10).to_string())
    sound_ok = len(bad) == 0 and len(extra) == 0 and len(sim_bad) == 0
    if sound_ok and not missing:
        print("PASS")
    elif sound_ok:
        print(f"PASS (soundness+precision; recall"
              f" {1 - len(missing)/max(1, len(ek)):.5f})")
    else:
        print("FAIL")
    sys.exit(0 if sound_ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 5000,
         float(sys.argv[5]) if len(sys.argv) > 5 else 0.5)
