#!/usr/bin/env python3
"""Build the SAMPLED sub-corpus for the quadratic-gate sf100 verification
(q_ngram_jaccard, q_dedup_embed / _cluster / _keep — the four gates whose
WORK is quadratic within blocks and therefore bounded-corpus by contract).

Validity: each of these gates is RESTRICTION-CLOSED within its blocking
keys — the output over any doc/vector subset equals the full output
intersected with subset×subset (pairs are pure functions of their two
members; cluster/keep are functions of the restricted pair graph, which
the oracle recomputes over the SAME restriction). So engine-vs-oracle
equality on a sampled sub-corpus exactly verifies the engine's pair /
CC / keeper semantics at the sf100 rung's data (real sf100 rows, real
prefix structure), with cost quadratic only in the SAMPLE.

Two ingredients written here:
 1. hash-sampled documents + embeddings parquet (plus symlinks for the
    other tables) — a directory graft.Verify can run against;
 2. PLANTED POSITIVES: pairs from the ORACLE-VERIFIED small rungs mapped
    through the generator's copy isomorphism —
      - ngram: sf1 pairs (trigram jaccard is invariant under the
        per-copy token-prefix bijection, and integer-ratio sims are
        exact), image ids = doc_id + m*50000, m in [0,100);
      - embed: sf0.1 pairs (coordinate rotation preserves dot/norms up
        to float summation order), image ids = vec_id + m*2000,
        m in [0,1000) — checked with a 1e-4 sim tolerance.
    Both endpoints of every planted image join the sample, so the
    planted pairs must surface in the engine dump (completeness
    evidence independent of the sampling).

usage: make_sample_sf100.py <sf100Dir> <sf0.1Dir> <sf1Dir> <outDir> <plantedJson>
         [docRate=100] [vecRate=100] [nPlant=120]
"""
import json
import os
import sys

import duckdb


def main(sf100, sf01, sf1, out, planted_json,
         doc_rate=100, vec_rate=100, n_plant=120):
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    os.makedirs(out, exist_ok=True)

    # ---- planted ngram positives from the oracle-verified sf1 rung ----
    print("[sample] computing sf1 ngram-jaccard oracle pairs ...")
    con.execute(f"""
        CREATE TABLE sf1_pairs AS
        WITH d AS (
          SELECT doc_id, lang, source,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                             x -> len(x) > 0) AS w
          FROM read_parquet('{sf1}/documents.parquet')),
        g AS (
          SELECT doc_id, lang, source,
                 list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')]
                   ELSE list_transform(generate_series(1, len(w) - 2),
                          i -> array_to_string(w[i:i+2], ' ')) END) AS grams
          FROM d),
        p AS (
          SELECT l.doc_id AS a, r.doc_id AS b,
                 floor((CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
                        len(list_distinct(l.grams || r.grams))) * 10000 + 0.5)
                   / 10000 AS sim
          FROM g l JOIN g r
            ON l.lang = r.lang AND l.source = r.source AND l.doc_id < r.doc_id)
        SELECT a, b, sim FROM p WHERE sim >= 0.3""")
    n1, = con.execute("SELECT count(*) FROM sf1_pairs").fetchone()
    print(f"[sample] sf1 oracle pairs: {n1}")
    doc_ms = [7, 63]
    plant_ngram = con.execute(f"""
        SELECT a + m * 50000, b + m * 50000, sim
        FROM (SELECT * FROM sf1_pairs
              ORDER BY md5(CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR))
              LIMIT {n_plant}),
             (SELECT unnest({doc_ms}) AS m)""").fetchall()

    # ---- planted embed positives from the sf0.1 rung ------------------
    print("[sample] computing sf0.1 embed-pair set ...")
    con.execute(f"""
        CREATE TABLE sf01_pairs AS
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM read_parquet('{sf01}/embeddings.parquet'))
        SELECT a.vec_id AS a, b.vec_id AS b,
               floor(list_cosine_similarity(a.v, b.v) * 10000 + 0.5) / 10000 AS sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.v, b.v) * 10000 + 0.5) / 10000 >= 0.3505""")
    n2, = con.execute("SELECT count(*) FROM sf01_pairs").fetchone()
    print(f"[sample] sf0.1 embed pairs (sim >= 0.3505): {n2}")
    vec_ms = [17, 423, 911]
    plant_embed = con.execute(f"""
        SELECT a + m * 2000, b + m * 2000, sim
        FROM (SELECT * FROM sf01_pairs
              ORDER BY md5(CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR))
              LIMIT {n_plant}),
             (SELECT unnest({vec_ms}) AS m)""").fetchall()

    # ---- sampled + planted id sets ------------------------------------
    plant_doc_ids = sorted({i for p in plant_ngram for i in (p[0], p[1])})
    plant_vec_ids = sorted({i for p in plant_embed for i in (p[0], p[1])})
    con.execute(f"CREATE TABLE pdoc AS SELECT unnest({plant_doc_ids}) AS id")
    con.execute(f"CREATE TABLE pvec AS SELECT unnest({plant_vec_ids}) AS id")

    print("[sample] writing sampled embeddings ...")
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{sf100}/embeddings.parquet')
              WHERE hash(vec_id) % {vec_rate} = 0
                 OR vec_id IN (SELECT id FROM pvec))
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    nv, = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()

    print("[sample] writing sampled documents ...")
    # include doc rows for every sampled VECTOR id too, so q_dedup_keep's
    # n_chars join is populated on the sample
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{sf100}/documents.parquet')
              WHERE hash(doc_id) % {doc_rate} = 0
                 OR doc_id IN (SELECT id FROM pdoc)
                 OR hash(doc_id) % {vec_rate} = 0 AND doc_id < 2000000
                 OR doc_id IN (SELECT id FROM pvec))
        TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    nd, = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()
    print(f"[sample] {nv} vectors, {nd} docs")

    # other tables: symlink the real sf100 files so Verify/check_oracle
    # table views resolve (these gates never read them)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{sf100}/{t}.parquet", dst)

    with open(planted_json, "w") as f:
        json.dump({
            "ngram": [{"a": a, "b": b, "sim": s} for a, b, s in plant_ngram],
            "embed": [{"a": a, "b": b, "sim": s} for a, b, s in plant_embed],
            "doc_ms": doc_ms, "vec_ms": vec_ms,
            "doc_rate": doc_rate, "vec_rate": vec_rate,
            "n_vectors": nv, "n_docs": nd,
        }, f)
    print(f"[sample] planted {len(plant_ngram)} ngram + {len(plant_embed)} embed "
          f"image pairs -> {planted_json}")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(a[0], a[1], a[2], a[3], a[4],
                  int(a[5]) if len(a) > 5 else 100,
                  int(a[6]) if len(a) > 6 else 100,
                  int(a[7]) if len(a) > 7 else 120))
