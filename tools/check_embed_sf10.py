#!/usr/bin/env python3
"""Scale-ladder verification for the embedding-pair gate family
(q_dedup_embed / q_dedup_cluster / q_dedup_keep) at sf levels where the
full DuckDB oracle is intractable — the oracle recomputes EVERY
label-blocked cosine (~2G pairs at sf10) before its recursive CTE, hours
single-threaded, so the driver-style hash compare cannot run.

What CAN be verified independently at scale:

1. q_dedup_embed SOUNDNESS — every reported pair's cosine is recomputed
   exactly (same stableRound formula) from the sf parquet and must meet
   the threshold and match the reported sim. Linear in the OUTPUT.
2. q_dedup_cluster / q_dedup_keep — DuckDB's recursive-CTE connected
   components and keeper ranking are recomputed over the REPORTED edge
   set and hash-compared against the Spark outputs. This independently
   verifies the CC/keeper computation (the part with distributed-
   iteration risk) on top of the soundness-checked edges; edge
   COMPLETENESS is the one term not covered (it would need the full
   quadratic scan — covered at sf0.01/sf0.1/sf1 by the driver gates).

usage: check_embed_sf10.py <sfDir> <verifyOutDir> [thr=0.35]
"""
import sys

import duckdb


def main(sf: str, out: str, thr: float = 0.35, cc_only: bool = False) -> int:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW emb AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
    for name in ("q_dedup_embed", "q_dedup_cluster", "q_dedup_keep"):
        con.execute(f"CREATE VIEW {name.lstrip('q_')} AS "
                    f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
    ok = True
    if cc_only:
        print("(soundness pass skipped by --cc-only: already verified)")

    # 1. soundness of every reported pair
    bad, n = (0, -1) if cc_only else con.execute("""
        SELECT count(*) FILTER (WHERE NOT good), count(*) FROM (
          SELECT p.sim = floor(list_cosine_similarity(
                   CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[]))
                   * 10000 + 0.5) / 10000
                 AND p.sim >= ? AND p.a < p.b
                 AND e1.label = e2.label AS good
          FROM dedup_embed p
          JOIN emb e1 ON e1.vec_id = p.a JOIN emb e2 ON e2.vec_id = p.b)
        """, [thr]).fetchone()
    print(f"{'OK' if not bad else 'FAIL':4s} q_dedup_embed soundness: "
          f"{n} pairs recomputed, {bad} bad")
    ok &= bad == 0

    # 2. CC + keepers over the reported edges, vs the Spark outputs.
    # The ≤sf1 checker used a recursive-CTE transitive closure, which is
    # O(component²) rows — at sf10 the 4.8M-edge graph OOMs it. Union-find
    # is linear and an INDEPENDENT implementation (plain Python, no Spark,
    # no SQL recursion); component label = min vec_id, same as the gate.
    import pandas as _pd
    edges = con.execute("SELECT a, b FROM dedup_embed").df()
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges["a"].to_numpy(), edges["b"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root = smaller id
    nodes = sorted(set(edges["a"]) | set(edges["b"]))
    cc_df = _pd.DataFrame({"vec_id": nodes,
                           "component": [find(int(u)) for u in nodes]})
    con.register("cc_py", cc_df)
    con.execute("CREATE TABLE cc AS SELECT CAST(vec_id AS BIGINT) AS vec_id, "
                "CAST(component AS BIGINT) AS component FROM cc_py")
    d1, = con.execute("""SELECT count(*) FROM (
        (SELECT * FROM cc EXCEPT SELECT * FROM dedup_cluster)
        UNION ALL (SELECT * FROM dedup_cluster EXCEPT SELECT * FROM cc))""").fetchone()
    nc, = con.execute("SELECT count(*) FROM cc").fetchone()
    print(f"{'OK' if not d1 else 'FAIL':4s} q_dedup_cluster: {nc} nodes, "
          f"{d1} rows differ from union-find CC over reported edges")
    ok &= d1 == 0

    # keeper = the largest-document member per component (n_chars desc, id
    # asc), exactly the gate's ranking
    cols = [r[0] for r in con.execute("DESCRIBE dedup_keep").fetchall()]
    keep_sql = f"""
        WITH ranked AS (
          SELECT cc.component, cc.vec_id AS id, d.n_chars AS q,
                 row_number() OVER (PARTITION BY cc.component
                   ORDER BY d.n_chars DESC, cc.vec_id ASC) AS rk
          FROM cc JOIN read_parquet('{sf}/documents.parquet') d
            ON d.doc_id = cc.vec_id)
        SELECT CAST(component AS BIGINT) AS component,
               CAST(id AS BIGINT) AS keep_id, CAST(q AS BIGINT) AS q
        FROM ranked WHERE rk = 1"""
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    d2, = con.execute(f"""SELECT count(*) FROM (
        (SELECT {sel} FROM ({keep_sql}) EXCEPT SELECT {sel} FROM dedup_keep)
        UNION ALL
        (SELECT {sel} FROM dedup_keep EXCEPT SELECT {sel} FROM ({keep_sql})))""").fetchone()
    print(f"{'OK' if not d2 else 'FAIL':4s} q_dedup_keep: {d2} rows differ "
          f"from keeper ranking over the same components")
    ok &= d2 == 0

    print("\nembed family:", "ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    args = sys.argv[1:]
    cc_only = "--cc-only" in args
    args = [a for a in args if a != "--cc-only"]
    sys.exit(main(args[0], args[1], float(args[2]) if len(args) > 2 else 0.35,
                  cc_only))
