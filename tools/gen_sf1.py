#!/usr/bin/env python3
"""Scale sf0.1 testdata 10x into an sf1 directory (dev tool; the driver's
generator is not available locally). Copies preserve the properties the
gates rely on:

- region/nation: fixed dimensions, copied as-is;
- customer/supplier/part/orders/lineitem/events: keys offset per copy so
  referential structure holds (copy c's orders point at copy c's
  customers, etc.); event timestamps unchanged (10x density per window);
- documents: every token gets a copy-specific prefix, so within-copy
  dup/near-dup clusters are preserved while cross-copy shingle sets are
  disjoint (otherwise every doc would gain 9 near-duplicates and the
  quadratic dedup gates would not resemble real corpus scaling);
  n_chars recomputed from the perturbed text;
- embeddings: the vector is rotated by c positions — norm-preserving,
  direction-randomizing — so copies are not exact or near duplicates.

usage: gen_sf1.py <srcDir> <dstDir> [copies=10] [prefixLetter=k]

prefixLetter: the document token prefix is "<letter>{c}". Chained runs
(sf0.1→sf1→sf10→sf100) compose prefixes; with the SAME letter at every
step, distinct copy tuples can compose to the SAME prefix string (e.g.
step tuples (c,0) and (0,c) both yield "k{c}"), creating token-identical
copy pairs the minhash cross-check must model (check_minhash_sf10.py
handles the two-step collision classes). Giving each FURTHER step a fresh
letter (e.g. 'j' for the sf10→sf100 step) keeps new cross-step prefixes
distinct, so the step's exact near-dup pair set is exactly <copies>
disjoint shifted images of the source set (check_minhash_sf100.py).
"""
import sys

import duckdb

def main(src: str, dst: str, copies: int = 10, letter: str = "k") -> None:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW sf AS SELECT 1")  # placeholder
    import os
    os.makedirs(dst, exist_ok=True)

    # Small row groups matter: Spark parallelism on a single parquet file is
    # bounded by ROW GROUPS (a row group cannot split across tasks). duckdb's
    # default 122,880-row groups turn the 50k-row documents table into ONE
    # row group = one scan task, serializing every CPU-heavy text pipeline
    # no matter how many cores — observed as a 1-core, 10+-minute stall.
    RG = 4096

    def copy_as_is(table: str) -> None:
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{src}/{table}.parquet'))
            TO '{dst}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {RG})""")

    def scaled(table: str, select: str, order: str) -> None:
        parts = " UNION ALL ".join(
            f"SELECT {select.format(c=c)} FROM t" for c in range(copies))
        con.execute(f"""
            CREATE OR REPLACE VIEW t AS
            SELECT * FROM read_parquet('{src}/{table}.parquet')""")
        con.execute(f"""
            COPY ({parts} ORDER BY {order})
            TO '{dst}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {RG})""")

    def span(table: str, key: str) -> int:
        return con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]

    copy_as_is("region")
    copy_as_is("nation")

    C = span("customer", "c_custkey")
    S = span("supplier", "s_suppkey")
    P = span("part", "p_partkey")
    O = span("orders", "o_orderkey")
    E = span("events", "event_id")
    U = span("events", "user_id")
    D = span("documents", "doc_id")
    V = span("embeddings", "vec_id")

    scaled("customer",
           f"c_custkey + {{c}} * {C} AS c_custkey, * EXCLUDE (c_custkey)",
           "c_custkey")
    scaled("supplier",
           f"s_suppkey + {{c}} * {S} AS s_suppkey, * EXCLUDE (s_suppkey)",
           "s_suppkey")
    scaled("part",
           f"p_partkey + {{c}} * {P} AS p_partkey, * EXCLUDE (p_partkey)",
           "p_partkey")
    scaled("orders",
           f"o_orderkey + {{c}} * {O} AS o_orderkey, "
           f"o_custkey + {{c}} * {C} AS o_custkey, "
           "* EXCLUDE (o_orderkey, o_custkey)",
           "o_orderkey")
    scaled("lineitem",
           f"l_orderkey + {{c}} * {O} AS l_orderkey, "
           f"l_partkey + {{c}} * {P} AS l_partkey, "
           f"l_suppkey + {{c}} * {S} AS l_suppkey, "
           "* EXCLUDE (l_orderkey, l_partkey, l_suppkey)",
           "l_orderkey, l_linenumber")
    # events goes through pyarrow, not duckdb: ts precision must survive
    # the copy bit-for-bit. The driver has shipped ts as timestamp[ns]
    # (read as LongType via nanosAsLong; duckdb would truncate to us) and
    # as timestamp[us]; preserve whichever the source carries.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{src}/events.parquet")
    src_ts = str(ev.schema.field("ts").type)
    assert src_ts in ("timestamp[ns]", "timestamp[us]"), ev.schema
    pieces = []
    for c in range(copies):
        t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                          pc.add(ev["event_id"], c * E))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t["user_id"], c * U))
        pieces.append(t)
    out = pa.concat_tables(pieces).sort_by("event_id")
    pq.write_table(out, f"{dst}/events.parquet", row_group_size=RG * 4)
    assert str(pq.ParquetFile(f"{dst}/events.parquet")
               .schema_arrow.field("ts").type) == src_ts
    prefixed = ("regexp_replace(text, '([A-Za-z0-9'']+)', '"
                + letter + "{c}' || '\\1', 'g')")
    scaled("documents",
           f"doc_id + {{c}} * {D} AS doc_id, "
           "CASE WHEN {c} = 0 THEN text "
           "     ELSE " + prefixed + " "
           "END AS text, "
           "length(CASE WHEN {c} = 0 THEN text "
           "     ELSE " + prefixed + " "
           "END) AS n_chars, "
           "* EXCLUDE (doc_id, text, n_chars)",
           "doc_id")
    scaled("embeddings",
           f"vec_id + {{c}} * {V} AS vec_id, "
           "CASE WHEN {c} = 0 THEN embedding "
           "     ELSE embedding[({c}+1):] || embedding[1:{c}] END AS embedding, "
           "* EXCLUDE (vec_id, embedding)",
           "vec_id")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")

if __name__ == "__main__":
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    letter = sys.argv[4] if len(sys.argv) > 4 else "k"
    main(sys.argv[1], sys.argv[2], copies, letter)
