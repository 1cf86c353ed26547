#!/usr/bin/env python3
"""Memory-bounded sf100 oracle for the span-dedup gates (q_span_dedup,
q_clean_pipeline), whose one-shot DuckDB oracle OOMs at sf100: the
450M-row span table with string keys cannot window/group in memory.

The check is the SAME oracle semantics evaluated in two exactly-
partitionable passes (one fresh process per chunk, per the campaign
discipline):

  pass 1 "dropped":  the survivor analysis groups spans by EQUALITY, so
     it partitions exactly by any pure function of the span string —
     chunk by md5-prefix bucket (deterministic across processes, unlike
     a possibly-seeded hash()); each chunk re-derives the span table
     from `documents`, keeps only its bucket's span classes, computes
     survivors (min (doc_id,pos), order-isomorphic BIGINT key) and
     writes that bucket's dropped (doc_id, pos) set to parquet.
     A (doc,pos) may be dropped by span classes in different buckets —
     duplicates across chunk files are harmless under pass 2's
     NOT EXISTS.

  pass 2 "verify":   reassembly is row-per-doc given the global dropped
     set, so it partitions exactly by doc_id modulus — each chunk
     re-derives its docs' token streams, anti-joins the UNION of pass-1
     parquets, reassembles, and canon+hash-compares against the gate
     dump slice (check_oracle's exact comparator).

usage:
  check_span_sf100.py dropped <sfDir> <workDir> <gate> <M> <m>
  check_span_sf100.py verify  <sfDir> <dumpDir> <workDir> <gate> <N> <n>

gate ∈ {q_span_dedup, q_clean_pipeline} — selects the docs derivation
(identity, or the full cleaning chain mirroring CleanOps.cleanChain).
"""
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check_oracle import canon, h  # noqa: E402

K = 8  # spanK in ml/CleanOps.scala

# docs CTE per gate, over a `documents` view (doc_id, text, ...).
# q_clean_pipeline mirrors CleanOps.cleanChain + its synth plant verbatim
# (see CleanOps.scala — kept in lockstep with the gate's oracle SQL).
DOCS_SQL = {
    "q_span_dedup": "SELECT doc_id, text FROM documents",
    "q_clean_pipeline": r"""
        SELECT doc_id,
               lower(trim(regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       nfc_normalize(
                         trim(regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               regexp_replace(
                                 regexp_replace(
                                   regexp_replace(
                                     regexp_replace(
                                       regexp_replace(
                                         regexp_replace(synth, '(?is)<script(?:[^>"'']|"[^"]*"|''[^'']*'')*>.*?</script>', '', 'g'),
                                         '(?is)<style(?:[^>"'']|"[^"]*"|''[^'']*'')*>.*?</style>', '', 'g'),
                                       '(?s)<!--.*?-->', '', 'g'),
                                     '(?is)<!\[CDATA\[.*?\]\]>', '', 'g'),
                                   '<(?:[^>"'']|"[^"]*"|''[^'']*'')+>', ' ', 'g'),
                                 '&lt;', '<', 'g'),
                               '&gt;', '>', 'g'),
                             '&amp;', '&', 'g'),
                           '\s+', ' ', 'g'))),
                       'https?://[^\s]+', '<URL>', 'g'),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\b\d{6,}\b', '<NUM>', 'g'),
                 '\s+', ' ', 'g'))) AS text
        FROM (SELECT doc_id,
                     '<html><body><!-- boiler: nav/footer --><![CDATA[c&d]]>' ||
                     '<div data-x=''1 > 2'' class="big">hdr</div><p>' || text ||
                     ' cafe' || chr(769) || ' contact user' || doc_id ||
                     '@mail.example.com or https://ex.org/d/' || doc_id ||
                     ' &amp; id ' || CAST(doc_id * 9000077 + 5000000 AS BIGINT) ||
                     '</p><script>x()</script></body></html>' AS synth
              FROM documents)""",
}

SPAN_CTES = f"""
    t AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                             x -> len(x) > 0) AS toks
          FROM docs),
    spans AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+least({K}, len(toks))-1], ' ') AS span,
                     least({K}, len(toks)) AS w
              FROM t,
                   unnest(CASE WHEN len(toks) <= {K} THEN [1]
                               ELSE range(1, len(toks) - {K} + 2) END) AS u(i))"""


def connect(sf, doc_where=""):
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    # PER-PROCESS spill dir: two concurrent DuckDBs sharing one
    # temp_directory clobber each other's duckdb_temp_storage-*.tmp files
    # (observed: IOException 'could not read enough bytes from temp
    # storage' in one process, SIGSEGV in the other — very plausibly the
    # true cause of the 'box mmap flake' episodes whenever two campaign
    # checkers were co-resident)
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    # explicit budget: campaign processes share the box — without a
    # limit DuckDB asks the OS for more than is free and dies with
    # 'bad allocation' instead of spilling (GRAFT_DUCK_MEM to override)
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '20GB')}'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet'){doc_where}")
    return con


def dropped(sf, work, gate, big_m, m):
    con = connect(sf)
    con.execute(f"""
        COPY (
          WITH docs AS ({DOCS_SQL[gate]}), {SPAN_CTES},
          mine AS (SELECT * FROM spans
                   WHERE ('0x' || substr(md5(span), 1, 8))::UBIGINT % {big_m} = {m}),
          agg AS (SELECT span, count(*) AS occ,
                         min(doc_id * 4294967296 + pos) AS mink
                  FROM mine GROUP BY span)
          SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
          FROM (SELECT mi.doc_id, unnest(range(mi.pos, mi.pos + mi.w)) AS p
                FROM mine mi JOIN agg USING (span)
                WHERE agg.occ > 1
                  AND mi.doc_id * 4294967296 + mi.pos <> agg.mink)
        ) TO '{work}/dropped_{gate}_{m}.parquet.tmp{os.getpid()}' (FORMAT PARQUET)""")
    # write-then-rename: DuckDB COPY creates its target eagerly, so a
    # crashed chunk (the box's documented transient SIGSEGV/mmap flakes)
    # would otherwise leave a 0-byte/partial file that the campaign
    # script's resume check mistakes for a finished bucket
    os.replace(f"{work}/dropped_{gate}_{m}.parquet.tmp{os.getpid()}",
                f"{work}/dropped_{gate}_{m}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{work}/dropped_{gate}_{m}.parquet')"
    ).fetchone()[0]
    print(f"OK    {gate} dropped bucket {m}/{big_m} ({n} positions)")


def verify(sf, dump, work, gate, big_n, n):
    # the comparison is a DuckDB multiset equality (EXCEPT ALL both ways,
    # the check_etl_fuzz_duckdb.py precedent), NOT the pandas canon+hash:
    # materializing a 625k-row long-string frame into pandas proved flaky
    # at sf100 (transient mmap/bad-alloc failures), while EXCEPT ALL stays
    # inside DuckDB's spillable operators and is a stronger check anyway.
    con = connect(sf, f" WHERE doc_id % {big_n} = {n}")
    # reassembly is ROW-LOCAL list filtering (no 34M-row token explode, no
    # ordered string_agg — DuckDB's ordered-aggregate memory ballooned past
    # any budget on some sf100 chunks): per doc, drop the positions in its
    # dropped-list and join the survivors
    want_cte = f"""
        WITH docs AS ({DOCS_SQL[gate]}), {SPAN_CTES},
        dropped AS (SELECT doc_id, pos
                    FROM read_parquet('{work}/dropped_{gate}_*.parquet')
                    WHERE doc_id % {big_n} = {n}),
        d AS (SELECT doc_id, list(pos) AS dl FROM dropped GROUP BY doc_id),
        k AS (SELECT t.doc_id, len(t.toks) AS n_total,
                     list_filter(list_transform(range(1, len(t.toks) + 1),
                       i -> CASE WHEN d.dl IS NOT NULL AND list_contains(d.dl, i - 1)
                                 THEN NULL ELSE t.toks[i] END),
                       x -> x IS NOT NULL) AS kl
              FROM t LEFT JOIN d USING (doc_id))
        SELECT doc_id,
               coalesce(array_to_string(kl, ' '), '') AS kept_text,
               CAST(len(kl) AS BIGINT) AS n_kept,
               CAST(n_total AS BIGINT) AS n_total
        FROM k"""
    got_sql = (f"SELECT doc_id, kept_text, n_kept, n_total "
               f"FROM read_parquet('{dump}/{gate}/*.parquet') "
               f"WHERE doc_id % {big_n} = {n}")
    con.execute(f"CREATE TEMP TABLE want AS {want_cte}")
    n_want = con.execute("SELECT count(*) FROM want").fetchone()[0]
    n_got = con.execute(f"SELECT count(*) FROM ({got_sql})").fetchone()[0]
    assert n_got == n_want, f"rows {n_got} vs {n_want}"
    diff = con.execute(f"""
        SELECT count(*) FROM (
          (SELECT * FROM ({got_sql}) EXCEPT ALL SELECT * FROM want)
          UNION ALL
          (SELECT * FROM want EXCEPT ALL SELECT * FROM ({got_sql})))""").fetchone()[0]
    assert diff == 0, f"{diff} multiset-differing rows"
    print(f"OK    {gate} verify chunk {n}/{big_n} ({n_got} rows, multiset-equal)")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "dropped":
        sf, work, gate, M, m = sys.argv[2:7]
        dropped(sf, work, gate, int(M), int(m))
    elif mode == "verify":
        sf, dump, work, gate, N, n = sys.argv[2:8]
        verify(sf, dump, work, gate, int(N), int(n))
    else:
        sys.exit(f"unknown mode {mode}")
