package graft.ml

/** Generates DuckDB oracle SQL for the gates whose signatures are built
  * from xxhash64(seed=42) token hashes (Spark's `XXH64.hashUnsafeBytes`,
  * the function behind `xxhash64()`), which DuckDB has no builtin for.
  *
  * The oracle re-implements XXH64 in pure SQL over HUGEINT (128-bit)
  * arithmetic: 64-bit wraparound multiply is split into 32-bit halves so
  * intermediates stay under 2^97, rotations become multiply-mod + divide,
  * and the byte stream is the ASCII token (the tokenizer `[^a-z0-9']+`
  * guarantees single-byte chars). Only the short-input path (len < 32
  * bytes: 8-byte rounds, one 4-byte round, tail bytes, avalanche) is
  * generated; the 32-byte stripe path is unreachable because tokens are
  * single words (observed max 8 chars). Cross-checked value-for-value
  * against Spark's xxhash64 and the full gate outputs at sf0.001/sf0.01.
  *
  * This object exists so the ~80-line SQL strings are assembled from named
  * combinators instead of being opaque blobs in [[DedupOps]]/[[TextOps]].
  */
private[ml] object SimhashOracle {

  private val M = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  /** (a*b) mod 2^64 without overflowing HUGEINT. */
  private def mul(a: String, b: String): String =
    s"(((($a)//4294967296)*($b)%4294967296)*4294967296 + (($a)%4294967296)*($b)) % $M"

  private def rotl(x: String, r: Int): String =
    s"((($x)*${1L << r}) % $M + ($x)//${1L << (64 - r)})"

  private def xor(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** One XXH64 8-byte round folded into the running hash `h`. */
  private val step8 =
    s"((${mul(rotl(xor("h", mul(rotl(mul("v", P2), 31), P1)), 27), P1)}) + $P4) % $M"

  /** One XXH64 tail-byte round. */
  private val stepB = mul(rotl(xor("h", s"(c * $P5) % $M"), 11), P1)

  /** Little-endian word from the 1-based byte list `b`. */
  private def word(offExpr: String, bytes: Int): String =
    (0 until bytes).map(m => s"b[$offExpr+${m + 1}]*${1L << (8 * m)}::HUGEINT").mkString(" + ")

  // avalanche: h ^= h>>33; h *= P2; h ^= h>>29; h *= P3; h ^= h>>32
  private val av1 = mul(xor("h4", "h4 // 8589934592"), P2)
  private val av2 = mul(s"xor($av1, ($av1) // 536870912)", P3)
  private val avFinal = s"xor($av2, ($av2) // 4294967296)"

  /** CTE chain shared by both oracles: tokenize `documents` (keeping
    * duplicates and order) and hash each distinct token with XXH64.
    * Exposes `dt(doc_id, t, i)` and `th(t, uh HUGEINT unsigned, hs BIGINT
    * signed)`.
    */
  private val tokenHashCtes = s"""
    dt AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS i
        FROM (SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0) AS l
              FROM documents)),
      tb AS (SELECT t, length(t) AS n,
          list_transform(range(1, length(t)+1), i -> ascii(substr(t, i, 1))::HUGEINT) AS b
        FROM (SELECT DISTINCT t FROM dt)),
      s1 AS (SELECT t, n, b, 8*(n//8) AS off,
          list_reduce(list_prepend((2870177450012600303::HUGEINT + n) % $M,
            list_transform(range(0, n//8), k -> ${word("8*k", 8)})),
            (h, v) -> $step8) AS h2
        FROM tb),
      s2 AS (SELECT t, n, b, off,
          CASE WHEN n - off >= 4
            THEN (${mul(rotl(xor("h2", mul(s"(${word("off", 4)})", P1)), 23), P2)} + $P3) % $M
            ELSE h2 END AS h3,
          off + CASE WHEN n - off >= 4 THEN 4 ELSE 0 END AS tstart
        FROM s1),
      s3 AS (SELECT t,
          list_reduce(list_prepend(h3, b[tstart+1:n]), (h, c) -> $stepB) AS h4
        FROM s2),
      th AS (SELECT t, $avFinal AS uh,
          (CASE WHEN $avFinal >= 9223372036854775808 THEN $avFinal - $M
                ELSE $avFinal END)::BIGINT AS hs
        FROM s3)"""

  private val pows = (0 until 64).map(j => s"($j, ${BigInt(1) << j}::HUGEINT)").mkString(", ")

  /** Per-doc bit votes → 64-bit signature: the `sg(doc_id, usig, sig)`
    * CTE chain shared by the pair oracle and the signature-stage oracle.
    */
  private val sigCtes = s"""$tokenHashCtes,
      pw(j, p) AS (VALUES $pows),
      votes AS (SELECT dt.doc_id, pw.j,
          sum(CASE WHEN (th.uh // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
        FROM dt JOIN th USING (t) CROSS JOIN pw
        GROUP BY dt.doc_id, pw.j),
      sg AS (SELECT doc_id, usig,
          (CASE WHEN usig >= 9223372036854775808 THEN usig - $M ELSE usig END)::BIGINT AS sig
        FROM (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS usig
              FROM votes JOIN pw USING (j) GROUP BY doc_id))"""

  /** Signature-stage oracle: `(doc_id, sig)` per document. Row-per-doc, so
    * a doc_id-modulus chunk over a filtered `documents` view is an exact
    * partition of the full check — unlike [[sql]]'s pair output, where a
    * row depends on TWO docs and modulus slices are invalid (the r10 sf100
    * campaign's methodological dead end). Big-sf verification runs this
    * chunked, then re-derives the pairs from the verified signatures with
    * cheap BIGINT ops (tools/check_simhash_sf100_v2.py stage B).
    */
  def sigSql: String = s"""
    WITH $sigCtes
    SELECT doc_id, sig FROM sg"""

  /** q_dedup_simhash oracle: per-doc bit votes → 64-bit signature →
    * 4×16-bit block candidates → hamming ≤ maxHamming. Mirrors
    * [[DedupOps.simhashPairs]] stage for stage.
    */
  def sql(maxHamming: Int): String = s"""
    WITH $sigCtes,
      ch AS (SELECT doc_id, sig, blk, ((usig // CASE blk WHEN 0 THEN 1 WHEN 1 THEN 65536
            WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536)::BIGINT AS chunk
        FROM sg CROSS JOIN (SELECT unnest([0,1,2,3]) AS blk)),
      pr AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
          bit_count(xor(l.sig, r.sig))::INT AS hamming
        FROM ch l JOIN ch r ON l.blk = r.blk AND l.chunk = r.chunk AND l.doc_id < r.doc_id)
    SELECT a, b, hamming FROM pr WHERE hamming <= $maxHamming"""

  private val MP = "2305843009213693951" // Mersenne prime 2^61 - 1
  private val PK = "2305843009213693952" // 2^61, packing base for (h, pw)

  /** Signed-64 wraparound of an exact HUGEINT value (Java long overflow). */
  private def wrapSigned(u: String): String = {
    val nn = s"((($u) % $M) + $M) % $M"
    s"(CASE WHEN $nn >= 9223372036854775808 THEN $nn - $M ELSE $nn END)"
  }

  /** Spark `pmod(x, 2^61-1)`; DuckDB's % is C-style like Java's. */
  private def pmod(s: String): String =
    s"(CASE WHEN ($s) % $MP < 0 THEN ($s) % $MP + $MP ELSE ($s) % $MP END)"

  /** q_rolling_fingerprint oracle: the order-sensitive polynomial rolling
    * hash (functions.rollingHash): fold h = pmod(h + xxh64(tok)*pw, p),
    * pw = pmod(pw*1000003, p) — with Java long wraparound before each pmod,
    * exactly as Spark executes it with ANSI off. The (h, pw) accumulator
    * packs into one HUGEINT as h*2^61 + pw so list_reduce needs no struct.
    */
  def rollingFpSql: String = {
    val nh = pmod(wrapSigned(s"acc // $PK + x * (acc % $PK)"))
    val npw = pmod(wrapSigned(s"(acc % $PK) * 1000003"))
    s"""
    WITH $tokenHashCtes,
      hl AS (SELECT dt.doc_id, list(th.hs ORDER BY dt.i) AS hs
          FROM dt JOIN th USING (t) GROUP BY dt.doc_id),
      fp AS (SELECT doc_id,
          list_reduce(list_prepend(1::HUGEINT, hs), (acc, x) -> ($nh) * $PK + ($npw)) AS packed
        FROM hl)
    SELECT doc_id, (packed // $PK)::BIGINT AS rfp FROM fp"""
  }
}
