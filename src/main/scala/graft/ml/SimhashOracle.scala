package graft.ml

/** Generates the DuckDB oracle SQL for `q_dedup_simhash`.
  *
  * The gate's signature function is xxhash64(seed=42) per token (Spark's
  * `XXH64.hashUnsafeBytes`, the same function behind `xxhash64()`), which
  * DuckDB has no builtin for — so the oracle re-implements XXH64 in pure
  * SQL over HUGEINT (128-bit) arithmetic: 64-bit wraparound multiply is
  * split into 32-bit halves so intermediates stay under 2^97, rotations
  * become multiply-mod + divide, and the byte stream is the ASCII token
  * (the tokenizer `[^a-z0-9']+` guarantees single-byte chars).
  *
  * Only the short-input path (len < 32 bytes: 8-byte rounds, one 4-byte
  * round, tail bytes, avalanche) is generated; the 32-byte stripe path is
  * unreachable because tokens are single words (observed max 8 chars).
  * Cross-checked value-for-value against Spark's xxhash64 and the full
  * q_dedup_simhash pair set.
  *
  * This object exists so the ~80-line SQL string is assembled from named
  * combinators instead of being an opaque blob in [[DedupOps]].
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

  private val pows = (0 until 64).map(j => s"($j, ${BigInt(1) << j}::HUGEINT)").mkString(", ")

  /** Full oracle: tokenize → per-distinct-token XXH64 → per-doc bit votes →
    * 64-bit signature → 4×16-bit block candidates → hamming ≤ maxHamming.
    * Mirrors [[DedupOps.simhashPairs]] stage for stage.
    */
  def sql(maxHamming: Int): String = s"""
    WITH dt AS (SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> len(x) > 0)) AS t
        FROM documents),
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
      th AS (SELECT t, xor($av2, ($av2) // 4294967296) AS uh FROM s3),
      pw(j, p) AS (VALUES $pows),
      votes AS (SELECT dt.doc_id, pw.j,
          sum(CASE WHEN (th.uh // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
        FROM dt JOIN th USING (t) CROSS JOIN pw
        GROUP BY dt.doc_id, pw.j),
      sg AS (SELECT doc_id, usig,
          (CASE WHEN usig >= 9223372036854775808 THEN usig - $M ELSE usig END)::BIGINT AS sig
        FROM (SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END) AS usig
              FROM votes JOIN pw USING (j) GROUP BY doc_id)),
      ch AS (SELECT doc_id, sig, blk, ((usig // CASE blk WHEN 0 THEN 1 WHEN 1 THEN 65536
            WHEN 2 THEN 4294967296 ELSE 281474976710656 END) % 65536)::BIGINT AS chunk
        FROM sg CROSS JOIN (SELECT unnest([0,1,2,3]) AS blk)),
      pr AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
          bit_count(xor(l.sig, r.sig))::INT AS hamming
        FROM ch l JOIN ch r ON l.blk = r.blk AND l.chunk = r.chunk AND l.doc_id < r.doc_id)
    SELECT a, b, hamming FROM pr WHERE hamming <= $maxHamming"""
}
