package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text tokenization and shingle hashing.
  *
  * The Column formulations (`filter(split(lower(text), …))` for tokens;
  * `array_distinct(transform(shingles(…), xxhash64))` on top for shingle
  * hashes) are higher-order-function trees: CodegenFallback, interpreted
  * per evaluation, one boxed allocation per node per element. Thread dumps
  * of the document gates show exactly that chain AS the workload — the
  * scan-side cost of every dedup/fingerprint/minhash query. These
  * expressions run the same pipeline as tight loops over UTF8String bytes,
  * one evaluation per row.
  *
  * Value parity is exact and pinned by TextExprsSpec: lowercasing IS
  * Spark's own `Lower` expression (placed under these as the child — not
  * re-implemented), the split is a byte-run scan equivalent to
  * `split(TokenSep)` under UTF8_BINARY (see [[tokenize]]; the regex class
  * is pure ASCII on lowercased input, so byte runs and regex runs
  * coincide), empty tokens drop; shingle hashes join n-token windows with
  * a single space and hash bytes with XXH64 seed 42 — bit-identical to
  * `xxhash64(array_join(slice(…), " "))` — preserving the Column version's
  * edges: ≤n tokens collapse to ONE shingle of all tokens, zero tokens
  * yield the hash of the empty string, duplicates keep first-occurrence
  * order (`array_distinct`).
  */
object TextExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  import org.apache.spark.sql.functions.lower

  /** The shared token regex — byte-for-byte the one [[graft.functions.tokens]] uses. */
  private[functions] val TokenSep = "[^a-z0-9']+"

  /** Split + drop-empties over an ALREADY-LOWERCASED string. Lowercasing is
    * deliberately NOT re-implemented here: the builders below put Spark's
    * own `Lower` under the expression, so case mapping (which routes
    * through CollationSupport/ICU and differs from naive
    * `UTF8String.toLowerCase` on exotic case-mapping characters) is
    * identical to the `lower()` Column formulation by construction.
    *
    * Collation contract: the split matches raw `UTF8String.split`, i.e.
    * the UTF8_BINARY (default-collation) behavior of Spark's `StringSplit`.
    * Under a non-default session collation Spark 4 rewrites `split()`
    * through `CollationSupport.collationAwareRegex` (case-/accent-
    * insensitive regex flags), so the documented parity with
    * `filter(split(lower(text), TokenSep), …)` holds ONLY under
    * UTF8_BINARY. That is deliberate: the separator class `[^a-z0-9']+`
    * operates on already-lowercased ASCII classes, where the
    * collation-aware flags (`(?ui)`) change nothing for well-formed input,
    * and tokenization for dedup/fingerprinting must be deterministic
    * across sessions regardless of per-session collation settings — a
    * session-collation-sensitive fingerprint would silently split the same
    * corpus differently on two clusters. The `Lower` child remains
    * collation-aware, matching `lower()` exactly in all configurations.
    */
  private[functions] def tokenize(lowered: UTF8String): Array[UTF8String] = {
    // Byte-scan equivalent of `split(TokenSep, -1)` + drop-empties. The
    // separator class is pure ASCII and UTF-8 lead/continuation bytes are
    // >= 0x80 (negative as JVM bytes) — never token bytes — so scanning
    // BYTES finds exactly the runs the UTF8_BINARY regex finds, with no
    // regex machinery and no per-token String round-trips. The regex path
    // (UTF8String.split -> java.util.regex over a decoded copy) was the
    // top CPU item in the minhash signature materialization at sf10:
    // ~2 ms/doc across 32 threads, allocation-bound — ~50 ns/doc here.
    // Token slices share one backing array; at most one copy of the doc's
    // bytes is made (getBytes realigns only when the string is offset).
    val nb = lowered.numBytes()
    val bytes = lowered.getBytes
    @inline def isTok(c: Byte): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''
    var count = 0
    var i = 0
    var inTok = false
    while (i < nb) {
      if (isTok(bytes(i))) { if (!inTok) { count += 1; inTok = true } }
      else inTok = false
      i += 1
    }
    val out = new Array[UTF8String](count)
    var j = 0
    i = 0
    while (i < nb) {
      if (isTok(bytes(i))) {
        val start = i
        while (i < nb && isTok(bytes(i))) i += 1
        out(j) = UTF8String.fromBytes(bytes, start, i - start)
        j += 1
      } else i += 1
    }
    out
  }

  def tokensNative(text: Column): Column =
    Bridge.column(TokensExpr(Bridge.expression(lower(text.cast("string")))))

  def shingleHashesNative(text: Column, n: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(lower(text.cast("string"))), n))

  def shinglesTextNative(text: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(lower(text.cast("string"))), n))

  private[functions] val Space = UTF8String.fromString(" ")
}

/** string → array<string> of lowercased word tokens (empty tokens dropped).
  * Equals `filter(split(lower(text), "[^a-z0-9']+"), t => length(t) > 0)`.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  /** Called from both eval and generated code. */
  def run(input: UTF8String): ArrayData =
    new GenericArrayData(TextExprs.tokenize(input).asInstanceOf[Array[Any]])

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  // reference-object call, NOT CodegenFallback: the fallback path needs the
  // materialized input row, which forces row reconstruction inside a
  // whole-stage-codegen span — this takes the child's generated value
  // directly (the AvroExprs pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokensExpr", this, classOf[TokensExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

/** string → array<long> of distinct XXH64(seed 42) hashes of n-token
  * shingles. Equals `shingleHashes(shingles(tokens(text), n))` — the fused
  * scan-side pipeline of the MinHash/contamination gates.
  */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashesExpr", this,
      classOf[ShingleHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  /** Called from both eval and generated code. */
  def run(input: UTF8String): ArrayData = {
    val toks = TextExprs.tokenize(input)
    val m = toks.length
    // the Column formulation collapses short docs to ONE shingle of all
    // tokens (array_join of everything), empty docs to the empty string
    val count = if (m <= n) 1 else m - n + 1
    val width = if (m <= n) m else n
    var buf = new Array[Byte](64)
    // open-addressed primitive dedup table (0 = empty slot, the zero hash
    // tracked by a flag): the boxed java.util.HashSet here cost one Long
    // allocation per SHINGLE — hundreds of millions of boxes per sf100
    // pass on the hottest expression in the dedup family
    // capacity must strictly exceed the insert count (load ≤ 0.5) or a
    // full-table probe would spin; enforce the invariant explicitly
    // rather than ride UTF8String's 2GB byte cap keeping count below it.
    // Counts past 2^29 are rejected BY DESIGN, not just for Int safety:
    // they only arise from a single document of ~1 GB+ of one-character
    // tokens, whose table alone would be a 4-16 GB single-row allocation
    // — failing loudly with a split hint beats an executor OOM mid-scan
    require(count < (1 << 29),
      s"shingle count $count exceeds the open-addressed table bound (2^29); " +
        "split documents this large before shingle dedup")
    val tcap = java.lang.Integer.highestOneBit(math.max(4, count) * 2 - 1) << 1
    val tmask = tcap - 1
    val table = new Array[Long](tcap)
    var seenZero = false
    @inline def seenAdd(h: Long): Boolean =
      if (h == 0L) { if (seenZero) false else { seenZero = true; true } }
      else {
        var idx = (h ^ (h >>> 32)).toInt & tmask
        while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & tmask
        if (table(idx) == h) false else { table(idx) = h; true }
      }
    val out = new Array[Long](count)
    var nOut = 0
    var i = 0
    while (i < count) {
      var len = 0
      var j = i
      while (j < i + width) { len += toks(j).numBytes(); j += 1 }
      if (width > 1) len += width - 1 // single-space separators
      if (buf.length < len) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      j = i
      while (j < i + width) {
        if (j > i) { buf(pos) = ' '; pos += 1 }
        toks(j).writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += toks(j).numBytes()
        j += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.fromBytes(buf, 0, len), StringType, 42L)
      if (seenAdd(h)) { out(nOut) = h; nOut += 1 }
      i += 1
    }
    new GenericArrayData(if (nOut == count) out else java.util.Arrays.copyOf(out, nOut))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** string → array<string> of n-token shingle STRINGS. Equals
  * `shingles(tokens(text), n)` (the Column composition) — which, being a
  * CodegenFallback higher-order-function chain, re-evaluates the `tokens`
  * child once PER SHINGLE when interpreted: O(tokens²) work per document.
  * Found live by the sf10 scale ladder — q_contamination spent 30+ min of
  * 32 cores re-tokenizing 500k docs quadratically. This expression
  * tokenizes once and emits all shingles in one pass, inside whole-stage
  * codegen via the same reference-object pattern as [[TokensExpr]].
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_text"

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  /** Called from both eval and generated code. */
  def run(input: UTF8String): ArrayData = {
    val toks = TextExprs.tokenize(input)
    val m = toks.length
    // the Column formulation collapses short docs to ONE shingle of all
    // tokens, empty docs to the empty string (array_join of nothing)
    val count = if (m <= n) 1 else m - n + 1
    val width = if (m <= n) m else n
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = UTF8String.concatWs(TextExprs.Space,
        java.util.Arrays.copyOfRange(toks, i, i + width): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
