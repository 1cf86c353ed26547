package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native match-COUNT expressions for the text-gate scan columns.
  *
  * The `size(regexp_extract_all(text, <pattern>, 0))` formulation runs
  * java.util.regex over a decoded UTF-16 copy of every row AND
  * materializes an array of every match (one UTF8String + one boxed slot
  * per match) just to take its length — at 100 TB the regex engine plus
  * that per-match garbage IS the text-family scan cost. Every pattern the
  * counting gates use is a fixed ASCII-class automaton (word runs,
  * letter/digit runs, a punctuation set, a whole-word stopword set, a CJK
  * codepoint range), so each count below is a single allocation-free pass
  * over the UTF8String BYTES.
  *
  * Value parity with the regex formulation is exact and pinned by
  * CountExprsSpec; the notes on each expression say why the byte scan and
  * the java.util.regex semantics coincide:
  *  - Java's `\w`/`\s` CLASSES are ASCII-only by default (no
  *    UNICODE_CHARACTER_CLASS), and UTF-8 continuation/lead bytes are
  *    ≥ 0x80 — never members of an ASCII class — so byte runs equal
  *    regex runs. (Java's `\b` BOUNDARY is the exception: Pattern's Bound
  *    node is Unicode-aware even without the flag — see
  *    [[WordSetCountExpr]] for the deliberate, oracle-matching divergence
  *    that implies);
  *  - negated classes (`[^A-Za-z0-9\s]`) match one CODE POINT; in UTF-8
  *    that is exactly one lead byte (continuation bytes are skipped);
  *  - alternation `[A-Za-z]+|[0-9]+|[^...]` is leftmost-greedy, which on
  *    disjoint classes is the same maximal-run scan.
  */
object CountExprs {

  /** Count of `\w+` matches — equals
    * `size(regexp_extract_all(text, "\\w+", 0)).cast("long")`.
    */
  def wordRunCount(text: Column): Column =
    bridge(WordRunCountExpr(expr(text.cast("string"))))

  /** Count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches (the BPE-ish
    * token count) — equals the regex formulation in
    * [[graft.functions.bpeishTokenCountColumns]].
    */
  def bpeishCount(text: Column): Column =
    bridge(BpeishCountExpr(expr(text.cast("string"))))

  /** Count of occurrences of any single character from `chars` (a set of
    * printable ASCII, e.g. ".,!?;:") — equals
    * `size(regexp_extract_all(text, "[<chars>]", 0)).cast("long")`.
    */
  def charSetCount(text: Column, chars: String): Column =
    bridge(CharSetCountExpr(expr(text.cast("string")), chars))

  /** Count of whole-word `(w1|w2|…)` matches over ALREADY-LOWERCASED
    * text, where every wi is a pure `[a-z0-9_]+` word: a match is exactly
    * a maximal ASCII `\w+` run equal to some wi — so the count is a
    * membership test per token run. Word boundaries are ASCII (RE2/DuckDB
    * `\b` semantics — the oracle's; java.util.regex's Unicode-aware `\b`
    * differs on non-ASCII adjacency, see [[WordSetCountExpr]]). The
    * caller passes `lower(text)` as the child (same discipline as
    * [[TextExprs.tokensNative]], keeping Spark's own collation-aware
    * `Lower` in the plan).
    */
  def wordSetCount(lowered: Column, words: Seq[String]): Column =
    bridge(WordSetCountExpr(expr(lowered.cast("string")), words))

  /** Count of code points in [lo, hi] (a BMP range, e.g. the CJK block
    * U+4E00–U+9FFF) — equals
    * `size(regexp_extract_all(text, "[\\x{lo}-\\x{hi}]", 0)).cast("long")`.
    */
  def codepointRangeCount(text: Column, lo: Int, hi: Int): Column =
    bridge(CodepointRangeCountExpr(expr(text.cast("string")), lo, hi))

  /** Count of graft tokens — equals `size(tokens(text)).cast("long")`
    * without materializing the token array (TokensExpr's own first pass
    * is exactly this count; see [[TextExprs.tokenize]] for why byte runs
    * of `[a-z0-9']` over the lowercased input equal the regex split).
    * Same Lower-under-the-expression discipline as tokensNative.
    */
  def tokenCount(text: Column): Column =
    bridge(TokenRunCountExpr(expr(
      org.apache.spark.sql.functions.lower(text.cast("string")))))

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  @inline private[functions] def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  // Java \s (ASCII default): [ \t\n\x0B\f\r]
  @inline private[functions] def isSpaceByte(b: Byte): Boolean =
    b == ' ' || (b >= 0x09 && b <= 0x0d)
}

/** Shared scaffolding: long-valued counting expression over one string. */
abstract class StringCountExpr extends UnaryExpression {
  override def dataType: DataType = LongType

  /** Called from both eval and generated code. */
  def run(input: UTF8String): Long

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  // reference-object call, NOT CodegenFallback (the TokensExpr pattern):
  // stays inside the enclosing whole-stage-codegen span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countExpr", this, classOf[StringCountExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }
}

/** Count of maximal `[a-z0-9']+` byte runs over ALREADY-LOWERCASED text ==
  * `size(TokensExpr(lowered))` (the tokenizer's counting pass without the
  * token materialization).
  */
case class TokenRunCountExpr(child: Expression) extends StringCountExpr {
  override def prettyName: String = "token_run_count"

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    @inline def isTok(c: Byte): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\''
    var n = 0L
    var inRun = false
    var i = 0
    while (i < nb) {
      if (isTok(bytes(i))) { if (!inRun) { n += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRunCountExpr =
    copy(child = newChild)
}

/** Count of maximal `[A-Za-z0-9_]+` byte runs == count of `\w+` matches
  * (Java `\w` is ASCII-only by default; bytes ≥ 0x80 are never word bytes,
  * so multi-byte characters break runs exactly like the regex).
  */
case class WordRunCountExpr(child: Expression) extends StringCountExpr {
  override def prettyName: String = "word_run_count"

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    var n = 0L
    var inRun = false
    var i = 0
    while (i < nb) {
      if (CountExprs.isWordByte(bytes(i))) {
        if (!inRun) { n += 1; inRun = true }
      } else inRun = false
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): WordRunCountExpr =
    copy(child = newChild)
}

/** Count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches: letter runs and
  * digit runs count once each; any other non-ASCII-whitespace code point
  * counts once (one UTF-8 lead byte per code point — java.util.regex is
  * code-point-aware, so a negated class consumes surrogate pairs whole,
  * which is exactly one 4-byte UTF-8 sequence).
  */
case class BpeishCountExpr(child: Expression) extends StringCountExpr {
  override def prettyName: String = "bpeish_count"

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    var n = 0L
    var i = 0
    while (i < nb) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) {
        n += 1
        while (i < nb && {
          val c = bytes(i); (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        }) i += 1
      } else if (b >= '0' && b <= '9') {
        n += 1
        while (i < nb && { val c = bytes(i); c >= '0' && c <= '9' }) i += 1
      } else if (CountExprs.isSpaceByte(b)) {
        i += 1
      } else if ((b & 0x80) == 0) { // other ASCII: single-char match
        n += 1; i += 1
      } else {
        // multi-byte code point: count the lead byte, skip continuations
        if ((b & 0xc0) != 0x80) n += 1
        i += 1
      }
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): BpeishCountExpr =
    copy(child = newChild)
}

/** Count of occurrences of any single ASCII character from `chars`. */
case class CharSetCountExpr(child: Expression, chars: String)
    extends StringCountExpr {
  require(chars.nonEmpty && chars.forall(c => c > ' ' && c < 0x7f),
    s"charSetCount wants printable ASCII, got: $chars")
  override def prettyName: String = "char_set_count"

  private val inSet: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c) = true)
    t
  }

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    var n = 0L
    var i = 0
    while (i < nb) {
      val b = bytes(i)
      if (b >= 0 && inSet(b)) n += 1
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): CharSetCountExpr =
    copy(child = newChild)
}

/** Count of maximal ASCII `\w+` runs equal to a member of `words` (all
  * pure `[a-z0-9_]+`, input already lowercased): with word-boundary
  * anchors on both sides and alternatives that are whole runs, a match is
  * exactly a complete token run equal to some wi.
  *
  * BOUNDARY SEMANTICS (r17 advice — deliberate and pinned): the run
  * boundary here is the ASCII `\w` byte class, which is RE2's `\b` — the
  * semantics of the DuckDB oracle every gate hash-matches. It is NOT
  * quite java.util.regex's `\b`, whose Bound node is Unicode-aware even
  * without UNICODE_CHARACTER_CLASS (`ch == '_' ||
  * Character.isLetterOrDigit(ch)`): a stopword run abutting a non-ASCII
  * letter/digit ("日本語the", "ététhe", "itア") counts 1 here and under
  * RE2, but 0 under the Java regex. ASCII boundaries are the better
  * tokenization for this pipeline (the graft tokenizer itself splits on
  * non-ASCII) and the one the oracle certifies; CountExprsSpec pins the
  * divergence on exactly those adjacency shapes so it can never drift
  * silently.
  */
case class WordSetCountExpr(child: Expression, words: Seq[String])
    extends StringCountExpr {
  require(words.nonEmpty && words.forall(_.matches("[a-z0-9_]+")),
    s"wordSetCount wants pure lowercase \\w words, got: $words")
  override def prettyName: String = "word_set_count"

  // byte images grouped by length — member check is a handful of
  // Arrays.equals-range compares, zero allocation
  private val byLen: Array[Array[Array[Byte]]] = {
    val max = words.map(_.length).max
    val t = Array.fill(max + 1)(Array.empty[Array[Byte]])
    words.groupBy(_.length).foreach { case (l, ws) =>
      t(l) = ws.map(_.getBytes("US-ASCII")).toArray
    }
    t
  }

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    var n = 0L
    var i = 0
    while (i < nb) {
      if (CountExprs.isWordByte(bytes(i))) {
        val start = i
        while (i < nb && CountExprs.isWordByte(bytes(i))) i += 1
        val len = i - start
        if (len < byLen.length) {
          val cands = byLen(len)
          var c = 0
          var hit = false
          while (!hit && c < cands.length) {
            val w = cands(c)
            var j = 0
            while (j < len && w(j) == bytes(start + j)) j += 1
            hit = j == len
            c += 1
          }
          if (hit) n += 1
        }
      } else i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCountExpr =
    copy(child = newChild)
}

/** Count of code points in [lo, hi] (BMP range above ASCII): decode each
  * UTF-8 lead byte's code point, compare. Sequence lengths follow the
  * lead byte; UTF8String content is valid UTF-8 by construction.
  */
case class CodepointRangeCountExpr(child: Expression, lo: Int, hi: Int)
    extends StringCountExpr {
  require(lo > 0x7f && hi >= lo && hi <= 0xffff,
    s"codepointRangeCount wants an above-ASCII BMP range, got [$lo, $hi]")
  override def prettyName: String = "codepoint_range_count"

  override def run(input: UTF8String): Long = {
    val nb = input.numBytes()
    val bytes = input.getBytes
    var n = 0L
    var i = 0
    while (i < nb) {
      val b = bytes(i) & 0xff
      if (b < 0x80) i += 1
      else if (b < 0xe0) { // 2-byte: U+0080–U+07FF
        if (i + 1 < nb) {
          val cp = ((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
          if (cp >= lo && cp <= hi) n += 1
        }
        i += 2
      } else if (b < 0xf0) { // 3-byte: U+0800–U+FFFF
        if (i + 2 < nb) {
          val cp = ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
            (bytes(i + 2) & 0x3f)
          if (cp >= lo && cp <= hi) n += 1
        }
        i += 3
      } else i += 4 // 4-byte: above BMP, never in range
    }
    n
  }

  override protected def withNewChildInternal(
      newChild: Expression): CodepointRangeCountExpr =
    copy(child = newChild)
}
