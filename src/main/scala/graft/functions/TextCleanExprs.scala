package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-scan REPLACE/COUNT expressions for the text-cleaning gates —
  * the regexp_replace/regexp_extract_all sites that remained after the
  * counting pass (CountExprs): PII redaction (q_redact, cleanChain), HTML
  * stripping (q_html_strip, cleanChain), whitespace normalization
  * (normalizeText, q_fingerprint). Each regexp_replace ran java.util.regex
  * over a decoded UTF-16 copy of the row and built the result through the
  * regex engine's appendReplacement machinery; at 100 TB these chains ARE
  * the cleaning-family scan cost. Every pattern is fixed, so each becomes
  * one allocation-lean pass over UTF8String bytes (no-match inputs return
  * the input object untouched).
  *
  * Value parity with java.util.regex is exact per pattern and pinned by
  * TextCleanExprsSpec against the regex engine itself on adversarial and
  * random inputs. The per-pattern equivalence arguments live on each
  * finder below; the common facts:
  *  - all pattern classes are ASCII; UTF-8 lead/continuation bytes are
  *    ≥ 0x80 and never members, so byte runs equal regex runs;
  *  - java.util.regex `\b` is UNICODE-aware even without
  *    UNICODE_CHARACTER_CLASS (Pattern's Bound node tests
  *    `ch == '_' || Character.isLetterOrDigit(ch)`), so the \b checks
  *    decode the adjacent code point — NOT just the adjacent byte;
  *  - replacements are plain literals (no $ group refs), and java's
  *    appendReplacement resumes the search AT the match end, so
  *    find/emit/resume is the whole loop.
  */
private[functions] object TextScan {

  @inline def isSpace(b: Byte): Boolean = b == ' ' || (b >= 0x09 && b <= 0x0d)
  @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  // email local part: [A-Za-z0-9._%+-]
  @inline def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  // email domain part: [A-Za-z0-9.-]
  @inline def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'
  @inline def lowerB(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Java `\b`'s word test (Pattern.Bound without UNICODE_CHARACTER_CLASS). */
  @inline def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Code point starting at byte i (valid UTF-8 assumed). */
  def codePointAt(bytes: Array[Byte], n: Int, i: Int): Int = {
    val b = bytes(i) & 0xff
    if (b < 0x80) b
    else if (b < 0xe0) {
      if (i + 1 < n) ((b & 0x1f) << 6) | (bytes(i + 1) & 0x3f) else b
    } else if (b < 0xf0) {
      if (i + 2 < n)
        ((b & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
      else b
    } else {
      if (i + 3 < n)
        ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
      else b
    }
  }

  /** Code point of the character ENDING at byte i−1 (step back over
    * continuation bytes to its lead byte).
    */
  def prevCodePoint(bytes: Array[Byte], n: Int, i: Int): Int = {
    var j = i - 1
    while (j > 0 && (bytes(j) & 0xc0) == 0x80) j -= 1
    codePointAt(bytes, n, j)
  }

  @inline private def pack(s: Int, e: Int): Long = (s.toLong << 32) | e.toLong

  // --------------------------------------------------------------------
  // URL: https?://[^\s]+  (case-sensitive; no (?i) in the pattern)
  //
  // Equivalence: the literal head is fixed; the greedy optional `s` tries
  // the s-branch first exactly as java's `?` does; `[^\s]+` has nothing
  // after it, so it is a maximal run of non-ASCII-space bytes (bytes
  // ≥ 0x80 are non-space, so consuming continuation bytes bytewise ends
  // the run at the same place the code-point regex does). A failed start
  // can only be retried at later positions, none of which begin with
  // 'h','t','t','p' inside the failed head — scanning for the next literal
  // "http" is the same leftmost order.
  // --------------------------------------------------------------------
  def findUrl(bytes: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i <= n - 8) { // shortest match "http://x" is 8 bytes
      if (bytes(i) == 'h' && bytes(i + 1) == 't' && bytes(i + 2) == 't' &&
          bytes(i + 3) == 'p') {
        @inline def slashes(q: Int): Boolean =
          q + 2 < n && bytes(q) == ':' && bytes(q + 1) == '/' && bytes(q + 2) == '/'
        @inline def tail(q: Int): Int = {
          var r = q
          while (r < n && !isSpace(bytes(r))) r += 1
          if (r > q) r else -1
        }
        var e = -1
        if (i + 4 < n && bytes(i + 4) == 's' && slashes(i + 5)) e = tail(i + 8)
        if (e < 0 && slashes(i + 4)) e = tail(i + 7)
        if (e > 0) return pack(i, e)
      }
      i += 1
    }
    -1L
  }

  // --------------------------------------------------------------------
  // EMAIL: [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
  //
  // Equivalence with java's backtracking, piece by piece:
  //  - `L+@`: '@' is not in L, so inside an L-run the '@' can only follow
  //    the run's END — greedy L+ with backtracking reduces to "maximal
  //    L-run immediately followed by '@'". A start inside a failed run has
  //    the same run end, hence the same failure, so runs are skipped whole.
  //  - `M+\.A{2,}`: '.' and letters are both in M, so the dot java's
  //    greedy-then-backtrack picks is the LARGEST m ≥ 1 with the M-run's
  //    byte at offset m equal to '.' AND ≥ 2 letters following; A{2,} is
  //    final and greedy, so the match ends at the maximal letter run after
  //    that dot (letters ⊂ M keeps it inside the run).
  //  - after a domain-side failure java retries start positions through
  //    the local run ('same end' argument) and the '@' (not in L), so the
  //    scan resumes at the domain start — where a fresh local part may
  //    begin, since M ⊂ L.
  // --------------------------------------------------------------------
  def findEmail(bytes: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isLocal(bytes(i))) {
        var e = i + 1
        while (e < n && isLocal(bytes(e))) e += 1
        if (e < n && bytes(e) == '@') {
          val q = e + 1
          var f = q
          while (f < n && isDomain(bytes(f))) f += 1
          var m = f - q - 1
          while (m >= 1) {
            if (bytes(q + m) == '.') {
              val r = q + m + 1
              var le = r
              while (le < n && isAlpha(bytes(le))) le += 1
              if (le - r >= 2) return pack(i, le)
            }
            m -= 1
          }
          i = q // resume where a fresh local part may begin
        } else i = e
      } else i += 1
    }
    -1L
  }

  // --------------------------------------------------------------------
  // LONG DIGIT RUN: \b\d{6,}\b
  //
  // Equivalence: `\d` is ASCII; `{6,}` is greedy and final before `\b`, so
  // a candidate is a MAXIMAL digit run of length ≥ 6. Shrinking the run
  // can never rescue a failed boundary (a boundary between two digits is
  // never a word boundary), so failed runs are skipped whole. The \b
  // checks decode the ADJACENT CODE POINTS and apply java's Unicode-aware
  // word test (see object doc) — 'é123456' does NOT match, exactly as
  // java.util.regex.
  // --------------------------------------------------------------------
  def findNum(bytes: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isDigit(bytes(i))) {
        var e = i + 1
        while (e < n && isDigit(bytes(e))) e += 1
        if (e - i >= 6 &&
            (i == 0 || !isWordCp(prevCodePoint(bytes, n, i))) &&
            (e == n || !isWordCp(codePointAt(bytes, n, e))))
          return pack(i, e)
        i = e
      } else i += 1
    }
    -1L
  }

  // --------------------------------------------------------------------
  // WHITESPACE RUN: \s+ (ASCII default: [ \t\n\x0B\f\r])
  // --------------------------------------------------------------------
  def findWs(bytes: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (isSpace(bytes(i))) {
        var e = i + 1
        while (e < n && isSpace(bytes(e))) e += 1
        return pack(i, e)
      }
      i += 1
    }
    -1L
  }

  // --------------------------------------------------------------------
  // HTML TAG: <(?:[^>"']|"[^"]*"|'[^']*')+> (CleanOps.tagRe)
  //
  // Equivalence: the three alternatives are tried in order at each unit
  // position, and each is DETERMINISTIC — a single non->"' byte, or a
  // complete quoted run to the next matching quote (the quote char is
  // excluded from its own body, so the run cannot end anywhere else).
  // The `+` loop therefore stops exactly at a '>' (match, given ≥ 1 unit)
  // or at an unclosed quote (fail). Reducing the iteration count cannot
  // rescue a failure: every earlier unit start is a non-'>' byte.
  // Consuming multi-byte characters bytewise only inflates the unit COUNT
  // (already ≥ 1 either way) — the end position is identical.
  // --------------------------------------------------------------------
  /** Position after the '>' of a tag whose '<' is at i, or -1. */
  def tagEnd(bytes: Array[Byte], n: Int, i: Int): Int = {
    var p = i + 1
    var units = 0
    while (p < n) {
      val b = bytes(p)
      if (b == '>') return if (units >= 1) p + 1 else -1
      else if (b == '"' || b == '\'') {
        var q = p + 1
        while (q < n && bytes(q) != b) q += 1
        if (q >= n) return -1
        p = q + 1
      } else p += 1
      units += 1
    }
    -1
  }

  def findTag(bytes: Array[Byte], n: Int, from: Int): Long = {
    var i = from
    while (i < n) {
      if (bytes(i) == '<') {
        val e = tagEnd(bytes, n, i)
        if (e > 0) return pack(i, e)
      }
      i += 1
    }
    -1L
  }

  /** ASCII-case-insensitive literal compare (lit pre-lowercased). */
  @inline private def matchLit(bytes: Array[Byte], i: Int,
      lit: Array[Byte]): Boolean = {
    var k = 0
    while (k < lit.length) {
      if (lowerB(bytes(i + k)) != lit(k)) return false
      k += 1
    }
    true
  }

  private def indexOfLit(bytes: Array[Byte], n: Int, from: Int,
      lit: Array[Byte]): Int = {
    var i = from
    while (i <= n - lit.length) {
      if (matchLit(bytes, i, lit)) return i
      i += 1
    }
    -1
  }

  // --------------------------------------------------------------------
  // SCRIPT/STYLE BLOCK: (?is)<script(?:tagBody)*>.*?</script>
  //
  // Equivalence: the open literal and close literal are fixed ((?i) →
  // ASCII-case-insensitive — the classes inside tagBody are unaffected by
  // (?i)); tagBody* then '>' is the same deterministic unit parse as
  // tagEnd with ≥ 0 units; the lazy `.*?` under (?s) reaches the FIRST
  // close literal at or after the open tag's end. A start whose open-tag
  // parse or close search fails is retried from the next byte, exactly
  // java's scan order.
  // --------------------------------------------------------------------
  def findBlock(bytes: Array[Byte], n: Int, from: Int,
      openLit: Array[Byte], closeLit: Array[Byte]): Long = {
    var i = from
    val minLen = openLit.length + 1 + closeLit.length // open + '>' + close
    while (i <= n - minLen) {
      if (matchLit(bytes, i, openLit)) {
        // tagBody* '>' — zero units allowed
        var p = i + openLit.length
        var after = -1
        var done = false
        while (!done && p < n) {
          val b = bytes(p)
          if (b == '>') { after = p + 1; done = true }
          else if (b == '"' || b == '\'') {
            var q = p + 1
            while (q < n && bytes(q) != b) q += 1
            if (q >= n) done = true // unclosed quote: open tag fails
            else p = q + 1
          } else p += 1
        }
        if (after > 0) {
          val c = indexOfLit(bytes, n, after, closeLit)
          if (c >= 0) return pack(i, c + closeLit.length)
        }
      }
      i += 1
    }
    -1L
  }

  // --------------------------------------------------------------------
  // COMMENT/CDATA: (?s)<!--.*?-->  and  (?is)<!\[CDATA\[.*?\]\]>
  // Open literal, lazy to the first close literal. The comment pattern is
  // case-sensitive (no letters in it anyway); CDATA carries (?i).
  // --------------------------------------------------------------------
  def findDelim(bytes: Array[Byte], n: Int, from: Int,
      openLit: Array[Byte], closeLit: Array[Byte]): Long = {
    var i = from
    val minLen = openLit.length + closeLit.length
    while (i <= n - minLen) {
      if (matchLit(bytes, i, openLit)) {
        val c = indexOfLit(bytes, n, i + openLit.length, closeLit)
        if (c >= 0) return pack(i, c + closeLit.length)
      }
      i += 1
    }
    -1L
  }

  /** find → emit literal replacement → resume at match end; returns the
    * INPUT OBJECT when nothing matches (zero allocation on the common
    * clean-row path).
    */
  def replaceAll(input: UTF8String,
      find: (Array[Byte], Int, Int) => Long, repl: Array[Byte]): UTF8String = {
    val bytes = input.getBytes
    val n = bytes.length
    var m = find(bytes, n, 0)
    if (m < 0) return input
    val out = new java.io.ByteArrayOutputStream(n + 16)
    var pos = 0
    while (m >= 0) {
      val s = (m >>> 32).toInt
      val e = (m & 0xffffffffL).toInt
      out.write(bytes, pos, s - pos)
      out.write(repl, 0, repl.length)
      pos = e
      m = if (pos >= n) -1L else find(bytes, n, pos)
    }
    if (pos < n) out.write(bytes, pos, n - pos)
    UTF8String.fromBytes(out.toByteArray)
  }

  def countAll(input: UTF8String, find: (Array[Byte], Int, Int) => Long): Long = {
    val bytes = input.getBytes
    val n = bytes.length
    var c = 0L
    var m = find(bytes, n, 0)
    while (m >= 0) {
      c += 1
      val e = (m & 0xffffffffL).toInt
      m = if (e >= n) -1L else find(bytes, n, e)
    }
    c
  }

  // pre-lowercased literals for the (?i) searches
  val ScriptOpen: Array[Byte] = "<script".getBytes("US-ASCII")
  val ScriptClose: Array[Byte] = "</script>".getBytes("US-ASCII")
  val StyleOpen: Array[Byte] = "<style".getBytes("US-ASCII")
  val StyleClose: Array[Byte] = "</style>".getBytes("US-ASCII")
  val CommentOpen: Array[Byte] = "<!--".getBytes("US-ASCII")
  val CommentClose: Array[Byte] = "-->".getBytes("US-ASCII")
  val CdataOpen: Array[Byte] = "<![cdata[".getBytes("US-ASCII")
  val CdataClose: Array[Byte] = "]]>".getBytes("US-ASCII")
}

/** Shared scaffolding: string→string one-pattern replace. `kind` selects
  * the finder; parity per kind is pinned by TextCleanExprsSpec against
  * java.util.regex itself.
  */
case class TextReplaceExpr(child: Expression, kind: String, replacement: String)
    extends UnaryExpression {
  import TextScan._

  require(TextReplaceExpr.kinds.contains(kind), s"unknown replace kind: $kind")

  override def dataType: DataType = StringType
  override def prettyName: String = kind match {
    case "url" => "url_redact"
    case "email" => "email_redact"
    case "num" => "num_redact"
    case "ws" => "ws_collapse"
    case "script" => "strip_script"
    case "style" => "strip_style"
    case "comment" => "strip_comment"
    case "cdata" => "strip_cdata"
    case "tag" => "strip_tags"
  }

  private val repl: Array[Byte] = replacement.getBytes("UTF-8")

  private val finder: (Array[Byte], Int, Int) => Long = kind match {
    case "url" => findUrl
    case "email" => findEmail
    case "num" => findNum
    case "ws" => findWs
    case "script" => findBlock(_, _, _, ScriptOpen, ScriptClose)
    case "style" => findBlock(_, _, _, StyleOpen, StyleClose)
    case "comment" => findDelim(_, _, _, CommentOpen, CommentClose)
    case "cdata" => findDelim(_, _, _, CdataOpen, CdataClose)
    case "tag" => findTag
  }

  /** Called from both eval and generated code. */
  def run(input: UTF8String): UTF8String = replaceAll(input, finder, repl)

  override protected def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  // reference-object call, NOT CodegenFallback (the TokensExpr pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textReplaceExpr", this,
      classOf[TextReplaceExpr].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.run($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextReplaceExpr =
    copy(child = newChild)
}

object TextReplaceExpr {
  private[functions] val kinds = Set(
    "url", "email", "num", "ws", "script", "style", "comment", "cdata", "tag")
}

/** Match COUNT over the same finders (q_redact's n_urls/n_emails/n_nums,
  * q_html_strip's n_tags) — equals
  * `size(regexp_extract_all(text, <pattern>, 0)).cast("long")`.
  */
case class TextMatchCountExpr(child: Expression, kind: String)
    extends StringCountExpr {
  import TextScan._

  require(Set("url", "email", "num", "tag").contains(kind),
    s"unknown count kind: $kind")

  override def prettyName: String = kind + "_match_count"

  private val finder: (Array[Byte], Int, Int) => Long = kind match {
    case "url" => findUrl
    case "email" => findEmail
    case "num" => findNum
    case "tag" => findTag
  }

  override def run(input: UTF8String): Long = countAll(input, finder)

  override protected def withNewChildInternal(newChild: Expression): TextMatchCountExpr =
    copy(child = newChild)
}

/** Column API for the text-cleaning scans. */
object TextCleanExprs {
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)
  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  private def rep(c: Column, kind: String, replacement: String): Column =
    bridge(TextReplaceExpr(expr(c.cast("string")), kind, replacement))

  /** regexp_replace(c, "https?://[^\\s]+", r) */
  def urlRedact(c: Column, r: String): Column = rep(c, "url", r)
  /** regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", r) */
  def emailRedact(c: Column, r: String): Column = rep(c, "email", r)
  /** regexp_replace(c, "\\b\\d{6,}\\b", r) */
  def numRedact(c: Column, r: String): Column = rep(c, "num", r)
  /** regexp_replace(c, "\\s+", " ") */
  def wsCollapse(c: Column): Column = rep(c, "ws", " ")
  /** regexp_replace(c, CleanOps.scriptRe, "") */
  def stripScript(c: Column): Column = rep(c, "script", "")
  /** regexp_replace(c, CleanOps.styleRe, "") */
  def stripStyle(c: Column): Column = rep(c, "style", "")
  /** regexp_replace(c, "(?s)<!--.*?-->", "") */
  def stripComment(c: Column): Column = rep(c, "comment", "")
  /** regexp_replace(c, "(?is)<!\\[CDATA\\[.*?\\]\\]>", "") */
  def stripCdata(c: Column): Column = rep(c, "cdata", "")
  /** regexp_replace(c, CleanOps.tagRe, " ") */
  def stripTags(c: Column): Column = rep(c, "tag", " ")

  def urlCount(c: Column): Column =
    bridge(TextMatchCountExpr(expr(c.cast("string")), "url"))
  def emailCount(c: Column): Column =
    bridge(TextMatchCountExpr(expr(c.cast("string")), "email"))
  def numCount(c: Column): Column =
    bridge(TextMatchCountExpr(expr(c.cast("string")), "num"))
  def tagCount(c: Column): Column =
    bridge(TextMatchCountExpr(expr(c.cast("string")), "tag"))
}
