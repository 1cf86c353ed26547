package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins every native byte-scan count to the `size(regexp_extract_all(…))`
  * formulation it replaces — value-identical on random text plus the edge
  * shapes where the byte scan and java.util.regex could plausibly diverge:
  * empty strings, pure punctuation, every ASCII whitespace (`\s` is
  * [ \t\n\x0B\f\r]), underscores and digit/letter boundaries (`\w` vs the
  * bpeish split), multi-byte code points (2-, 3-, and 4-byte UTF-8 — the
  * negated class counts CODE POINTS, so astral chars count once), CJK in
  * and out of the [U+4E00, U+9FFF] block, stopwords as prefixes/suffixes
  * of longer words (`\b` anchoring), and the fixture corpus itself.
  */
class CountExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val stops = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(41)
    val words = Seq("the", "Quick", "brown's", "FOX", "jumps", "42", "o'clock",
      "Straße", "ÉTÉ", "naïve", "日本語", "x", "_under_", "a1b2", "the",
      "then", "bathe", "IT", "And", "中文测试", "ア", "€", "😀", "ꬱ")
    (0 until 400).map { _ =>
      val n = rnd.nextInt(14)
      (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(Seq(" ", ", ", "\t", "-", "!! ", "\n", "", "\f\r")(rnd.nextInt(8)))
    } ++ Seq("", " ", "!!!", "...---...", "__", "a_b c_d", "abc123def",
      "123abc", "the theater bathe the", "it itit it_", "a an and",
      "为中文 one 中文二 two ䷿一鿿ꀀ", "étude",
      "é一😀x", "tab\tvtff\fcr\rnl\n end")
  }

  private def df = {
    import spark.implicits._
    corpus.zipWithIndex.map(_.swap).toDF("id", "text")
  }

  private def assertParity(nat: org.apache.spark.sql.Column,
      ref: org.apache.spark.sql.Column, what: String): Unit = {
    val bad = df.select(col("id"), col("text"), nat.as("nat"), ref.as("ref"))
      .filter(not(col("nat") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"$what mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("wordRunCount == size(regexp_extract_all(text, \\w+))") {
    assertParity(
      CountExprs.wordRunCount(col("text")),
      size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long"),
      "wordRunCount")
  }

  test("bpeishCount == regex bpeish count") {
    assertParity(
      CountExprs.bpeishCount(col("text")),
      bpeishTokenCountColumns(col("text")),
      "bpeishCount")
  }

  test("charSetCount == size(regexp_extract_all(text, [.,!?;:]))") {
    assertParity(
      CountExprs.charSetCount(col("text"), ".,!?;:"),
      size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("long"),
      "charSetCount")
  }

  test("wordSetCount == size(regexp_extract_all(lower(text), \\b(stops)\\b))") {
    assertParity(
      CountExprs.wordSetCount(lower(col("text")), stops),
      size(regexp_extract_all(lower(col("text")),
        lit(s"\\b(${stops.mkString("|")})\\b"), lit(0))).cast("long"),
      "wordSetCount")
  }

  test("codepointRangeCount == size(regexp_extract_all(text, CJK class))") {
    assertParity(
      CountExprs.codepointRangeCount(lower(col("text")), 0x4e00, 0x9fff),
      size(regexp_extract_all(lower(col("text")),
        lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long"),
      "codepointRangeCount")
  }

  test("every langIdCol marker score matches its regex markerCount on the fixture corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    graft.ml.TextOps.langWordSets.foreach { case (lang, ws) =>
      val bad = docs.select(col("doc_id"),
        CountExprs.wordSetCount(lower(col("text")), ws).as("nat"),
        graft.ml.TextOps.markerCount(col("text"),
          s"\\b(${ws.mkString("|")})\\b").as("ref"))
        .filter(not(col("nat") <=> col("ref"))).count()
      assert(bad == 0, s"$lang marker count drifted from the regex form")
    }
    val badZh = docs.select(
      CountExprs.codepointRangeCount(lower(col("text")), 0x4e00, 0x9fff).as("nat"),
      graft.ml.TextOps.markerCount(col("text"), "[\\x{4e00}-\\x{9fff}]").as("ref"))
      .filter(not(col("nat") <=> col("ref"))).count()
    assert(badZh == 0, "zh CJK count drifted from the regex form")
  }

  test("fixture-corpus parity for the q_tokens / quality counting columns") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val bad = docs.select(
      CountExprs.wordRunCount(col("text")).as("w_nat"),
      size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("w_ref"),
      CountExprs.bpeishCount(col("text")).as("b_nat"),
      bpeishTokenCountColumns(col("text")).as("b_ref"),
      CountExprs.charSetCount(col("text"), ".,!?;:").as("p_nat"),
      size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("long").as("p_ref"),
      CountExprs.wordSetCount(lower(col("text")), stops).as("s_nat"),
      size(regexp_extract_all(lower(col("text")),
        lit(s"\\b(${stops.mkString("|")})\\b"), lit(0))).cast("long").as("s_ref"))
      .filter(not(col("w_nat") <=> col("w_ref")) ||
        not(col("b_nat") <=> col("b_ref")) ||
        not(col("p_nat") <=> col("p_ref")) ||
        not(col("s_nat") <=> col("s_ref")))
      .count()
    assert(bad == 0, "native counting columns drifted from the regex forms on the fixture corpus")
  }

  test("tokenCount == size(tokens(text)) on adversarial and fixture text") {
    assertParity(
      CountExprs.tokenCount(col("text")),
      size(tokens(col("text"))).cast("long"),
      "tokenCount")
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val bad = docs.select(
      CountExprs.tokenCount(col("text")).as("nat"),
      size(tokens(col("text"))).cast("long").as("ref"))
      .filter(not(col("nat") <=> col("ref"))).count()
    assert(bad == 0, "tokenCount drifted from size(tokens(…)) on the fixture corpus")
  }

  test("doGenCode compiles: codegen-only mode matches the regex forms") {
    // CODEGEN_ONLY turns a silent interpreted fallback into a hard
    // failure (the TextExprsSpec discipline) — the value tests above
    // would pass either way
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val bad = df.select(col("id"),
        CountExprs.wordRunCount(col("text")).as("w"),
        size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("wr"),
        CountExprs.bpeishCount(col("text")).as("b"),
        bpeishTokenCountColumns(col("text")).as("br"),
        CountExprs.tokenCount(col("text")).as("t"),
        size(tokens(col("text"))).cast("long").as("tr"),
        CountExprs.wordSetCount(lower(col("text")), stops).as("s"),
        size(regexp_extract_all(lower(col("text")),
          lit(s"\\b(${stops.mkString("|")})\\b"), lit(0))).cast("long").as("sr"))
        .filter(not(col("w") <=> col("wr")) || not(col("b") <=> col("br")) ||
          not(col("t") <=> col("tr")) || not(col("s") <=> col("sr")))
        .collect()
      assert(bad.isEmpty, s"codegen mismatches: ${bad.take(3).mkString("; ")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("wordSetCount boundary is ASCII (RE2/oracle \\b), NOT java regex's Unicode \\b") {
    // r17 advice: java.util.regex's \b is Unicode-aware even without
    // UNICODE_CHARACTER_CLASS (Pattern's Bound node tests
    // `ch == '_' || Character.isLetterOrDigit(ch)`), so a stopword run
    // abutting a non-ASCII letter/digit matches \b(w)\b ZERO times under
    // Java but once under RE2's ASCII \b — which is what DuckDB runs and
    // what every gate's oracle hash certifies. The native byte scan
    // implements the RE2/oracle semantics DELIBERATELY; this pins the
    // divergence on exactly the adjacency shapes where it shows, so
    // neither side can drift silently.
    import spark.implicits._
    val adversarial = Seq("ꬱthe", "日本語the", "itア", "ététhe", "theé",
      "٣the") // the Arabic-Indic digit is Character.isDigit, hence a java word char
    val d = adversarial.toDF("text")
    val rows = d.select(
      CountExprs.wordSetCount(lower(col("text")), stops).as("nat"),
      size(regexp_extract_all(lower(col("text")),
        lit(s"\\b(${stops.mkString("|")})\\b"), lit(0))).cast("long").as("javab"))
      .collect()
    rows.zip(adversarial).foreach { case (r, s) =>
      assert(r.getLong(0) == 1L, s"native should count 1 whole-word run in '$s'")
      assert(r.getLong(1) == 0L,
        s"java \\b should reject the non-ASCII adjacency in '$s' — if this " +
          "starts matching, the JDK changed \\b and the docs need re-review")
    }
    // and DuckDB-RE2 agreement on these shapes is certified by the
    // driver's oracle hash-match: langIdCol/quality gates run this very
    // expression over the fixture corpus every round
  }

  test("null text yields NULL counts (not the legacy size(null) = -1)") {
    // Under ansi=false + the legacy sizeOfNull default, the regex
    // formulation returns -1 for null input — a legacy artifact, not a
    // count. The native expressions use standard null-in/null-out
    // semantics (session-config-independent). No fixture table carries
    // null text, so every gate's values are unchanged; this pins the
    // deliberate divergence so it can never surprise anyone.
    import spark.implicits._
    val d = Seq((1, Option.empty[String]), (2, Some("a b"))).toDF("id", "text")
    val rows = d.orderBy("id").select(
      CountExprs.wordRunCount(col("text")).as("nat"),
      size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("long").as("ref"))
      .collect()
    assert(rows(0).isNullAt(0), "native count of null text must be null")
    assert(!rows(0).isNullAt(1) && rows(0).getLong(1) == -1L,
      "regex formulation returns the legacy -1 under this session config")
    assert(rows(1).getLong(0) == rows(1).getLong(1))
  }
}
