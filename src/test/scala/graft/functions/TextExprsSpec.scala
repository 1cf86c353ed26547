package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native tokenizer and fused shingle-hash expression to the
  * builtin-composed Column formulations they replace — value-identical on
  * random text and every edge the Column versions have: empty strings,
  * punctuation-only (zero tokens → one empty-string shingle), docs shorter
  * than the shingle width (one all-token shingle), repeated shingles
  * (first-occurrence-order distinct), unicode case mapping, apostrophes.
  */
class TextExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val corpus: Seq[String] = {
    val rnd = new scala.util.Random(23)
    val words = Seq("the", "Quick", "brown's", "FOX", "jumps", "42", "o'clock",
      "Straße", "ÉTÉ", "naïve", "日本語", "x")
    (0 until 300).map { _ =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => words(rnd.nextInt(words.length)))
        .mkString(Seq(" ", ", ", "  ", "-", "!! ")(rnd.nextInt(5)))
    } ++ Seq("", "!!!", "...---...", "one", "one two", "one two three",
      "a b a b a b a b", "O'Neill's", "  leading and trailing  ",
      "MiXeD CaSe TeXt", "ÀÁÂÃÄÅ àáâãäå")
  }

  test("native tokens == filter(split(lower(…))) on random and edge text") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    val bad = df.select(col("id"), col("text"),
      TextExprs.tokensNative(col("text")).as("nat"),
      tokensColumns(col("text")).as("ref"))
      .filter(not(col("nat") === col("ref")))
      .collect()
    assert(bad.isEmpty, s"token mismatches: ${bad.take(3).mkString("; ")}")
  }

  test("native shingle hashes == array_distinct(transform(shingles(tokens), xxhash64))") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = df.select(col("id"), col("text"),
        TextExprs.shingleHashesNative(col("text"), n).as("nat"),
        shingleHashes(shingles(tokensColumns(col("text")), n)).as("ref"))
        .filter(not(col("nat") === col("ref")))
        .collect()
      assert(bad.isEmpty, s"n=$n shingle-hash mismatches: ${bad.take(3).mkString("; ")}")
    }
  }

  test("native string shingles == shingles(tokens(…)) on random and edge text") {
    import spark.implicits._
    val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = df.select(col("id"), col("text"),
        TextExprs.shinglesTextNative(col("text"), n).as("nat"),
        shingles(tokensColumns(col("text")), n).as("ref"))
        .filter(not(col("nat") === col("ref")))
        .collect()
      assert(bad.isEmpty, s"n=$n shingle mismatches: ${bad.take(3).mkString("; ")}")
    }
  }

  test("doGenCode compiles: codegen-only mode matches interpreted eval") {
    import spark.implicits._
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
      val bad = df.select(col("id"),
        TextExprs.tokensNative(col("text")).as("nt"),
        tokensColumns(col("text")).as("rt"),
        TextExprs.shingleHashesNative(col("text"), 3).as("ns"),
        shingleHashes(shingles(tokensColumns(col("text")), 3)).as("rs"))
        .filter(not(col("nt") === col("rt")) || not(col("ns") === col("rs")))
        .collect()
      assert(bad.isEmpty, s"codegen mismatches: ${bad.take(3).mkString("; ")}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null text yields null in both expressions") {
    import spark.implicits._
    val df = Seq((1, None: Option[String]), (2, Some("ok"))).toDF("id", "text")
    val r = df.select(
      TextExprs.tokensNative(col("text")).isNull.as("tn"),
      TextExprs.shingleHashesNative(col("text"), 3).isNull.as("sn"))
      .orderBy(lit(1)).collect()
    assert(r.exists(x => x.getBoolean(0) && x.getBoolean(1)))
    assert(r.exists(x => !x.getBoolean(0) && !x.getBoolean(1)))
  }
}
