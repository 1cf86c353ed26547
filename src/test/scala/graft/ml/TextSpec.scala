package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  test("repetition metrics on crafted docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1: "a a a a" -> top word 1.0, every bigram "a a" duplicated
    // doc 2: all-distinct words -> no repetition
    // doc 3: single word -> no n-grams, fractions 0
    // doc 4: empty -> all zeros
    val df = Seq(
      (1L, "a a a a"), (2L, "w x y z"), (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    val ws = TextOps.repetitionWords(col("text"))
    val got = df.select(col("doc_id"),
        TextOps.topWordFrac(ws).as("twf"),
        TextOps.dupFrac(TextOps.wordNgrams(ws, 2)).as("dbf"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((1.0, 1.0 - 1.0 / 3.0)))
    assert(got(2L) == ((0.25, 0.0)))
    assert(got(3L) == ((1.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0)))
  }

  test("pii redaction: urls, emails, long digit runs") {
    import spark.implicits._
    val df = Seq(
      "mail a@b.co or see https://x.io/path?a@b.cc then call 1234567",
      "short num 12345 survives, ümlaut text too",
      "no pii here").toDF("text")
    val out = df.select(TextOps.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "mail <EMAIL> or see <URL> then call <NUM>",
      "short num 12345 survives, ümlaut text too",
      "no pii here"))
  }

  test("normalization collapses whitespace and case") {
    import spark.implicits._
    val df = Seq("  Mixed \t CASE\n\n text  ").toDF("text")
    assert(df.select(TextOps.normalizeText(col("text"))).head().getString(0)
      == "mixed case text")
  }
}
