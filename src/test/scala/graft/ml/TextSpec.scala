package graft.ml

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

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
