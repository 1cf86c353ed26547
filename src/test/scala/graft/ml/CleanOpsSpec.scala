package graft.ml

import graft.GraftSession
import graft.functions.NfcNormalizeExpr.nfcNative
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the corpus-cleaning operators: line dedup keeps
  * unique lines in order and drops cross-document boilerplate, HTML strip
  * handles blocks/entities/whitespace, NFC normalization matches
  * java.text.Normalizer on both execution paths with the no-op fast path
  * preserving ASCII bytes.
  */
class CleanOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(8)

  test("lineDedup drops lines shared across docs, keeps unique ones in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("alpha body one", "shared footer", "tail one")),
      (2L, Seq("beta body two", "shared footer", "tail two")),
      (3L, Seq("gamma body three", "tail three"))).toDF("doc_id", "ls")
    val lines = docs.select(col("doc_id"),
      posexplode(col("ls")).as(Seq("idx", "line")))
    val kept = CleanOps.lineDedup(lines, minDf = 2L)
      .groupBy("doc_id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line"))).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "alpha body one\ntail one")
    assert(kept(2L) == "beta body two\ntail two")
    assert(kept(3L) == "gamma body three\ntail three")
  }

  test("lineDedup with minDf=2 keeps a line that repeats WITHIN one doc") {
    import spark.implicits._
    // df counts DISTINCT docs: an intra-doc repeat is not boilerplate
    val lines = Seq((1L, 0, "la"), (1L, 1, "la"), (1L, 2, "end"))
      .toDF("doc_id", "idx", "line")
    assert(CleanOps.lineDedup(lines, minDf = 2L).count() == 3)
  }

  test("stripHtml removes blocks and tags, unescapes entities, collapses ws") {
    import spark.implicits._
    val in = Seq(
      "<html><style>p{}</style><body><h1>T</h1> <p>a &amp; b &lt;x&gt;</p><script a=1>var q='<p>';</script></body></html>")
      .toDF("s")
    val out = in.select(CleanOps.stripHtml(col("s"))).head().getString(0)
    assert(out == "T a & b <x>")
  }

  test("stripHtml removes MULTI-LINE and UPPERCASE script/style blocks") {
    import spark.implicits._
    // without (?is) the block patterns never match across newlines and
    // the tag pass strips only the tags, leaking 'var secret=1;' into
    // the cleaned text
    val out = Seq("<SCRIPT type=x>\nvar secret=1;\n</SCRIPT><p>body</p>\n<STYLE>\np{}\n</STYLE>")
      .toDF("s").select(CleanOps.stripHtml(col("s"))).head().getString(0)
    assert(out == "body")
  }

  test("stripHtml strips comment and CDATA BLOCKS, bodies included") {
    import spark.implicits._
    // the tag pass alone eats '<!--' only up to the first '>', leaking
    // the comment body; comments may span lines and contain tags
    val out = Seq(
      "<p>a</p><!-- nav: <a href=x>home</a>\nboiler --><![CDATA[raw <b> & bytes]]><p>b</p>")
      .toDF("s").select(CleanOps.stripHtml(col("s"))).head().getString(0)
    assert(out == "a b")
  }

  test("stripHtml: quoted attribute values containing '>' strip with their tag") {
    import spark.implicits._
    // a bare [^>]+ tag regex truncates at the '>' inside the quoted title/
    // href and leaks the tag tail (ok" href=...) into the corpus; script
    // openers have the same hazard (src="a>b"). Unclosed quotes are the
    // documented residual: the tag match fails conservatively, leaving the
    // literal '<' text rather than eating to an arbitrary later '>'.
    val out = Seq(
      """<p>a</p><a title="notes > ok" href='/p?x=1>2'>ref</a><script src="s>t">var q=1;</script><p>b</p>""")
      .toDF("s").select(CleanOps.stripHtml(col("s"))).head().getString(0)
    assert(out == "a ref b")
  }

  test("stripHtml entity order: &amp;lt; must not double-unescape") {
    import spark.implicits._
    val out = Seq("x &amp;lt; y").toDF("s")
      .select(CleanOps.stripHtml(col("s"))).head().getString(0)
    assert(out == "x &lt; y")
  }

  test("nfcNative matches java.text.Normalizer, codegen and interpreted") {
    import spark.implicits._
    val samples = Seq(
      "café",          // NFD e + combining acute -> é
      "Ångström", // ring + diaeresis
      "ẛ̣",        // long s with dot above + dot below (reorders)
      "plain ascii text",
      "")
    val df = samples.toDF("s").select(col("s"), nfcNative(col("s")).as("n"))
    df.collect().foreach { r =>
      val expect = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expect, s"input ${r.getString(0)}")
    }
    // interpreted path: eval() the expression directly with a Literal
    // child — head()/collect() above run whole-stage codegen, which never
    // touches nullSafeEval
    samples.foreach { s =>
      val got = graft.functions.NfcExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(s)).eval(null)
      val expect = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(got.toString == expect, s"interpreted eval on $s")
    }
    assert(graft.functions.NfcExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("spanDedup removes the non-survivor copy of a shared k-token span") {
    import spark.implicits._
    // doc 1 and doc 2 share their first 8 tokens; doc 1 (min doc_id) is
    // the canonical survivor, doc 2 loses positions 0-7 and keeps its tail
    val shared = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = Seq(
      (1L, s"$shared a b c d"),
      (2L, s"$shared x y z w")).toDF("doc_id", "text")
    val out = CleanOps.spanDedup(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (s"$shared a b c d", 12L, 12L))
    assert(out(2L) == ("x y z w", 4L, 12L))
  }

  test("spanDedup: short exact-dup docs collapse whole-doc, survivor keeps all") {
    import spark.implicits._
    val docs = Seq(
      (10L, "tiny duplicate document"),
      (11L, "tiny duplicate document"),
      (12L, "a different short doc")).toDF("doc_id", "text")
    val out = CleanOps.spanDedup(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(10L)._1 == "tiny duplicate document")
    assert(out(11L) == (("", 0L)))
    assert(out(12L)._1 == "a different short doc")
  }

  test("spanDedup: intra-doc repetition dedups against its own first copy") {
    import spark.implicits._
    // 16 identical tokens: span at pos 0 survives; the other 8 positional
    // copies (pos 1-8) are dropped, covering positions 1..15
    val docs = Seq((1L, ("la " * 16).trim)).toDF("doc_id", "text")
    val out = CleanOps.spanDedup(docs, 8).head()
    assert(out.getString(1) == "la")
    assert(out.getLong(2) == 1L && out.getLong(3) == 16L)
  }

  test("nfcNative fast path: already-NFC input is returned unchanged") {
    import spark.implicits._
    val composed = "café plain"
    val out = Seq(composed).toDF("s")
      .select(nfcNative(col("s"))).head().getString(0)
    assert(out == composed)
  }
}
