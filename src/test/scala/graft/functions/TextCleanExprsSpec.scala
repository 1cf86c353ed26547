package graft.functions

import graft.GraftSession
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins every native byte-scan replace/count ([[TextCleanExprs]]) to the
  * regexp formulation it replaced — and Spark's regexp_replace/
  * regexp_extract_all ARE java.util.regex, so these tests compare the
  * byte scans against the regex engine itself, on:
  *  - adversarial shapes per pattern: email backtracking (dots in the
  *    domain, too-short TLDs, @ chains), URL greedy-optional-s, \b digit
  *    runs with Unicode letter/digit neighbors (java's \b is
  *    Unicode-aware — the num scan decodes adjacent code points), quoted
  *    '>' inside tags, unclosed quotes, uppercase/multiline script
  *    blocks, comment/CDATA blocks, every ASCII whitespace, multi-byte
  *    text everywhere;
  *  - a seeded random-fragment fuzz corpus over an alphabet dense in the
  *    patterns' trigger characters;
  *  - the fixture corpus through the composed redactPii / normalizeText /
  *    stripHtml chains (the exact gate formulas);
  *  - a codegen-only tier (silent interpreted fallback fails loudly).
  */
class TextCleanExprsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val urlRe = "https?://[^\\s]+"
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val numRe = "\\b\\d{6,}\\b"

  private val adversarial: Seq[String] = Seq(
    "", " ", "plain text only",
    // URLs: greedy optional s, case sensitivity, minimal tails, adjacency
    "http://", "https://", "http://x", "https://x", "httpss://x", "http:/x",
    "HTTP://nope", "Https://nope", "see http://a.b/c?q=1#f end",
    "texthttp://x tail", "httphttp://x", "http://пример.com x",
    "http://a http://b", "wrap(http://x.y/z)", "http://tab\tend",
    "https://multi\nline", "http://s", "xhttps://y z",
    // emails: backtracking dots, short TLDs, chains, boundary shapes
    "a@b.cc", "a@b.c", "a@b..cc", "a@b...c.cc", "x@y@z.com", "a@@b.cc",
    "user.name+tag%x_y-9@sub.domain-x.co end", ".@a.bc", "%+-._@a.bc",
    "a@b.comX", "a@b.c0m", "a@b-.-c.ddd", "a@.cc", "@a.bc", "a@b.",
    "mail a@b.cc, c@d.ee.", "é@x.yy", "a@é.yy", "aé@x.yy",
    "a@b.cc@d.ee", "1@2.cc", "a@b.cc.dd", "a@b.verylongtldxyz",
    // digit runs: \b with Unicode neighbors (java \b is Unicode-aware)
    "123456", "12345", "1234567890123", "a123456", "123456a", "_123456",
    "123456_", "é123456", "123456é", "ꬱ123456 ok", "123456ア", "٣123456",
    "123456٣", "x 123456 y", "12345 123456 1234567", "id:1234567.",
    "😀123456", "123456😀", "中123456中",
    // whitespace: every ASCII \s member, runs, NBSP must NOT collapse
    "a  b", "a\t\nb", "tab\tvtff\fcr\rnl\n end", " lead trail ",
    "nbsp stays", "   ", "mix    \t x",
    // html tags: quoted '>', unclosed quotes, empty, multibyte attrs
    "<a>", "<>", "< a >", "<a title=\"notes > ok\" href='/p?a=1&b=2'>ref</a>",
    "<a href=\"x>y</a>", "<a href='x>y'>z</a>", "<div data-x='1 > 2'>t</div>",
    "<名前 attr=\"值>x\">body</名前>", "a < b > c", "<a\" >", "<<x>>",
    "<p>text</p><p>more</p>", "<a href=\"unclosed>rest",
    // script/style blocks: case, multiline, attrs with '>', unclosed
    "<script>var x=1;</script>", "<SCRIPT>X</SCRIPT>",
    "<script a='1>2'>b</script>", "<script>multi\nline()</script>",
    "<scriptx>y</script>", "<script>no close", "<style>p{}</style>",
    "<STYLE media=\"x>y\">s</STYLE>", "pre<script>a</script>post",
    "<script><script>inner</script>after",
    // comments / cdata
    "<!-- c -->", "<!-- multi\nline -->", "<!---->", "<!-- <!-- nest --> -->",
    "<![CDATA[raw <markup> & bytes]]>", "<![cdata[x]]>", "<![CDATA[a]]b]]>",
    "<!-- unterminated", "<![CDATA[unterminated",
    // entities (literal replaces — exercised via the composed chains)
    "&amp;lt; &lt; &gt; &amp;", "a &amp;amp; b")

  private val fuzz: Seq[String] = {
    val rnd = new scala.util.Random(18)
    val frags = Seq(
      "http", "https", "://", "a", "b9", ".", "..", "@", "@@", "%+-", "_",
      " ", "\t", "\n", "\f\r", "", "co", "comX", "x.y", "-", "<", ">",
      "\"", "'", "=", "&", "123", "4567", "89012345", "é", "日本語", "ア",
      "😀", "٣", "<a", "<script", "</script>", "<style", "</style>",
      "<!--", "-->", "<![CDATA[", "]]>", "ref", "title=\"x>y\"", "href='u>v'",
      "&lt;", "&gt;", "&amp;", "e@f.gg", "http://q.r/s")
    (0 until 400).map { _ =>
      val n = rnd.nextInt(16)
      (0 until n).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
  }

  private def df = {
    import spark.implicits._
    (adversarial ++ fuzz).zipWithIndex.map(_.swap).toDF("id", "text")
  }

  private def assertParity(nat: Column, ref: Column, what: String): Unit = {
    val bad = df.select(col("id"), col("text"), nat.as("nat"), ref.as("ref"))
      .filter(not(col("nat") <=> col("ref")))
      .collect()
    assert(bad.isEmpty, s"$what mismatches (${bad.length}): " +
      bad.take(5).map(r => s"[${r.get(1)}] nat=${r.get(2)} ref=${r.get(3)}")
        .mkString(" | "))
  }

  test("urlRedact/urlCount == java regex https?://[^\\s]+") {
    assertParity(TextCleanExprs.urlRedact(col("text"), "<URL>"),
      regexp_replace(col("text"), lit(urlRe), lit("<URL>")), "urlRedact")
    assertParity(TextCleanExprs.urlCount(col("text")),
      size(regexp_extract_all(col("text"), lit(urlRe), lit(0))).cast("long"),
      "urlCount")
  }

  test("emailRedact/emailCount == java regex email pattern (backtracking shapes)") {
    assertParity(TextCleanExprs.emailRedact(col("text"), "<EMAIL>"),
      regexp_replace(col("text"), lit(emailRe), lit("<EMAIL>")), "emailRedact")
    assertParity(TextCleanExprs.emailCount(col("text")),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long"),
      "emailCount")
  }

  test("numRedact/numCount == java regex \\b\\d{6,}\\b incl. Unicode \\b neighbors") {
    assertParity(TextCleanExprs.numRedact(col("text"), "<NUM>"),
      regexp_replace(col("text"), lit(numRe), lit("<NUM>")), "numRedact")
    assertParity(TextCleanExprs.numCount(col("text")),
      size(regexp_extract_all(col("text"), lit(numRe), lit(0))).cast("long"),
      "numCount")
  }

  test("wsCollapse == java regex \\s+ → ' ' (ASCII only; NBSP preserved)") {
    assertParity(TextCleanExprs.wsCollapse(col("text")),
      regexp_replace(col("text"), lit("\\s+"), lit(" ")), "wsCollapse")
  }

  test("html strips == java regex on the exact CleanOps patterns") {
    assertParity(TextCleanExprs.stripScript(col("text")),
      regexp_replace(col("text"), lit(graft.ml.CleanOps.scriptRe), lit("")),
      "stripScript")
    assertParity(TextCleanExprs.stripStyle(col("text")),
      regexp_replace(col("text"), lit(graft.ml.CleanOps.styleRe), lit("")),
      "stripStyle")
    assertParity(TextCleanExprs.stripComment(col("text")),
      regexp_replace(col("text"), lit("(?s)<!--.*?-->"), lit("")),
      "stripComment")
    assertParity(TextCleanExprs.stripCdata(col("text")),
      regexp_replace(col("text"), lit("(?is)<!\\[CDATA\\[.*?\\]\\]>"), lit("")),
      "stripCdata")
    assertParity(TextCleanExprs.stripTags(col("text")),
      regexp_replace(col("text"), lit(graft.ml.CleanOps.tagRe), lit(" ")),
      "stripTags")
    assertParity(TextCleanExprs.tagCount(col("text")),
      size(regexp_extract_all(col("text"), lit(graft.ml.CleanOps.tagRe),
        lit(0))).cast("long"),
      "tagCount")
  }

  test("composed chains == regexp references on the fixture-gate synth columns") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    // q_redact's synth formula
    val redactSynth = concat(col("text"),
      lit(" Contact user"), col("doc_id"),
      lit("@mail.example.com via https://ex.org/d/"), col("doc_id"),
      lit(" ref "), (col("doc_id") * 1000003L + 7000000L).cast("long"))
    // q_html_strip's synth formula
    val htmlSynth = concat(
      lit("<html><head><style>p{color:red}</style><!-- nav: home | about | doc "),
      col("doc_id"),
      lit(" --></head><body><h1>Doc "),
      col("doc_id"),
      lit("</h1><a title=\"notes > ok\" href='/p?a=1&b=2'>ref</a>" +
        "<![CDATA[raw <markup> & bytes]]><p>"), col("text"),
      lit(" &amp; more &lt;tags&gt;</p><script>var x=1;</script></body></html>"))
    val bad = docs.select(
      graft.ml.TextOps.normalizeText(
        graft.ml.TextOps.redactPii(redactSynth)).as("r_nat"),
      graft.ml.TextOps.normalizeTextColumns(
        graft.ml.TextOps.redactPiiColumns(redactSynth)).as("r_ref"),
      graft.ml.CleanOps.stripHtml(htmlSynth).as("h_nat"),
      graft.ml.CleanOps.stripHtmlColumns(htmlSynth).as("h_ref"))
      .filter(not(col("r_nat") <=> col("r_ref")) ||
        not(col("h_nat") <=> col("h_ref")))
      .count()
    assert(bad == 0, "composed native chains drifted from the regexp chains")
  }

  test("null text: native replaces and counts are null, like regexp_replace") {
    import spark.implicits._
    val d = Seq(Option.empty[String], Some("a@b.cc  x")).toDF("text")
    val rows = d.select(
      TextCleanExprs.emailRedact(col("text"), "<EMAIL>").as("e"),
      TextCleanExprs.wsCollapse(col("text")).as("w"),
      TextCleanExprs.urlCount(col("text")).as("c")).collect()
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2))
  }

  test("doGenCode compiles: codegen-only parity for replaces and counts") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      assertParity(TextCleanExprs.emailRedact(col("text"), "<EMAIL>"),
        regexp_replace(col("text"), lit(emailRe), lit("<EMAIL>")),
        "emailRedact codegen")
      assertParity(TextCleanExprs.stripTags(col("text")),
        regexp_replace(col("text"), lit(graft.ml.CleanOps.tagRe), lit(" ")),
        "stripTags codegen")
      assertParity(TextCleanExprs.numCount(col("text")),
        size(regexp_extract_all(col("text"), lit(numRe), lit(0))).cast("long"),
        "numCount codegen")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
