package graft

import org.apache.spark.sql.functions._

/** Dev measurement tool (guide §1.4): per-row throughput of the native
  * text-clean chains vs their regexp reference formulations, on a
  * synthetic corpus big enough that expression work dominates session
  * overhead — the gate corpora are far too small for that (q_redact's
  * whole regex budget at sf1 is ~10 ms of a ~240 ms invocation, so gate
  * A/Bs read as a wash at any SF this box holds; this tool measures the
  * factor the gates buy at 100 TB). Both variants run in ONE session,
  * alternating, timed with the noop sink (every column of every row).
  *
  * usage: CleanExprBench [rows=2000000] [reps=3]
  */
object CleanExprBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(2000000)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~340 bytes/row of web-ish dirt: tags, quoted '>', entities, a
    // comment, a script block, an email, a URL, a long id, spaced runs
    val synth = concat(
      lit("<html><head><style>p{color:red}</style><!-- nav: home | about | doc "),
      col("id"),
      lit(" --></head><body><h1>Doc "), col("id"),
      lit("</h1><a title=\"notes > ok\" href='/p?a=1&b=2'>ref</a><p>lorem ipsum "),
      lit("dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "),
      lit("contact user"), col("id"),
      lit("@mail.example.com via https://ex.org/d/"), col("id"),
      lit(" ref "), (col("id") * 1000003L + 7000000L).cast("long"),
      lit(" &amp; more &lt;tags&gt;\t tail  text</p><script>var x=1;</script></body></html>"))
    val base = spark.range(rows.toLong).select(col("id"), synth.as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count() // materialize once so both variants read the same cache

    def time(name: String, df: org.apache.spark.sql.DataFrame): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      s
    }

    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "redact_native" -> base.select(
        ml.TextOps.normalizeText(ml.TextOps.redactPii(col("text"))).as("c")),
      "redact_regexp" -> base.select(
        ml.TextOps.normalizeTextColumns(ml.TextOps.redactPiiColumns(col("text"))).as("c")),
      "html_native" -> base.select(ml.CleanOps.stripHtml(col("text")).as("c"),
        graft.functions.TextCleanExprs.tagCount(col("text")).as("n")),
      "html_regexp" -> base.select(ml.CleanOps.stripHtmlColumns(col("text")).as("c"),
        size(regexp_extract_all(col("text"), lit(ml.CleanOps.tagRe), lit(0)))
          .cast("long").as("n")),
      "fingerprint_native" -> base.select(
        md5(lower(graft.functions.TextCleanExprs.wsCollapse(trim(col("text"))))).as("fp")),
      "fingerprint_regexp" -> base.select(
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp")))

    // one warm-up each, then alternate reps (drift hits both variants)
    variants.foreach { case (n, df) => time(s"warmup $n", df) }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (n, df) <- variants)
      acc(n) = acc(n) :+ time(n, df)
    variants.foreach { case (n, _) =>
      val xs = acc(n).sorted
      println(f"CLEANBENCH $n%-20s med=${xs(xs.length / 2)}%.3f s  " +
        f"min=${xs.head}%.3f  rows=$rows")
    }
    spark.stop()
  }
}
