package graft.functions

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JaccardSimExpr]] to the builtin
  * `size(array_intersect)/size(array_union)` formulation it replaced
  * ([[graft.functions.jaccardColumns]]) — value-identical for every
  * non-null input shape the verification loops can see: duplicates on
  * either side, empty arrays (union empty → 1.0), null ELEMENTS, long and
  * string element types, interpreted and codegen. The one deliberate
  * divergence (null ARRAY → null, not the legacy −1/−1 = 1.0) is pinned
  * explicitly.
  */
class JaccardExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def assertParityLong(rows: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])]): Unit = {
    import spark.implicits._
    val df = rows.toDF("a", "b")
    val bad = df.select(col("a"), col("b"),
      jaccard(col("a"), col("b")).as("nat"),
      jaccardColumns(col("a"), col("b")).as("ref"))
      .filter(not(col("nat") <=> col("ref"))).collect()
    assert(bad.isEmpty, s"long-array mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("long arrays: native == builtin formulation (dups, empties, nulls-in-array)") {
    val rnd = new scala.util.Random(18)
    def arr(): Seq[java.lang.Long] =
      Seq.fill(rnd.nextInt(12))(java.lang.Long.valueOf(rnd.nextInt(8).toLong))
    val cases: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] =
      Seq(
        (Seq.empty, Seq.empty),                       // union empty → 1.0
        (Seq.empty, Seq(1L: java.lang.Long)),
        (Seq(1L: java.lang.Long), Seq(1L: java.lang.Long)),
        (Seq[java.lang.Long](1L, 1L, 2L), Seq[java.lang.Long](2L, 2L, 3L)),
        (Seq[java.lang.Long](null, 1L), Seq[java.lang.Long](null, 2L)),  // null ∈ both → in intersection
        (Seq[java.lang.Long](null, null, 1L), Seq[java.lang.Long](2L)),  // null one side → union only
        (Seq[java.lang.Long](Long.MaxValue, Long.MinValue, 0L),
          Seq[java.lang.Long](0L, Long.MaxValue))) ++
        (0 until 60).map(_ => (arr(), arr()))
    assertParityLong(cases)
  }

  test("string arrays: native == builtin formulation (the ngram shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val words = Seq("a b c", "b c d", "c d é", "日本 語 x", "", "dup")
    def arr(): Seq[String] = Seq.fill(rnd.nextInt(10))(words(rnd.nextInt(words.length)))
    val cases = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x"), Seq("x")),
      (Seq("x", "x", "y"), Seq("y", "z"))) ++ (0 until 60).map(_ => (arr(), arr()))
    val df = cases.toDF("a", "b")
    val bad = df.select(
      jaccard(col("a"), col("b")).as("nat"),
      jaccardColumns(col("a"), col("b")).as("ref"))
      .filter(not(col("nat") <=> col("ref"))).count()
    assert(bad == 0)
  }

  test("doGenCode compiles: codegen-only parity on the shingle-hash shape") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"),
          TextExprs.shingleHashesNative(col("text"), 3).as("sh"))
      val pairs = docs.select(col("doc_id").as("a"), col("sh").as("sa"))
        .crossJoin(docs.select(col("doc_id").as("b"), col("sh").as("sb")))
        .filter(col("a") < col("b")).limit(2000)
      val bad = pairs.select(
        jaccard(col("sa"), col("sb")).as("nat"),
        jaccardColumns(col("sa"), col("sb")).as("ref"))
        .filter(not(col("nat") <=> col("ref"))).count()
      assert(bad == 0, "codegen jaccard drifted from the builtin formulation")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("null ARRAY input: native yields null (legacy formulation yields 1.0)") {
    // size(null) = -1 under ansi=false + legacy sizeOfNull, so the builtin
    // formulation returns (-1)/(-1) = 1.0 for a null array — an artifact,
    // not a similarity. No query path feeds a null array (the minhash
    // bases filter size(sh) > 0; candidates inner-join), and the DuckDB
    // oracles return NULL there, so the native expression's null-in →
    // null-out is the oracle-faithful choice. Pinned so it can't surprise.
    import spark.implicits._
    val d = Seq((Option.empty[Seq[Long]], Option(Seq(1L, 2L)))).toDF("a", "b")
    val r = d.select(
      jaccard(col("a"), col("b")).as("nat"),
      jaccardColumns(col("a"), col("b")).as("ref")).head()
    assert(r.isNullAt(0), "native jaccard of a null array must be null")
    assert(r.getDouble(1) == 1.0, "legacy formulation returns 1.0 here")
  }
}
