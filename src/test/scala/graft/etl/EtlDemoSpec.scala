package graft.etl

import graft.GraftSession
import graft.lake.Pool
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end golden test of the ETL pipeline against the reference's
  * etl-demo scenario: same invoices.yaml transform, same 4 CDC batches,
  * asserting the full Staging pool contents (incl. done records) after
  * every run — derived from ztests/etl-demo.yaml:24-88 — plus idempotency
  * (a re-run with no new input commits nothing).
  */
class EtlDemoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  val invoicesYaml: String =
    """inputs:
      |  - topic: Invoices
      |    pool: Raw
      |  - topic: InvoiceStatus
      |    pool: Raw
      |output:
      |  topic: NewInvoices
      |  pool: Staging
      |transforms:
      |  - type: denorm
      |    where: value.op in ["c", "r"]
      |    left: Invoices
      |    right: InvoiceStatus
      |    join-on: left.value.after.ID=right.value.after.InvoiceID
      |    out: NewInvoices
      |    zed: |
      |      | out:={
      |          key: left.key,
      |          value: {
      |            ID: left.value.after.ID,
      |            customer: left.value.after.customer,
      |            item: left.value.after.item,
      |            invoice_status: right.value.after.status
      |          }
      |        }
      |  - type: stateless
      |    where: value.op=="u"
      |    in: InvoiceStatus
      |    out: NewInvoices
      |    zed: |
      |      | out:={
      |          key: {
      |            ID: in.value.after.InvoiceID
      |          },
      |          value: {
      |            ID: in.value.after.InvoiceID,
      |            invoice_status: in.value.after.status
      |          }
      |        }
      |  - type: stateless
      |    where: value.op=="u"
      |    in: Invoices
      |    out: NewInvoices
      |    zed: |
      |      | out:={
      |          key: in.key,
      |          value: in.value.after
      |        }
      |  - type: stateless
      |    where: value.op=="d"
      |    in: Invoices
      |    out: NewInvoices
      |    zed: |
      |      | out:={
      |          key: in.key,
      |          value: cast(null, typeof(in.value.before))
      |        }
      |""".stripMargin

  // Debezium-style CDC envelope schema (before/after same shape, fused
  // across the two topics — what a Connect schema would declare).
  val rowSchema: StructType = {
    val rec = StructType(Seq(
      StructField("ID", LongType), StructField("customer", StringType),
      StructField("item", StringType), StructField("InvoiceID", LongType),
      StructField("status", StringType)))
    StructType(Seq(
      StructField("kafka", StructType(Seq(
        StructField("topic", StringType), StructField("offset", LongType)))),
      StructField("key", StructType(Seq(StructField("ID", LongType)))),
      StructField("value", StructType(Seq(
        StructField("op", StringType),
        StructField("before", rec), StructField("after", rec))))))
  }

  def rec(id: java.lang.Long = null, customer: String = null, item: String = null,
      invoiceId: java.lang.Long = null, status: String = null): Row =
    Row(id, customer, item, invoiceId, status)

  def cdc(topic: String, offset: Long, keyId: Long, op: String,
      before: Row = null, after: Row = null): Row =
    Row(Row(topic, offset), Row(keyId: java.lang.Long), Row(op, before, after))

  val batches: Seq[Seq[Row]] = Seq(
    // batch-1 (demo/batch-1.zson)
    Seq(
      cdc("Invoices", 1, 100, "r", after = rec(100L, "Alice", "taco")),
      cdc("Invoices", 2, 101, "r", after = rec(101L, "Bob", "burrito")),
      cdc("InvoiceStatus", 1, 80, "r", after = rec(80L, invoiceId = 101L, status = "pending")),
      cdc("InvoiceStatus", 2, 32, "r", after = rec(32L, invoiceId = 100L, status = "pending"))),
    // batch-2
    Seq(
      cdc("Invoices", 3, 102, "c", after = rec(102L, "Charlie", "enchilada")),
      cdc("Invoices", 4, 103, "c", after = rec(103L, "Dan", "beans")),
      cdc("InvoiceStatus", 3, 77, "c", after = rec(77L, invoiceId = 102L, status = "pending"))),
    // batch-3
    Seq(
      cdc("InvoiceStatus", 4, 192, "c", after = rec(192L, invoiceId = 103L, status = "pending")),
      cdc("InvoiceStatus", 5, 32, "u", after = rec(32L, invoiceId = 100L, status = "closed"))),
    // batch-4
    Seq(
      cdc("InvoiceStatus", 6, 192, "u", after = rec(192L, invoiceId = 103L, status = "collections")),
      cdc("InvoiceStatus", 7, 77, "u", after = rec(77L, invoiceId = 102L, status = "paid")),
      cdc("InvoiceStatus", 8, 80, "u", after = rec(80L, invoiceId = 101L, status = "paid"))))

  def poolContents(p: Pool): Seq[String] =
    graft.zson.Zson.renderAll(p.read()).toSeq.sorted

  val goldenAfterRun: Seq[Seq[String]] = {
    val run1 = Seq(
      """{key:{ID:100},value:{ID:100,customer:"Alice",item:"taco",invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:0}}""",
      """{key:{ID:101},value:{ID:101,customer:"Bob",item:"burrito",invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:1}}""",
      """{kafka:{topic:"Invoices",offset:1}}(=done)""",
      """{kafka:{topic:"InvoiceStatus",offset:1}}(=done)""",
      """{kafka:{topic:"Invoices",offset:2}}(=done)""",
      """{kafka:{topic:"InvoiceStatus",offset:2}}(=done)""")
    val run2 = run1 ++ Seq(
      """{key:{ID:102},value:{ID:102,customer:"Charlie",item:"enchilada",invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:2}}""",
      """{kafka:{topic:"Invoices",offset:3}}(=done)""",
      """{kafka:{topic:"InvoiceStatus",offset:3}}(=done)""")
    val run3 = run2 ++ Seq(
      """{key:{ID:103},value:{ID:103,customer:"Dan",item:"beans",invoice_status:"pending"},kafka:{topic:"NewInvoices",offset:3}}""",
      """{kafka:{topic:"Invoices",offset:4}}(=done)""",
      """{kafka:{topic:"InvoiceStatus",offset:4}}(=done)""",
      """{key:{ID:100},value:{ID:100,invoice_status:"closed"},kafka:{topic:"NewInvoices",offset:4}}""",
      """{kafka:{topic:"InvoiceStatus",offset:5}}(=done)""")
    val run4 = run3 ++ Seq(
      """{key:{ID:103},value:{ID:103,invoice_status:"collections"},kafka:{topic:"NewInvoices",offset:5}}""",
      """{kafka:{topic:"InvoiceStatus",offset:6}}(=done)""",
      """{key:{ID:102},value:{ID:102,invoice_status:"paid"},kafka:{topic:"NewInvoices",offset:6}}""",
      """{kafka:{topic:"InvoiceStatus",offset:7}}(=done)""",
      """{key:{ID:101},value:{ID:101,invoice_status:"paid"},kafka:{topic:"NewInvoices",offset:7}}""",
      """{kafka:{topic:"InvoiceStatus",offset:8}}(=done)""")
    Seq(run1, run2, run3, run4)
  }

  test("etl-demo: 4 incremental batches reproduce the reference golden output") {
    val root = Files.createTempDirectory("graft-etl-demo").toString
    val transform = Transform.fromYaml(invoicesYaml)
    val raw = Pool.create(spark, root, "Raw")
    Pool.create(spark, root, "Staging")

    batches.zipWithIndex.foreach { case (batch, i) =>
      raw.append(spark.createDataFrame(
        spark.sparkContext.parallelize(batch), rowSchema))
      val pipeline = new Pipeline(spark, transform, root)
      val n = pipeline.run()
      assert(n > 0, s"run ${i + 1} wrote nothing")
      val got = poolContents(pipeline.outputPool)
      val want = goldenAfterRun(i).sorted
      assert(got == want,
        s"run ${i + 1} mismatch:\n got=${got.mkString("\n  ")}\nwant=${want.mkString("\n  ")}")
    }

    // idempotency: nothing new to do
    val again = new Pipeline(spark, transform, root)
    assert(again.run() == 0L, "re-run with no new input must commit nothing")
  }

  test("etl-demo commits land via HTTP conditional PUT (store-backed lake shape)") {
    // same 4-batch golden scenario, but EVERY manifest publication —
    // input seeding and pipeline commits alike — goes through the
    // HttpConditionalPut client against the server-side create-if-absent
    // double. Proves a store-backed lake is a constructor swap: identical
    // golden bytes, with the commit counter showing the protocol actually
    // rode HTTP.
    val root = Files.createTempDirectory("graft-etl-http").toString
    val srv = graft.lake.CPutHttpServer.start()
    try {
      val base = java.net.URI.create(s"http://127.0.0.1:${srv.getAddress.getPort}")
      val puts = new java.util.concurrent.atomic.AtomicLong(0L)
      val inner = new graft.lake.HttpConditionalPut(base)
      val http = new graft.lake.CommitPublisher {
        def publish(target: java.nio.file.Path, tmp: java.nio.file.Path): Boolean = {
          puts.incrementAndGet(); inner.publish(target, tmp)
        }
      }
      val transform = Transform.fromYaml(invoicesYaml)
      val raw = Pool.create(spark, root, "Raw", publisher = http)
      Pool.create(spark, root, "Staging", publisher = http)

      batches.zipWithIndex.foreach { case (batch, i) =>
        raw.append(spark.createDataFrame(
          spark.sparkContext.parallelize(batch), rowSchema))
        val pipeline = new Pipeline(spark, transform, root, publisher = http)
        assert(pipeline.run() > 0, s"run ${i + 1} wrote nothing")
        val got = poolContents(pipeline.outputPool)
        assert(got == goldenAfterRun(i).sorted,
          s"run ${i + 1} over HTTP commits diverged from the golden output")
      }
      // 4 input appends + 4 pipeline output commits at minimum, all HTTP
      assert(puts.get() >= 8,
        s"commits did not ride the HTTP publisher (saw ${puts.get()} PUTs)")
      assert(new Pipeline(spark, transform, root, publisher = http).run() == 0L)
    } finally srv.stop(0)
  }

  test("compiled plan has the reference scaffold shape (etl-zed golden)") {
    // the structural equivalent of ztests/etl-zed.yaml: the compiled
    // program contains the anti-join scaffold, the per-rule branches
    // unioned, and the offset-renumbering window
    val transform = Transform.fromYaml(invoicesYaml)
    val input = spark.createDataFrame(
      spark.sparkContext.parallelize(batches.head), rowSchema)
    val done = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("topic", StringType),
        StructField("offset", LongType))))
    val plan = Compiler.compile(transform)
      .run(input, done, Map.empty).queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), "anti-join scaffold")
    assert(plan.contains("Join Inner"), "denorm join")
    assert(plan.contains("Union"), "fork/branch union")
    assert(plan.contains("row_number"), "offset renumbering window")
    assert(plan.contains("Sort"), "trailing sort by kafka.offset")
  }

  test("zed expression translator handles the demo corpus") {
    import ZedExpr._
    assert(parse("""value.op in ["c", "r"]""") ==
      In(Path(Seq("value", "op")), Seq(StrLit("c"), StrLit("r"))))
    assert(parse("""value.op=="u"""") == Cmp("=", Path(Seq("value", "op")), StrLit("u")))
    val rec = parseOutAssign(
      """| out:={ key: in.key, value: { ID: in.value.after.InvoiceID } }""")
    assert(rec.isInstanceOf[RecordLit])
    assert(parse("""cast(null, typeof(in.value.before))""") ==
      CastNullTypeof(Path(Seq("in", "value", "before"))))
    assert(parse("""(value.op=="u") and kafka.topic=="T"""") ==
      And(Cmp("=", Path(Seq("value", "op")), StrLit("u")),
        Cmp("=", Path(Seq("kafka", "topic")), StrLit("T"))))
    // arithmetic + array indexing (demo/etl.zed: qty * price, records[0])
    assert(parse("value.qty * value.price + 1") ==
      Arith("+", Arith("*", Path(Seq("value", "qty")), Path(Seq("value", "price"))),
        NumLit("1")))
    assert(parse("records[0]") == Index(Path(Seq("records")), 0))
    assert(parse("value.total / 2 >= 10") ==
      Cmp(">=", Arith("/", Path(Seq("value", "total")), NumLit("2")), NumLit("10")))
    assert(parse("value.n % 3 == 0") ==
      Cmp("=", Arith("%", Path(Seq("value", "n")), NumLit("3")), NumLit("0")))
    // indexing does not break in-lists
    assert(parse("""value.op in ["c"]""") ==
      In(Path(Seq("value", "op")), Seq(StrLit("c"))))
    // const-map literal + lookup (demo/etl.zed:1-18, inlined)
    assert(parse("""|{ "jane": 1, "bob": 2 }|[value.customer]""") ==
      Lookup(MapLit(Seq(StrLit("jane") -> NumLit("1"), StrLit("bob") -> NumLit("2"))),
        Path(Seq("value", "customer"))))
    // an integer subscript stays array indexing even after a lookup
    assert(parse("""|{ "a": 1 }|[value.k]""").isInstanceOf[Lookup])
    assert(parse("records[0][1]") == Index(Index(Path(Seq("records")), 0), 1))
  }

  test("map literal + lookup evaluates via element_at") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(("jane", 1L), ("sarah", 2L)).toDF("customer", "n")
    val c = ZedExpr.toColumn(
      ZedExpr.parse("""|{ "jane": 10, "bob": 20 }|[customer]"""), df.schema)
    val got = df.select(col("customer"), c.as("id")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got == Map("jane" -> Some(10L), "sarah" -> None))
  }

  test("string literal escapes translate (\\n is a newline, not 'n')") {
    import ZedExpr._
    assert(parse("""value.s=="a\nb"""") ==
      Cmp("=", Path(Seq("value", "s")), StrLit("a\nb")))
    assert(parse("\"t\\tab\"") == StrLit("t\tab"))
    assert(parse("\"q\\\"uote\\\\back\"") == StrLit("q\"uote\\back"))
    assert(parse("\"u\\u0041\"") == StrLit("uA"))
    intercept[IllegalArgumentException](parse("\"bad\\zescape\""))
  }

  test("arithmetic and indexing evaluate in transforms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((3L, 4L, Seq("a", "b"))).toDF("qty", "price", "records")
    val out = df.select(
      ZedExpr.toColumn(ZedExpr.parse("qty * price + 1"), df.schema).as("v"),
      ZedExpr.toColumn(ZedExpr.parse("records[1]"), df.schema).as("second"))
    assert(out.head() == org.apache.spark.sql.Row(13L, "b"))
  }
}
