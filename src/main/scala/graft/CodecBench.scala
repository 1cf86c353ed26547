package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.codecs.{InMemorySchemaRegistry, ZAvro}

/** Micro-bench for the registry-Avro codec seam: native Catalyst
  * expressions (AvroRegistryDecode/EncodeExpr) vs the round-2 UDF+JSON
  * path (Row UDF encode; render-to-JSON + from_json decode), on the same
  * events-shaped data. Prints one JSON line with rows/sec for all four.
  *
  * Usage: runMain graft.CodecBench [sfDir] [repeatFactor]
  */
object CodecBench {

  // ---- the round-2 implementation, kept verbatim for comparison ----
  private def legacyEncode(value: Column, st: StructType, namespace: String,
      registry: codecs.SchemaRegistry): Column = {
    val subject = s"$namespace.${ZAvro.recordName(st)}"
    val id = registry.createSchema(subject, ZAvro.registryJson(st, namespace))
    val schemaJson = ZAvro.avroSchema(st, namespace).toString
    val f = udf((r: org.apache.spark.sql.Row) =>
      if (r == null) null
      else ZAvro.frame(id, ZAvro.encodeRow(r,
        new org.apache.avro.Schema.Parser().parse(schemaJson))))
    f(value)
  }

  private def legacyDecode(message: Column, st: StructType,
      registry: codecs.SchemaRegistry): Column = {
    val json = udf((msg: Array[Byte]) =>
      if (msg == null) null
      else {
        val (id, body) = ZAvro.unframe(msg)
        val schema = new org.apache.avro.Schema.Parser().parse(registry.getSchema(id))
        ZAvro.decodeToJson(body, schema)
      })
    from_json(json(message), st, Map.empty[String, String])
  }

  private def time(label: String, rows: Long)(df: => DataFrame): (String, Double) = {
    df.count() // warm-up
    val t0 = System.nanoTime()
    df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    label -> rows / sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val repeat = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .select(struct(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"), col("props")).as("v"))
    val src = (1 to repeat).map(_ => base).reduce(_ union _).cache()
    val rows = src.count()
    val st = src.schema("v").dataType.asInstanceOf[StructType]
    val reg = new InMemorySchemaRegistry

    val encodedNative = src.select(
      ZAvro.encodeColumn(col("v"), st, "bench", reg).as("msg")).cache()
    encodedNative.count()

    val results = Seq(
      time("encode_native", rows)(
        src.select(ZAvro.encodeColumn(col("v"), st, "bench", reg).as("msg"))
          .filter(length(col("msg")) > 0)),
      time("encode_legacy", rows)(
        src.select(legacyEncode(col("v"), st, "bench", reg).as("msg"))
          .filter(length(col("msg")) > 0)),
      time("decode_native", rows)(
        encodedNative.select(ZAvro.decodeColumn(col("msg"), st, reg).as("v"))
          .filter(col("v.event_id").isNotNull)),
      time("decode_legacy", rows)(
        encodedNative.select(legacyDecode(col("msg"), st, reg).as("v"))
          .filter(col("v.event_id").isNotNull)))

    val js = results.map { case (k, v) => "\"" + k + f"\":$v%.0f" }.mkString("{", ",", "}")
    println(s"""{"metric":"codec_rows_per_sec","rows":$rows,"results":$js}""")
    spark.stop()
  }
}
