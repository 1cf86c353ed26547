package graft.operators

import graft.GQuery
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Connector-surface semantics from SURVEY §2A re-expressed over the test
  * tables: the Kafka envelope wrap (consumer), JSON payload decode
  * (Connect-JSON's payload path), and offset-monotonicity bookkeeping.
  * Full codec implementations live in graft.codecs; these queries prove the
  * envelope/decode *shape* against a SQL oracle.
  */
object Connector {

  // ---- envelope wrap: {kafka:{topic,partition,offset}, key, value} -------
  // ref: fifo/consumer.go:124-147; README.md:123-134. The struct is built
  // and then flattened so the oracle can hash it column-wise.
  private val qEnvelope = GQuery(
    "q_envelope",
    (s, d) =>
      events(s, d)
        .select(
          struct(
            col("event_type").as("topic"),
            lit(0L).as("partition"),
            col("event_id").cast("long").as("offset")).as("kafka"),
          struct(col("user_id")).as("key"),
          struct(col("value"), col("props")).as("value"))
        .select(
          col("kafka.topic").as("topic"),
          col("kafka.partition").as("partition"),
          col("kafka.offset").as("offset"),
          col("key.user_id").as("key_user_id"),
          col("value.value").as("v"),
          col("value.props").as("props")),
    Some("""SELECT event_type AS topic, CAST(0 AS BIGINT) AS partition,
                   CAST(event_id AS BIGINT) AS offset,
                   user_id AS key_user_id, value AS v, props
            FROM events"""))

  // ---- JSON payload decode (Connect-JSON payload path) -------------------
  // ref: connectjson/connectjson.go:185-228
  private val qConnectJson = GQuery(
    "q_connect_json",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events"""))

  // ---- per-topic offset monotonicity check (consumer offset guard) -------
  // ref: fifo/consumer.go:118-122 — the consumer asserts offsets only move
  // forward per topic; as a set query: max gap + count per topic.
  private val qOffsetGuard = GQuery(
    "q_offset_guard",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // scale caveat (same as q_offset_assign's): a per-topic lag window
      // sorts each topic's history in ONE task — right for this batch
      // AUDIT gate, whose set-query form the oracle mirrors; production
      // gap detection is the streaming path (Sync consumes per-partition
      // in offset order, so a gap is a per-batch monotonicity check, not
      // a corpus sort)
      val w = Window.partitionBy("event_type").orderBy("event_id")
      events(s, d)
        .withColumn("prev", lag("event_id", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("event_type").as("topic"))
        .agg(
          max(col("event_id") - col("prev")).cast("long").as("max_gap"),
          min(col("event_id") - col("prev")).cast("long").as("min_gap"),
          count(lit(1)).as("steps"))
    },
    Some("""SELECT event_type AS topic,
                   CAST(max(gap) AS BIGINT) AS max_gap,
                   CAST(min(gap) AS BIGINT) AS min_gap,
                   count(*) AS steps
            FROM (SELECT event_type,
                         event_id - lag(event_id) OVER (PARTITION BY event_type ORDER BY event_id) AS gap
                  FROM events)
            WHERE gap IS NOT NULL GROUP BY 1"""))

  // ---- codec round-trips as identity checks ------------------------------
  // encode→decode must be the identity; the oracle is the bare projection.
  private val eventStruct = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
  }

  private val qCodecConnect = GQuery(
    "q_codec_connect",
    (s, d) => {
      import graft.codecs.ConnectJson
      val src = events(s, d).select(
        struct(col("event_id"), col("user_id"), col("event_type"), col("value")).as("v"))
      src.select(ConnectJson.decode(ConnectJson.encode(col("v"), eventStruct),
        eventStruct).as("v"))
        .select("v.*")
    },
    Some("SELECT event_id, user_id, event_type, value FROM events"))

  private val qCodecAvro = GQuery(
    "q_codec_avro",
    (s, d) => {
      import graft.codecs.{InMemorySchemaRegistry, ZAvro}
      val registry = new InMemorySchemaRegistry
      val src = events(s, d).select(
        struct(col("event_id"), col("user_id"), col("event_type"), col("value")).as("v"))
      src.select(ZAvro.decodeColumn(
        ZAvro.encodeColumn(col("v"), eventStruct, "graft", registry),
        eventStruct, registry).as("v"))
        .select("v.*")
    },
    Some("SELECT event_id, user_id, event_type, value FROM events"))

  // ---- dynamic typing via Spark 4 Variant ---------------------------------
  // Zed values are dynamically typed per record; Spark 4's VariantType is
  // the native analogue for payloads whose shape isn't declared up front.
  // parse_json keeps the payload opaque until a typed extraction.
  private val qVariant = GQuery(
    "q_variant",
    (s, d) =>
      events(s, d).select(
        col("event_id"),
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k")),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events"""))

  private val qDistinctAgg = GQuery(
    "q_distinct_agg",
    (s, d) =>
      graft.sources.Tables.documents(s, d)
        .groupBy("source")
        .agg(countDistinct(col("lang")).cast("long").as("n_langs"),
          count(lit(1)).as("n_docs")),
    Some("""SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   count(*) AS n_docs
            FROM documents GROUP BY 1"""))

  val queries: Seq[GQuery] =
    Seq(qEnvelope, qConnectJson, qOffsetGuard, qCodecConnect, qCodecAvro,
      qVariant, qDistinctAgg)
}
