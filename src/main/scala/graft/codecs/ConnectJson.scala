package graft.codecs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-Connect-JSON envelope codec: every message is
  * `{"schema": <connect schema>, "payload": <value>}`
  * (ref: connectjson/connectjson.go:29-43 encode, :185-273 decode).
  *
  * The schema side is a static translation between Spark StructType and the
  * Connect schema JSON; the payload side rides Spark's codegen'd
  * `to_json`/`from_json` (which already base64s BinaryType the way Connect
  * does, ref :127-128, :288-294). Decode "shaping" — casting + reordering
  * the inferred payload to the declared schema (ref :214-226) — is exactly
  * `from_json` with the target schema.
  *
  * Scale: both directions are single codegen'd expressions per row; the
  * schema JSON is computed once on the driver.
  */
object ConnectJson {

  // ---------------------------------------------------------------- schema
  /** Spark type → Connect schema JSON (ref marshalSchema,
    * connectjson.go:97-160). All fields optional, like the reference.
    */
  def schemaJson(dt: DataType, field: Option[String] = None): String = {
    val sb = new StringBuilder
    writeSchema(sb, dt, field)
    sb.toString
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def writeSchema(sb: StringBuilder, dt: DataType, field: Option[String]): Unit = {
    val typ = dt match {
      case ByteType => "int8"
      case ShortType => "int16"
      case IntegerType => "int32"
      case LongType | TimestampType | TimestampNTZType => "int64"
      case FloatType => "float"
      case DoubleType => "double"
      case BooleanType => "boolean"
      case BinaryType => "bytes"
      case StringType | DateType => "string"
      case _: StructType => "struct"
      case other =>
        throw new IllegalArgumentException(s"type unsupported by Connect: $other")
    }
    sb.append(s"""{"type":"${typ}","optional":true""")
    field.foreach(f => sb.append(s""","field":"${esc(f)}""""))
    dt match {
      case st: StructType =>
        sb.append(""","fields":[""")
        st.fields.zipWithIndex.foreach { case (f, i) =>
          if (i > 0) sb.append(',')
          writeSchema(sb, f.dataType, Some(f.name))
        }
        sb.append(']')
      case _ =>
    }
    sb.append('}')
  }

  /** Connect schema JSON → Spark type (ref decodeSchema,
    * connectjson.go:230-273). Everything nullable.
    */
  def schemaToSpark(json: String): DataType = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    fromNode(om.readTree(json))
  }

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): DataType =
    n.get("type").asText() match {
      case "int8" => ByteType
      case "int16" => ShortType
      case "int32" => IntegerType
      case "int64" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "boolean" => BooleanType
      case "bytes" => BinaryType
      case "string" => StringType
      case "struct" =>
        val fields = n.get("fields").elements()
        val buf = scala.collection.mutable.Buffer[StructField]()
        while (fields.hasNext) {
          val f = fields.next()
          buf += StructField(f.get("field").asText(), fromNode(f))
        }
        StructType(buf.toSeq)
      case other =>
        throw new IllegalArgumentException(s"unsupported Connect type: $other")
    }

  // ---------------------------------------------------------------- value
  /** Encode a struct column into the Connect envelope string.
    *
    * Timestamp columns go over the wire as int64 nanoseconds — matching
    * both our own schemaJson ("int64") and the reference, which encodes
    * Zed time as int64 ns (connectjson.go:119 via marshalPayload) — rather
    * than `to_json`'s default ISO-8601 string rendering.
    */
  def encode(value: Column, dt: DataType): Column = {
    val wired = if (hasTimestamp(dt)) toWire(value, dt) else value
    concat(
      lit("""{"schema":""" + schemaJson(dt) + ""","payload":"""),
      when(value.isNull, lit("null")).otherwise(to_json(wired)),
      lit("}"))
  }

  private def hasTimestamp(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case st: StructType => st.fields.exists(f => hasTimestamp(f.dataType))
    case ArrayType(inner, _) => hasTimestamp(inner)
    case _ => false
  }

  /** StructType with every timestamp leaf replaced by LongType (ns). */
  private def wireType(dt: DataType): DataType = dt match {
    case TimestampType | TimestampNTZType => LongType
    case st: StructType =>
      StructType(st.fields.map(f => StructField(f.name, wireType(f.dataType))))
    case ArrayType(inner, n) => ArrayType(wireType(inner), n)
    case other => other
  }

  /** Recursively rewrite timestamp leaves to int64 ns for the wire. */
  private def toWire(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c) * 1000L
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * 1000L
    case st: StructType if hasTimestamp(st) =>
      when(c.isNull, lit(null).cast(wireType(st))).otherwise(
        struct(st.fields.toSeq.map(f => toWire(c.getField(f.name), f.dataType).as(f.name)): _*))
    case ArrayType(inner, _) if hasTimestamp(inner) =>
      transform(c, x => toWire(x, inner))
    case _ => c
  }

  /** Decode the payload of a Connect envelope string into `schema`,
    * reproducing the reference's shaper (connectjson.go:214-226): the
    * payload parses permissively (every leaf as string — Spark's Jackson
    * parser renders any token as text), then each leaf cast-shapes to the
    * declared type, fields reorder by name, and bytes leaves base64-decode
    * (ref :288-294). One parse + codegen'd casts.
    */
  def decode(message: Column, schema: DataType): Column =
    shape(
      from_json(get_json_object(message, "$.payload"), permissive(schema),
        Map.empty[String, String]),
      schema)

  private def permissive(dt: DataType): DataType = dt match {
    case st: StructType =>
      StructType(st.fields.map(f => StructField(f.name, permissive(f.dataType))))
    case ArrayType(inner, _) => ArrayType(permissive(inner))
    case _ => StringType
  }

  /** Recursive by-name cast of a permissively-parsed value to the declared
    * schema (Spark's struct cast is positional, so rebuild by name).
    */
  def shape(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      when(c.isNull, lit(null).cast(st)).otherwise(
        struct(st.fields.toSeq.map(f => shape(c.getField(f.name), f.dataType).as(f.name)): _*))
    case ArrayType(inner, _) => transform(c, x => shape(x, inner))
    case BinaryType => unbase64(c)
    case TimestampType | TimestampNTZType =>
      // Reference wire format carries time as int64 ns; a numeric string
      // cast straight to timestamp yields null. Parse the ns long and
      // truncate to µs (decimal division truncates toward zero, like Go);
      // fall back to an ISO-8601 string cast for non-numeric payloads.
      val ns = c.cast(LongType)
      val us = ns.cast(DecimalType(20, 0)).divide(lit(1000)).cast(LongType)
      coalesce(timestamp_micros(us), c.cast(TimestampType)).cast(dt)
    case other => c.cast(other)
  }

  /** Extract the embedded schema from one sample message (driver-side) —
    * for streams whose schema is carried in-band like the reference's.
    */
  def sniffSchema(sampleMessage: String): DataType = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    fromNode(om.readTree(sampleMessage).get("schema"))
  }
}
