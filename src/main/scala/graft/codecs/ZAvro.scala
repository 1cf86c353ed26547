package graft.codecs

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.security.MessageDigest
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Confluent-registry Avro codec (ref: zavro/ package).
  *
  * Three layers, mirroring the reference:
  *  1. schema derivation: Spark StructType → Avro schema with every record
  *     field wrapped in a ["null", T] union (all-optional,
  *     zavro/schema.go:35-71), record names `zng_<md5 of the ZSON type
  *     string>` (schema.go:57-62), repeated records as named references,
  *     and time columns as `timestamp-micros` logical longs
  *     (zavro/microtime.go).
  *  2. registry JSON: byte-compatible with the Go implementation's
  *     Java-order `compatRecordSchema` rendering (schema.go:73-125) so a
  *     Confluent/Apicurio registry dedups our schemas against zync's —
  *     golden-tested against zavro/schema_test.go.
  *  3. wire format: 1 magic byte 0x00 + 4-byte big-endian schema ID + Avro
  *     binary body (zavro/encoder.go:59-66, decoder.go:35-52).
  *
  * The row codec is a pair of native Catalyst expressions
  * ([[AvroRegistryDecodeExpr]]/[[AvroRegistryEncodeExpr]]) going straight
  * between the Avro body and InternalRow with per-expression schema caches
  * (the reference caches per-consumer, zavro/decoder.go:54-72). The
  * Row-level helpers below ([[encodeRow]], [[decodeToJson]]) remain for
  * tests and the codec micro-bench.
  */
object ZAvro {

  // ------------------------------------------------------------- ZSON type
  /** Render a Spark type as the equivalent ZSON type string — the hashing
    * identity for record names (`zson.FormatType` in the reference).
    */
  def zsonType(dt: DataType): String = dt match {
    case st: StructType if isTaggedUnion(st) =>
      st.fields.drop(1).map(f => zsonType(f.dataType)).mkString("(", ",", ")")
    case st: StructType =>
      st.fields.map(f => s"${f.name}:${zsonType(f.dataType)}").mkString("{", ",", "}")
    case ArrayType(inner, _) => s"[${zsonType(inner)}]"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case StringType => "string"
    case BooleanType => "bool"
    case BinaryType => "bytes"
    case TimestampType | TimestampNTZType => "time"
    case NullType => "null"
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  /** The tagged-struct stand-in for Zed/Avro union types: {tag:int,
    * u0..uN}. [[avroToSpark]] produces this shape on decode; recognizing
    * it on encode closes the round trip (the reference is decode-only).
    */
  private[codecs] def isTaggedUnion(st: StructType): Boolean =
    st.fields.length >= 3 && st.fields.head.name == "tag" &&
      st.fields.head.dataType == IntegerType &&
      st.fields.drop(1).zipWithIndex.forall { case (f, i) => f.name == s"u$i" }

  def recordName(dt: DataType): String = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(zsonType(dt).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    s"zng_$hex"
  }

  // ------------------------------------------- registry JSON (Java order)
  private sealed trait J
  private case object JNull extends J
  private final case class JStr(s: String) extends J
  private final case class JArr(items: Seq[J]) extends J
  private final case class JObj(fields: Seq[(String, J)]) extends J

  private def jesc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Go json.MarshalIndent(v, "", "    ") compatible printer. */
  private def print(j: J, depth: Int): String = {
    val pad = "    " * depth
    val padIn = "    " * (depth + 1)
    j match {
      case JNull => "null"
      case JStr(s) => "\"" + jesc(s) + "\""
      case JArr(items) =>
        if (items.isEmpty) "[]"
        else items.map(i => padIn + print(i, depth + 1))
          .mkString("[\n", ",\n", s"\n$pad]")
      case JObj(fields) =>
        if (fields.isEmpty) "{}"
        else fields.map { case (k, v) => s"""$padIn"$k": ${print(v, depth + 1)}""" }
          .mkString("{\n", ",\n", s"\n$pad}")
    }
  }

  private final class RegistryJsonGen(namespace: String) {
    private val seen = scala.collection.mutable.Map[String, String]() // zson -> name

    def gen(dt: DataType): J = dt match {
      case st: StructType if isTaggedUnion(st) =>
        JArr(st.fields.toSeq.drop(1).map(f => gen(f.dataType)))
      case st: StructType =>
        val zson = zsonType(st)
        seen.get(zson) match {
          case Some(name) => JStr(name) // repeated record → named reference
          case None =>
            val name = recordName(st)
            seen(zson) = name
            val fields = st.fields.toSeq.map { f =>
              val inner = gen(f.dataType)
              val typ = inner match {
                case JStr("null") => inner // null-typed fields are not unioned
                case JArr(_) => inner // union fields embed as-is (no nesting)
                case _ => JArr(Seq(JStr("null"), inner))
              }
              // a null default is only legal when the first branch is null
              val nullOk = typ match {
                case JArr(items) => items.headOption.contains(JStr("null"))
                case _ => true
              }
              JObj(Seq("name" -> JStr(f.name), "type" -> typ) ++
                (if (nullOk) Seq("default" -> JNull) else Nil))
            }
            JObj(Seq(
              "type" -> JStr("record"),
              "name" -> JStr(name),
              "namespace" -> JStr(namespace),
              "doc" -> JStr("Created by zync from zng type " + zson),
              "fields" -> (if (fields.isEmpty) JNull else JArr(fields))))
        }
      case ArrayType(inner, _) =>
        JObj(Seq("type" -> JStr("array"), "items" -> gen(inner)))
      case ByteType | ShortType | IntegerType => JStr("int")
      case LongType => JStr("long")
      case FloatType => JStr("float")
      case DoubleType => JStr("double")
      case StringType => JStr("string")
      case BooleanType => JStr("boolean")
      case BinaryType => JStr("bytes")
      case TimestampType | TimestampNTZType =>
        JObj(Seq("type" -> JStr("long"), "logicalType" -> JStr("timestamp-micros")))
      case NullType => JStr("null")
      case other => throw new IllegalArgumentException(s"unsupported type: $other")
    }
  }

  /** The registry-submitted JSON — matches the Go/Java rendering exactly. */
  def registryJson(st: StructType, namespace: String): String =
    print(new RegistryJsonGen(namespace).gen(st), 0)

  // ------------------------------------------------- parseable Avro schema
  /** Programmatic org.apache.avro.Schema (avoids the reference's
    * `"fields": null` quirk which the Java parser rejects).
    */
  def avroSchema(st: StructType, namespace: String): ASchema = {
    val seen = scala.collection.mutable.Map[String, ASchema]()
    def go(dt: DataType): ASchema = dt match {
      case s: StructType if isTaggedUnion(s) =>
        ASchema.createUnion(s.fields.toSeq.drop(1).map(f => go(f.dataType)).asJava)
      case s: StructType =>
        val zson = zsonType(s)
        seen.getOrElse(zson, {
          val rec = ASchema.createRecord(recordName(s), "Created by zync from zng type " + zson,
            namespace, false)
          seen(zson) = rec
          val fields = s.fields.toSeq.map { f =>
            val inner = go(f.dataType)
            val typ = inner.getType match {
              case ASchema.Type.NULL => inner
              // union fields embed as-is: Avro forbids nested unions, and
              // a decode-produced union already carries its null branch
              case ASchema.Type.UNION => inner
              case _ => ASchema.createUnion(ASchema.create(ASchema.Type.NULL), inner)
            }
            val dflt =
              if (typ.getType == ASchema.Type.UNION &&
                typ.getTypes.get(0).getType != ASchema.Type.NULL) null
              else ASchema.Field.NULL_DEFAULT_VALUE
            new ASchema.Field(f.name, typ, null, dflt)
          }
          rec.setFields(fields.asJava)
          rec
        })
      case ArrayType(inner, _) => ASchema.createArray(go(inner))
      case ByteType | ShortType | IntegerType => ASchema.create(ASchema.Type.INT)
      case LongType => ASchema.create(ASchema.Type.LONG)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case TimestampType | TimestampNTZType =>
        LogicalTypes.timestampMicros().addToSchema(ASchema.create(ASchema.Type.LONG))
      case NullType => ASchema.create(ASchema.Type.NULL)
      case other => throw new IllegalArgumentException(s"unsupported type: $other")
    }
    go(st)
  }

  // --------------------------------------------------------- row ⇄ binary
  private def toAvro(v: Any, dt: DataType, schema: ASchema): AnyRef = {
    if (v == null) return null
    // tagged-union value: route to the branch the tag names
    dt match {
      case st: StructType if isTaggedUnion(st) &&
          schema.getType == ASchema.Type.UNION =>
        val r = v.asInstanceOf[Row]
        val tag = r.getInt(0)
        return toAvro(r.get(tag + 1), st.fields(tag + 1).dataType,
          schema.getTypes.get(tag))
      case _ =>
    }
    // unwrap the nullable union for the value side
    val s = if (schema.getType == ASchema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else schema
    (v, dt) match {
      case (r: Row, st: StructType) =>
        val rec = new GenericData.Record(s)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(r.get(i), f.dataType, s.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(inner, _)) =>
        new GenericData.Array(s, seq.map(x => toAvro(x, inner, s.getElementType)).asJava)
      case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
      case (t: java.sql.Timestamp, _) =>
        java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case (t: java.time.Instant, _) =>
        java.lang.Long.valueOf(t.getEpochSecond * 1000000L + t.getNano / 1000)
      case (t: java.time.LocalDateTime, _) =>
        java.lang.Long.valueOf(
          t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
            t.getNano / 1000)
      case (b: java.lang.Byte, _) => java.lang.Integer.valueOf(b.intValue)
      case (sh: java.lang.Short, _) => java.lang.Integer.valueOf(sh.intValue)
      case (other, _) => other.asInstanceOf[AnyRef]
    }
  }

  def encodeRow(row: Row, schema: ASchema): Array[Byte] = {
    val rec = toAvro(row, rowTypeOf(row), schema).asInstanceOf[GenericRecord]
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private def rowTypeOf(row: Row): StructType = row.schema

  /** Decode-direction schema translation: Avro schema → Spark type
    * (ref DecodeSchema, zavro/schema.go:174-244). Two-way null unions
    * collapse to the nullable inner type (isOptional, :211-224); general
    * unions become a tagged struct {tag, u0..uN} — the Spark stand-in for
    * Zed's union type (SURVEY §7 hard part 5).
    */
  def avroToSpark(schema: ASchema): DataType = schema.getType match {
    case ASchema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map(f =>
        StructField(f.name, avroToSpark(f.schema()))))
    case ASchema.Type.ARRAY => ArrayType(avroToSpark(schema.getElementType))
    case ASchema.Type.UNION =>
      optionalOf(schema) match {
        case Some(inner) => avroToSpark(inner)
        case None =>
          StructType(StructField("tag", IntegerType) +:
            schema.getTypes.asScala.toSeq.zipWithIndex.map { case (t, i) =>
              StructField(s"u$i", avroToSpark(t))
            })
      }
    case ASchema.Type.NULL => NullType
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT => IntegerType
    case ASchema.Type.LONG =>
      if (schema.getLogicalType != null &&
        schema.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.BYTES => BinaryType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** A 2-way union with null → the non-null branch (zavro isOptional). */
  private def optionalOf(u: ASchema): Option[ASchema] = {
    val ts = u.getTypes.asScala
    if (ts.size == 2 && ts.exists(_.getType == ASchema.Type.NULL))
      ts.find(_.getType != ASchema.Type.NULL)
    else None
  }

  /** Avro binary → JSON text (bytes → base64, general unions → tagged
    * objects) ready for `from_json` with the matching Spark schema.
    */
  def decodeToJson(body: Array[Byte], schema: ASchema): String = {
    val dec = DecoderFactory.get().binaryDecoder(body, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    val sb = new StringBuilder
    writeJson(sb, rec, schema)
    sb.toString
  }

  private def writeJson(sb: StringBuilder, v: Any, schema: ASchema): Unit = {
    if (v == null) { sb.append("null"); return }
    schema.getType match {
      case ASchema.Type.UNION =>
        optionalOf(schema) match {
          case Some(inner) => writeJson(sb, v, inner)
          case None =>
            // general union → tagged object (Zed-union stand-in)
            val idx = GenericData.get().resolveUnion(schema, v)
            sb.append("{\"tag\":").append(idx).append(",\"u").append(idx).append("\":")
            writeJson(sb, v, schema.getTypes.get(idx))
            sb.append('}')
        }
      case ASchema.Type.RECORD =>
        val r = v.asInstanceOf[GenericRecord]
        sb.append('{')
        r.getSchema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          if (i > 0) sb.append(',')
          sb.append('"').append(jesc(f.name)).append("\":")
          writeJson(sb, r.get(f.pos), f.schema())
        }
        sb.append('}')
      case ASchema.Type.ARRAY =>
        val l = v.asInstanceOf[java.util.List[_]]
        sb.append('[')
        l.asScala.zipWithIndex.foreach { case (x, i) =>
          if (i > 0) sb.append(',')
          writeJson(sb, x, schema.getElementType)
        }
        sb.append(']')
      case ASchema.Type.BYTES =>
        val b = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
        sb.append('"').append(java.util.Base64.getEncoder.encodeToString(arr)).append('"')
      case ASchema.Type.STRING | ASchema.Type.ENUM =>
        sb.append('"').append(jesc(v.toString)).append('"')
      case ASchema.Type.LONG if schema.getLogicalType != null &&
          schema.getLogicalType.getName == "timestamp-micros" =>
        // ISO-8601 so from_json lands it in TimestampType at full precision
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        sb.append('"').append(inst.toString).append('"')
      case _ => sb.append(v.toString)
    }
  }

  // ----------------------------------------------------------- wire frame
  val Magic: Byte = 0x00

  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + body.length)
    out(0) = Magic
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  def unframe(msg: Array[Byte]): (Int, Array[Byte]) = {
    require(msg.length >= 5 && msg(0) == Magic,
      s"bad kafka-avro framing: ${msg.take(5).mkString(",")}")
    val id = ((msg(1) & 0xff) << 24) | ((msg(2) & 0xff) << 16) |
      ((msg(3) & 0xff) << 8) | (msg(4) & 0xff)
    (id, msg.drop(5))
  }

  // ------------------------------------------------------ DataFrame level
  private val schemaCache = TrieMap.empty[String, ASchema]
  private def parsed(json: String): ASchema =
    schemaCache.getOrElseUpdate(json, new ASchema.Parser().parse(json))

  /** Encode a struct column to registry-framed Avro binary. Registers the
    * schema once on the driver (subject = `namespace.zng_<md5>`, the
    * RecordNameStrategy of zavro/encoder.go:45-50).
    */
  def encodeColumn(value: Column, st: StructType, namespace: String,
      registry: SchemaRegistry): Column = {
    val subject = s"$namespace.${recordName(st)}"
    val id = registry.createSchema(subject, registryJson(st, namespace))
    val schemaJson = avroSchema(st, namespace).toString
    org.apache.spark.sql.graftbridge.Bridge.column(
      AvroRegistryEncodeExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(value), st, schemaJson, id))
  }

  /** Decode registry-framed Avro binary into `st`. The registry lookup per
    * schema ID happens lazily executor-side with a per-expression cache
    * (the reference's decoder cache, zavro/decoder.go:54-72).
    */
  def decodeColumn(message: Column, st: StructType, registry: SchemaRegistry): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      AvroRegistryDecodeExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(message), st, registry))
}
