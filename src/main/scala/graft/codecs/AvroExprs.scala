package graft.codecs

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Native Catalyst codec for Confluent-registry-framed Avro
  * (ref: zavro/decoder.go:85-221, zavro/encoder.go:59-66).
  *
  * Replaces the round-2 UDF seam, which rendered every record to a JSON
  * string and re-parsed it with `from_json` (two full passes per record
  * on the Kafka ingest hot path). These expressions go straight between
  * the Avro binary body and Spark's InternalRow representation — no Row
  * boxing, no JSON detour — and stay inside whole-stage codegen via a
  * reference-object call (the same shape Spark's own Avro connector
  * expressions use).
  *
  * Decode resolves the writer schema lazily executor-side from the 5-byte
  * frame's schema ID with a per-expression cache (the reference's
  * per-consumer decoder cache, zavro/decoder.go:54-72), then projects the
  * decoded record onto `targetType` by field name: missing fields → null,
  * unconvertible fields → null (the same permissive contract `from_json`
  * gave round 2), general unions → the tagged {tag, u0..uN} struct.
  */
private[codecs] object AvroCatalyst {

  /** A 2-way union with null → the non-null branch (zavro isOptional). */
  def optionalOf(u: ASchema): Option[ASchema] = {
    val ts = u.getTypes.asScala
    if (ts.size == 2 && ts.exists(_.getType == ASchema.Type.NULL))
      ts.find(_.getType != ASchema.Type.NULL)
    else None
  }

  private def isTsMicros(s: ASchema): Boolean =
    s.getLogicalType != null && s.getLogicalType.getName == "timestamp-micros"

  private def isTsMillis(s: ASchema): Boolean =
    s.getLogicalType != null && s.getLogicalType.getName == "timestamp-millis"

  /** Avro runtime value (from GenericDatumReader) → Catalyst value of
    * `dt`, guided by the writer schema. Permissive: mismatches → null.
    */
  def toCatalyst(v: Any, s: ASchema, dt: DataType): Any = {
    if (v == null) return null
    s.getType match {
      case ASchema.Type.UNION =>
        optionalOf(s) match {
          case Some(inner) => toCatalyst(v, inner, dt)
          case None => dt match {
            case st: StructType if ZAvro.isTaggedUnion(st) =>
              val idx = GenericData.get().resolveUnion(s, v)
              // a foreign writer union can have more branches than the
              // target tagged struct — permissive contract says null, not
              // ArrayIndexOutOfBounds
              if (idx + 1 >= st.fields.length) null
              else {
                val row = new GenericInternalRow(st.fields.length)
                row.update(0, idx)
                row.update(idx + 1,
                  toCatalyst(v, s.getTypes.get(idx), st.fields(idx + 1).dataType))
                row
              }
            case _ => null
          }
        }
      case ASchema.Type.RECORD => dt match {
        case st: StructType =>
          val rec = v.asInstanceOf[GenericRecord]
          val ws = rec.getSchema
          val row = new GenericInternalRow(st.fields.length)
          var i = 0
          while (i < st.fields.length) {
            val f = ws.getField(st.fields(i).name)
            if (f != null)
              row.update(i, toCatalyst(rec.get(f.pos), f.schema(), st.fields(i).dataType))
            i += 1
          }
          row
        case _ => null
      }
      case ASchema.Type.ARRAY => dt match {
        case ArrayType(et, _) =>
          val l = v.asInstanceOf[java.util.List[_]]
          val out = new Array[Any](l.size)
          var i = 0
          while (i < out.length) {
            out(i) = toCatalyst(l.get(i), s.getElementType, et)
            i += 1
          }
          new GenericArrayData(out)
        case _ => null
      }
      case ASchema.Type.STRING | ASchema.Type.ENUM => dt match {
        case StringType => v match {
          case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
          case other => UTF8String.fromString(other.toString)
        }
        case _ => null
      }
      case ASchema.Type.BYTES => dt match {
        case BinaryType =>
          val b = v.asInstanceOf[ByteBuffer]
          val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
          arr
        case _ => null
      }
      case ASchema.Type.LONG => dt match {
        case TimestampType | TimestampNTZType if isTsMicros(s) =>
          v.asInstanceOf[java.lang.Long].longValue()
        case TimestampType | TimestampNTZType if isTsMillis(s) =>
          Math.multiplyExact(v.asInstanceOf[java.lang.Long].longValue(), 1000L)
        case LongType => v.asInstanceOf[java.lang.Long].longValue()
        case DoubleType => v.asInstanceOf[java.lang.Long].doubleValue()
        case _ => null
      }
      case ASchema.Type.INT => dt match {
        case IntegerType => v.asInstanceOf[java.lang.Integer].intValue()
        case ByteType => v.asInstanceOf[java.lang.Integer].byteValue()
        case ShortType => v.asInstanceOf[java.lang.Integer].shortValue()
        case LongType => v.asInstanceOf[java.lang.Integer].longValue()
        case DoubleType => v.asInstanceOf[java.lang.Integer].doubleValue()
        case FloatType => v.asInstanceOf[java.lang.Integer].floatValue()
        case _ => null
      }
      case ASchema.Type.FLOAT => dt match {
        case FloatType => v.asInstanceOf[java.lang.Float].floatValue()
        case DoubleType => v.asInstanceOf[java.lang.Float].doubleValue()
        case _ => null
      }
      case ASchema.Type.DOUBLE => dt match {
        case DoubleType => v.asInstanceOf[java.lang.Double].doubleValue()
        case _ => null
      }
      case ASchema.Type.BOOLEAN => dt match {
        case BooleanType => v.asInstanceOf[java.lang.Boolean].booleanValue()
        case _ => null
      }
      case ASchema.Type.NULL => null
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type: $other")
    }
  }

  /** Catalyst value of `dt` → Avro runtime value for `s` (the schema
    * [[ZAvro.avroSchema]] derived from the same struct, so shapes align
    * positionally; unions route through the {tag, u0..uN} stand-in).
    */
  def fromCatalyst(v: Any, dt: DataType, s: ASchema): AnyRef = {
    if (v == null) return null
    dt match {
      case st: StructType if ZAvro.isTaggedUnion(st) &&
          s.getType == ASchema.Type.UNION =>
        val row = v.asInstanceOf[InternalRow]
        val tag = row.getInt(0)
        val branchDt = st.fields(tag + 1).dataType
        return fromCatalyst(row.get(tag + 1, branchDt), branchDt, s.getTypes.get(tag))
      case _ =>
    }
    // unwrap the nullable union for the value side
    val sch = if (s.getType == ASchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else s
    dt match {
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          rec.put(f.name,
            fromCatalyst(row.get(i, f.dataType), f.dataType, sch.getField(f.name).schema()))
          i += 1
        }
        rec
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var i = 0
        while (i < arr.numElements()) {
          out.add(fromCatalyst(arr.get(i, et), et, sch.getElementType))
          i += 1
        }
        new GenericData.Array(sch, out)
      case StringType => new Utf8(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case TimestampType | TimestampNTZType => java.lang.Long.valueOf(v.asInstanceOf[Long])
      case ByteType => java.lang.Integer.valueOf(v.asInstanceOf[Byte].toInt)
      case ShortType => java.lang.Integer.valueOf(v.asInstanceOf[Short].toInt)
      case NullType => null
      case _ => v.asInstanceOf[AnyRef]
    }
  }
}

/** binary (0x00 + 4-byte BE schema ID + Avro body) → struct of `targetType`. */
case class AvroRegistryDecodeExpr(child: Expression, targetType: StructType,
    registry: SchemaRegistry) extends UnaryExpression {

  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def prettyName: String = "zavro_decode"

  // per-partition-instance caches; registry hit is once per schema ID
  @transient private lazy val readers =
    TrieMap.empty[Int, (GenericDatumReader[GenericRecord], ASchema)]
  @transient private lazy val decoderReuse =
    new ThreadLocal[BinaryDecoder]

  /** public so generated code can call it via a reference object */
  def decode(msg: Array[Byte]): AnyRef = {
    require(msg.length >= 5 && msg(0) == ZAvro.Magic,
      s"bad kafka-avro framing: ${msg.take(5).mkString(",")}")
    val id = ((msg(1) & 0xff) << 24) | ((msg(2) & 0xff) << 16) |
      ((msg(3) & 0xff) << 8) | (msg(4) & 0xff)
    val (reader, writerSchema) = readers.getOrElseUpdate(id, {
      val s = new ASchema.Parser().parse(registry.getSchema(id))
      (new GenericDatumReader[GenericRecord](s), s)
    })
    val dec = DecoderFactory.get().binaryDecoder(msg, 5, msg.length - 5, decoderReuse.get())
    decoderReuse.set(dec)
    val rec = reader.read(null, dec)
    AvroCatalyst.toCatalyst(rec, writerSchema, targetType).asInstanceOf[AnyRef]
  }

  override protected def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zavroDecode", this, classOf[AvroRegistryDecodeExpr].getName)
    nullSafeCodeGen(ctx, ev, input => {
      val result = ctx.freshName("decoded")
      s"""
        Object $result = $ref.decode($input);
        if ($result == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $result;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AvroRegistryDecodeExpr =
    copy(child = newChild)
}

/** struct → registry-framed Avro binary (schema ID resolved driver-side at
  * plan time by [[ZAvro.encodeColumn]]; zavro/encoder.go:59-66).
  */
case class AvroRegistryEncodeExpr(child: Expression, st: StructType,
    schemaJson: String, schemaId: Int) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "zavro_encode"

  @transient private lazy val schema = new ASchema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val outReuse = ThreadLocal.withInitial[ByteArrayOutputStream](
    () => new ByteArrayOutputStream(256))
  @transient private lazy val encoderReuse = new ThreadLocal[BinaryEncoder]

  /** public so generated code can call it via a reference object */
  def encode(row: InternalRow): Array[Byte] = {
    val rec = AvroCatalyst.fromCatalyst(row, st, schema).asInstanceOf[GenericRecord]
    val out = outReuse.get()
    out.reset()
    val enc = EncoderFactory.get().binaryEncoder(out, encoderReuse.get())
    encoderReuse.set(enc)
    writer.write(rec, enc)
    enc.flush()
    ZAvro.frame(schemaId, out.toByteArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zavroEncode", this, classOf[AvroRegistryEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $ref.encode($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroRegistryEncodeExpr =
    copy(child = newChild)
}
