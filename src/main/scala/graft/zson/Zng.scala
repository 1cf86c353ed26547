package graft.zson

import graft.zson.ZsonValue._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** ZNG binary format (Zed's default on-disk/wire format; the reference
  * accepts it everywhere via the zed cli libs, cmd/zync/produce/command.go:
  * 62-84). Implemented from the published spec (brimdata/zed
  * docs/formats/zng.md):
  *
  *  - stream = frames; frame code byte `V C TT LLLL` (V=0, C=compressed,
  *    TT: 0 types / 1 values / 2 control, 0xff = end-of-stream which resets
  *    the type context); length = uvarint<<4 | LLLL bytes of payload.
  *  - compressed payload = uvarint format (0 = LZ4 block) + uvarint
  *    uncompressed size + compressed bytes (decoded via the lz4-java Spark
  *    already ships).
  *  - types frame = typedefs (record 0, array 1, set 2, map 3, union 4,
  *    enum 5, error 6, named 7), each allocating the next id from 30 up;
  *    primitives have fixed ids (uint8..uint256 0-5, int8..int256 6-11,
  *    duration 12, time 13, float16..float256 14-18, decimals 19-22,
  *    bool 23, bytes 24, string 25, ip 26, net 27, type 28, null 29).
  *  - values frame = sequence of (uvarint type id, tagged body); tag 0 is
  *    null, else body length = tag-1. Container bodies nest tagged items;
  *    union body = tagged zigzag selector + tagged inner; ints are zigzag
  *    varints, uints uvarints, time/duration zigzag nanoseconds, floats
  *    little-endian fixed width, string/bytes raw.
  *
  * Values surface as the ZSON AST ([[ZsonValue.Z]]) with named-type
  * decorations mapped to the `_type` marker column, so ZSON and ZNG inputs
  * land identically. Caveat: no zed binary or .zng fixture exists in this
  * zero-egress environment, so cross-implementation byte compatibility is
  * asserted against the spec + self round-trip only; `ZngSpec` pins the
  * wire bytes of a golden value so any drift from the documented layout is
  * visible in review.
  *
  * Driver-side I/O at CLI scale by design, like [[ZsonValue]]; bulk data
  * paths use parquet/JSON Spark sources.
  */
object Zng {

  // ---- type model ---------------------------------------------------
  private sealed trait ZT
  private final case class TPrim(id: Int) extends ZT
  private final case class TRecord(fields: Vector[(String, ZT)]) extends ZT
  private final case class TArray(inner: ZT) extends ZT
  private final case class TSet(inner: ZT) extends ZT
  private final case class TMap(key: ZT, value: ZT) extends ZT
  private final case class TUnion(branches: Vector[ZT]) extends ZT
  private final case class TEnum(symbols: Vector[String]) extends ZT
  private final case class TError(inner: ZT) extends ZT
  private final case class TNamed(name: String, inner: ZT) extends ZT

  private val IdInt8 = 6
  private val IdInt16 = 7
  private val IdInt32 = 8
  private val IdInt64 = 9
  private val IdDuration = 12
  private val IdTime = 13
  private val IdFloat16 = 14
  private val IdFloat32 = 15
  private val IdFloat64 = 16
  private val IdBool = 23
  private val IdBytes = 24
  private val IdString = 25
  private val IdIp = 26
  private val IdNet = 27
  private val IdTypeType = 28
  private val IdNull = 29
  private val FirstTypedefId = 30

  // ---- byte-level helpers -------------------------------------------
  private final class In(buf: Array[Byte], var pos: Int, val end: Int) {
    def atEnd: Boolean = pos >= end
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def uvarint(): Long = {
      var shift = 0; var out = 0L; var b = 0x80
      while ((b & 0x80) != 0) {
        // a uvarint64 is at most 10 bytes; fail loudly on malformed input
        // instead of silently wrapping the shift past 63
        if (shift > 63) throw new IllegalArgumentException(
          s"malformed ZNG uvarint: continuation past 10 bytes at pos $pos")
        b = u8(); out |= (b & 0x7fL) << shift; shift += 7
      }
      out
    }
    def varint(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1) } // zigzag
    def string(): String = new String(bytes(uvarint().toInt), "UTF-8")
    def slice(n: Int): In = { val s = new In(buf, pos, pos + n); pos += n; s }
  }

  private final class Out {
    val buf = new ByteArrayOutputStream()
    def u8(b: Int): Unit = buf.write(b)
    def bytes(b: Array[Byte]): Unit = buf.write(b)
    def uvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63)) // zigzag
    def string(s: String): Unit = {
      val b = s.getBytes("UTF-8"); uvarint(b.length.toLong); bytes(b)
    }
    def result(): Array[Byte] = buf.toByteArray
  }

  // =====================================================================
  // Reader
  // =====================================================================

  def read(spark: SparkSession, path: String): DataFrame = {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val vals = parse(data)
    if (vals.nonEmpty) toDataFrame(spark, vals)
    else firstRecordType(data) match {
      // a values-less stream (types frame + EOS) is valid ZNG — e.g. a
      // consume from the high watermark; reconstruct the schema from the
      // typedefs so round trips keep column structure
      case Some(t) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], ztToSpark(t).asInstanceOf[StructType])
      case None => spark.emptyDataFrame
    }
  }

  /** The stream's top-level record typedef, if any: the LAST unreferenced
    * record in the typedef DAG. Writers (including [[write]]) define inner
    * struct typedefs before the records that embed them, so "first record"
    * would pick a nested struct; the root is the record no other typedef
    * references (structural comparison suffices — typedefs are
    * structurally deduped, so an identical subtree IS the same typedef).
    */
  private def firstRecordType(data: Array[Byte]): Option[ZT] = {
    val in = new In(data, 0, data.length)
    val defined = mutable.ArrayBuffer[ZT]()
    val types = mutable.Map[Int, ZT]()
    var nextId = FirstTypedefId
    var done = false
    while (!in.atEnd && !done) {
      val code = in.u8()
      if (code == 0xff) done = true // first stream's types only
      else {
        val kind = (code >> 4) & 3
        val len = ((in.uvarint() << 4) | (code & 0xf)).toInt
        val frame = decompressed(in.slice(len), (code & 0x40) != 0)
        if (kind == 0) while (!frame.atEnd) {
          types(nextId) = typedef(frame, types)
          defined += types(nextId)
          nextId += 1
        }
      }
    }
    def children(t: ZT): Seq[ZT] = t match {
      case TRecord(fs) => fs.map(_._2)
      case TArray(i) => Seq(i)
      case TSet(i) => Seq(i)
      case TMap(k, v) => Seq(k, v)
      case TUnion(bs) => bs
      case TError(i) => Seq(i)
      case TNamed(_, i) => Seq(i)
      case _ => Nil
    }
    val referenced = defined.flatMap(children).toSet
    defined.reverseIterator.collectFirst {
      case r: TRecord if !referenced(r) => r
      case n @ TNamed(_, r: TRecord) if !referenced(n) => r
    }
  }

  /** ZNG type → Spark type (decode-direction; the subset [[toZngType]]
    * writes plus the primitives [[prim]] reads).
    */
  private def ztToSpark(t: ZT): DataType = t match {
    case TRecord(fields) =>
      StructType(fields.map { case (n, ft) => StructField(n, ztToSpark(ft)) })
    case TArray(inner) => ArrayType(ztToSpark(inner))
    case TSet(inner) => ArrayType(ztToSpark(inner))
    case TMap(k, v) => ArrayType(StructType(Seq(
      StructField("key", ztToSpark(k)), StructField("value", ztToSpark(v)))))
    case TNamed(_, inner) => ztToSpark(inner)
    case TUnion(_) | TEnum(_) => StringType
    case TError(inner) => ztToSpark(inner)
    case TPrim(id) => id match {
      case i if i >= 0 && i <= 3 => LongType
      case i if i >= IdInt8 && i <= IdInt64 => LongType
      case IdDuration => LongType
      case IdTime => TimestampType
      case IdFloat32 | IdFloat64 => DoubleType
      case IdBool => BooleanType
      case IdBytes => BinaryType
      case IdString | IdIp | IdNet | IdTypeType => StringType
      case IdNull => NullType
      case other => throw new IllegalArgumentException(s"unsupported ZNG primitive id $other")
    }
  }

  /** Decode a whole ZNG stream (possibly several EOS-delimited streams)
    * into top-level values + decorations.
    */
  def parse(data: Array[Byte]): Seq[Value] = {
    val in = new In(data, 0, data.length)
    val out = mutable.Buffer[Value]()
    var types = mutable.Map[Int, ZT]()
    var nextId = FirstTypedefId
    while (!in.atEnd) {
      val code = in.u8()
      if (code == 0xff) { // end of stream: type context resets
        types = mutable.Map.empty; nextId = FirstTypedefId
      } else {
        require((code & 0x80) == 0, f"unsupported ZNG version bit in frame code 0x$code%02x")
        val kind = (code >> 4) & 3
        val len = ((in.uvarint() << 4) | (code & 0xf)).toInt
        val frame = decompressed(in.slice(len), (code & 0x40) != 0)
        kind match {
          case 0 => // types
            while (!frame.atEnd) {
              types(nextId) = typedef(frame, types)
              nextId += 1
            }
          case 1 => // values
            while (!frame.atEnd) {
              val t = typeById(frame.uvarint().toInt, types)
              out += topValue(t, frame)
            }
          case _ => // control: app-specific, skip payload
        }
      }
    }
    out.toSeq
  }

  private def decompressed(frame: In, compressed: Boolean): In =
    if (!compressed) frame
    else {
      val fmt = frame.uvarint()
      require(fmt == 0, s"unknown ZNG compression format $fmt (0=LZ4)")
      val usize = frame.uvarint().toInt
      val comp = frame.bytes(frame.end - frame.pos)
      val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
        .decompress(comp, usize)
      new In(dec, 0, dec.length)
    }

  private def typeById(id: Int, types: mutable.Map[Int, ZT]): ZT =
    if (id < FirstTypedefId) TPrim(id)
    else types.getOrElse(id, throw new IllegalArgumentException(s"undefined ZNG type id $id"))

  private def typedef(in: In, types: mutable.Map[Int, ZT]): ZT = in.u8() match {
    case 0 =>
      TRecord(Vector.fill(in.uvarint().toInt)(
        (in.string(), typeById(in.uvarint().toInt, types))))
    case 1 => TArray(typeById(in.uvarint().toInt, types))
    case 2 => TSet(typeById(in.uvarint().toInt, types))
    case 3 => TMap(typeById(in.uvarint().toInt, types), typeById(in.uvarint().toInt, types))
    case 4 => TUnion(Vector.fill(in.uvarint().toInt)(typeById(in.uvarint().toInt, types)))
    case 5 => TEnum(Vector.fill(in.uvarint().toInt)(in.string()))
    case 6 => TError(typeById(in.uvarint().toInt, types))
    case 7 => TNamed(in.string(), typeById(in.uvarint().toInt, types))
    case other => throw new IllegalArgumentException(s"unknown ZNG typedef code $other")
  }

  /** Top-level value: unwrap named decorations into the `_type` marker. */
  private def topValue(t: ZT, in: In): Value = t match {
    case TNamed(name, inner) => Value(tagged(inner, in), Some(name))
    case _ => Value(tagged(t, in), None)
  }

  /** One tagged value: uvarint tag (0 = null, else body of tag-1 bytes). */
  private def tagged(t: ZT, in: In): Z = {
    val tag = in.uvarint()
    if (tag == 0) ZNull
    else value(t, in.slice((tag - 1).toInt))
  }

  private def value(t: ZT, b: In): Z = t match {
    case TNamed(_, inner) => value(inner, b)
    case TError(inner) => value(inner, b)
    case TRecord(fields) => ZRecord(fields.map { case (n, ft) => n -> tagged(ft, b) })
    case TArray(inner) => ZArray(readItems(inner, b))
    case TSet(inner) => ZArray(readItems(inner, b))
    case TMap(k, v) =>
      // surface as an array of {key, value} records (ZSON |{...}| is out of
      // the fixture subset; this keeps the data without inventing syntax)
      val items = mutable.Buffer[Z]()
      while (!b.atEnd)
        items += ZRecord(Vector("key" -> tagged(k, b), "value" -> tagged(v, b)))
      ZArray(items.toVector)
    case TUnion(branches) =>
      // body = tagged zigzag selector, then the branch value tagged
      val selTag = b.uvarint()
      require(selTag != 0, "null ZNG union selector")
      val sel = b.slice((selTag - 1).toInt).varint().toInt
      tagged(branches(sel), b)
    case TEnum(symbols) => ZString(symbols(b.uvarint().toInt))
    case TPrim(id) => prim(id, b)
  }

  private def readItems(inner: ZT, b: In): Vector[Z] = {
    val items = mutable.Buffer[Z]()
    while (!b.atEnd) items += tagged(inner, b)
    items.toVector
  }

  private def prim(id: Int, b: In): Z = id match {
    case i if i >= 0 && i <= 3 => // uint8..uint64
      val u = b.uvarint()
      // uint64 past Long.MaxValue has no faithful Spark representation —
      // fail loudly like the other unsupported primitives rather than
      // silently wrapping negative
      if (i == 3 && u < 0) throw new IllegalArgumentException(
        s"uint64 value ${java.lang.Long.toUnsignedString(u)} exceeds int64 range")
      ZInt(u)
    case i if i >= IdInt8 && i <= IdInt64 => ZInt(b.varint())
    case IdDuration => ZInt(b.varint()) // nanoseconds
    case IdTime =>
      val ns = b.varint()
      ZTime(java.time.Instant.ofEpochSecond(Math.floorDiv(ns, 1000000000L),
        Math.floorMod(ns, 1000000000L)))
    case IdFloat32 =>
      val bs = b.bytes(4)
      ZFloat(java.lang.Float.intBitsToFloat(
        (bs(0) & 0xff) | ((bs(1) & 0xff) << 8) | ((bs(2) & 0xff) << 16) | ((bs(3) & 0xff) << 24)).toDouble)
    case IdFloat64 =>
      val bs = b.bytes(8)
      var bits = 0L
      var i = 7
      while (i >= 0) { bits = (bits << 8) | (bs(i) & 0xffL); i -= 1 }
      ZFloat(java.lang.Double.longBitsToDouble(bits))
    case IdBool => ZBool(b.u8() != 0)
    case IdString => ZString(new String(b.bytes(b.end - b.pos), "UTF-8"))
    case IdBytes => ZBytes(b.bytes(b.end - b.pos))
    case IdIp =>
      ZString(java.net.InetAddress.getByAddress(b.bytes(b.end - b.pos)).getHostAddress)
    case IdTypeType => ZString(new String(b.bytes(b.end - b.pos), "UTF-8"))
    case IdNull => ZNull
    case other => throw new IllegalArgumentException(
      s"unsupported ZNG primitive type id $other (decimal/128/256-bit/net)")
  }

  // =====================================================================
  // Writer
  // =====================================================================

  /** Encode a DataFrame as one ZNG stream (types frame, values frames of
    * ~128 KiB, EOS). The `_type` marker column becomes a named-type
    * decoration per distinct name, mirroring [[Zson.render]].
    */
  def write(df: DataFrame, path: String): Unit = write(df, path, compress = false)

  def write(df: DataFrame, path: String, compress: Boolean): Unit = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try write(df, out, compress) finally out.close()
  }

  /** Encode to an already-open stream (caller closes); rows stream through
    * `toLocalIterator`, so the whole frame sequence never buffers more
    * than one ~128 KiB values frame. With `compress`, frames past a small
    * threshold are LZ4 block frames (format 0), like zed's default writer.
    */
  def write(df: DataFrame, out: java.io.OutputStream,
      compress: Boolean = false): Unit = {
    val schema = df.schema
    val hasMarker = schema.fieldNames.contains("_type")
    val bare = StructType(schema.fields.filterNot(_.name == "_type"))
    // row positions of the bare fields (positional; names may duplicate)
    val srcIdx = schema.fields.zipWithIndex
      .collect { case (f, i) if f.name != "_type" => i }

    val defs = new Out // typedef stream
    var nextId = FirstTypedefId
    val ids = mutable.Map[ZT, Int]() // structural typedef dedup

    def define(t: ZT): Int = t match {
      case TPrim(id) => id
      case _ => ids.getOrElseUpdate(t, {
        t match {
          case TRecord(fields) =>
            val fieldIds = fields.map { case (n, ft) => (n, define(ft)) }
            defs.u8(0); defs.uvarint(fieldIds.length.toLong)
            fieldIds.foreach { case (n, id) => defs.string(n); defs.uvarint(id.toLong) }
          case TArray(inner) =>
            val id = define(inner); defs.u8(1); defs.uvarint(id.toLong)
          case TSet(inner) =>
            val id = define(inner); defs.u8(2); defs.uvarint(id.toLong)
          case TMap(k, v) =>
            val (ki, vi) = (define(k), define(v))
            defs.u8(3); defs.uvarint(ki.toLong); defs.uvarint(vi.toLong)
          case TNamed(name, inner) =>
            val id = define(inner); defs.u8(7); defs.string(name); defs.uvarint(id.toLong)
          case other => throw new IllegalArgumentException(s"unwritable type $other")
        }
        val id = nextId; nextId += 1; id
      })
    }

    val bareT = toZngType(bare)
    val bareId = define(bareT)
    val namedIds: Map[String, Int] =
      if (!hasMarker) Map.empty
      else df.select("_type").distinct().collect().flatMap(r => Option(r.getString(0)))
        .map(n => n -> define(TNamed(n, bareT))).toMap

    {
      writeFrame(out, 0, defs.result(), compress)
      val batch = new Out
      def flush(): Unit =
        if (batch.buf.size() > 0) {
          writeFrame(out, 1, batch.result(), compress); batch.buf.reset()
        }
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        val name = if (hasMarker) Option(row.getAs[String]("_type")) else None
        batch.uvarint(name.flatMap(namedIds.get).getOrElse(bareId).toLong)
        encodeTagged(rowValue(row, srcIdx, bare), bareT, batch)
        if (batch.buf.size() >= 128 * 1024) flush()
      }
      flush()
      out.write(0xff) // EOS
      out.flush()
    }
  }

  private def writeFrame(out: java.io.OutputStream, kind: Int,
      payload: Array[Byte], compress: Boolean = false): Unit = {
    // tiny frames skip compression — the format/usize preamble plus LZ4
    // bookkeeping outweighs any saving
    if (compress && payload.length > 64) {
      val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
        .compress(payload)
      val body = new Out
      body.uvarint(0L) // format 0 = LZ4 block
      body.uvarint(payload.length.toLong)
      body.bytes(comp)
      val b = body.result()
      val hdr = new Out
      hdr.u8(0x40 | (kind << 4) | (b.length & 0xf)) // C bit set
      hdr.uvarint((b.length >> 4).toLong)
      out.write(hdr.result()); out.write(b)
    } else {
      val hdr = new Out
      hdr.u8((kind << 4) | (payload.length & 0xf))
      hdr.uvarint((payload.length >> 4).toLong)
      out.write(hdr.result()); out.write(payload)
    }
  }

  private def toZngType(dt: DataType): ZT = dt match {
    case st: StructType => TRecord(st.fields.toVector.map(f => f.name -> toZngType(f.dataType)))
    case ArrayType(inner, _) => TArray(toZngType(inner))
    case MapType(k, v, _) => TMap(toZngType(k), toZngType(v))
    case LongType => TPrim(IdInt64)
    case IntegerType => TPrim(IdInt32)
    case ShortType => TPrim(IdInt16)
    case ByteType => TPrim(IdInt8)
    case DoubleType => TPrim(IdFloat64)
    case FloatType => TPrim(IdFloat32)
    case BooleanType => TPrim(IdBool)
    case StringType => TPrim(IdString)
    case BinaryType => TPrim(IdBytes)
    case TimestampType | TimestampNTZType => TPrim(IdTime)
    case NullType => TPrim(IdNull)
    case other => throw new IllegalArgumentException(s"no ZNG mapping for $other")
  }

  /** Spark external row → Z. `srcIdx(i)` is the row position of the i-th
    * bare field (positional — `fieldIndex` by name would alias duplicate
    * column names, which Spark schemas allow).
    */
  private def rowValue(row: Row, srcIdx: Array[Int], bare: StructType): Z =
    ZRecord(bare.fields.toVector.zipWithIndex.map { case (f, i) =>
      f.name -> anyToZ(row.get(srcIdx(i)), f.dataType)
    })

  private def anyToZ(v: Any, dt: DataType): Z = (v, dt) match {
    case (null, _) => ZNull
    case (r: Row, st: StructType) =>
      ZRecord(st.fields.toVector.zipWithIndex.map { case (f, i) =>
        f.name -> anyToZ(r.get(i), f.dataType)
      })
    case (seq: scala.collection.Seq[_], ArrayType(inner, _)) =>
      ZArray(seq.toVector.map(anyToZ(_, inner)))
    case (m: scala.collection.Map[_, _], MapType(k, vt, _)) =>
      ZArray(m.toVector.map { case (key, value) =>
        ZRecord(Vector("key" -> anyToZ(key, k), "value" -> anyToZ(value, vt)))
      })
    case (x: java.lang.Long, _) => ZInt(x)
    case (x: java.lang.Integer, _) => ZInt(x.longValue())
    case (x: java.lang.Short, _) => ZInt(x.longValue())
    case (x: java.lang.Byte, _) => ZInt(x.longValue())
    case (x: java.lang.Double, _) => ZFloat(x)
    case (x: java.lang.Float, _) => ZFloat(x.doubleValue())
    case (x: java.lang.Boolean, _) => ZBool(x)
    case (s: String, _) => ZString(s)
    case (b: Array[Byte], _) => ZBytes(b)
    case (t: java.sql.Timestamp, _) => ZTime(t.toInstant)
    case (t: java.time.Instant, _) => ZTime(t)
    // TIMESTAMP_NTZ surfaces as LocalDateTime; the session is pinned UTC
    case (t: java.time.LocalDateTime, _) => ZTime(t.toInstant(java.time.ZoneOffset.UTC))
    case (other, t) => throw new IllegalArgumentException(s"cannot encode $other as $t")
  }

  private def encodeTagged(z: Z, t: ZT, out: Out): Unit = z match {
    case ZNull => out.uvarint(0L)
    case _ =>
      val body = new Out
      encodeBody(z, t, body)
      val b = body.result()
      out.uvarint(b.length + 1L)
      out.bytes(b)
  }

  private def encodeBody(z: Z, t: ZT, out: Out): Unit = (z, t) match {
    case (ZRecord(fields), TRecord(fts)) =>
      // positional, not by name: Spark schemas legally carry duplicate
      // column names, and a name map would write one field's value into
      // every same-named position
      require(fields.length == fts.length,
        s"record arity ${fields.length} != type arity ${fts.length}")
      var i = 0
      while (i < fields.length) {
        encodeTagged(fields(i)._2, fts(i)._2, out); i += 1
      }
    case (ZArray(items), TArray(inner)) => items.foreach(encodeTagged(_, inner, out))
    case (ZArray(items), TMap(k, v)) =>
      items.foreach {
        case ZRecord(Vector((_, key), (_, value))) =>
          encodeTagged(key, k, out); encodeTagged(value, v, out)
        case other => throw new IllegalArgumentException(s"bad map entry $other")
      }
    case (z2, TNamed(_, inner)) => encodeBody(z2, inner, out)
    case (ZInt(v), TPrim(id)) if id >= IdInt8 && id <= IdInt64 => out.varint(v)
    case (ZInt(v), TPrim(IdDuration)) => out.varint(v)
    case (ZFloat(v), TPrim(IdFloat64)) =>
      var bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach { _ => out.u8((bits & 0xff).toInt); bits >>>= 8 }
    case (ZFloat(v), TPrim(IdFloat32)) =>
      var bits = java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xffffffffL
      (0 until 4).foreach { _ => out.u8((bits & 0xff).toInt); bits >>>= 8 }
    case (ZBool(v), TPrim(IdBool)) => out.u8(if (v) 1 else 0)
    case (ZString(s), TPrim(IdString)) => out.bytes(s.getBytes("UTF-8"))
    case (ZBytes(b), TPrim(IdBytes)) => out.bytes(b)
    case (ZTime(i), TPrim(IdTime)) =>
      out.varint(i.getEpochSecond * 1000000000L + i.getNano)
    case (other, tt) => throw new IllegalArgumentException(s"cannot encode $other as $tt")
  }
}
