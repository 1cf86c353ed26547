package graft.zson

import graft.operators.Fuse
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ZSON *value* reader: the fixture subset the reference ships
  * (demo/batch-{1..4}.zson, demo/staging-1.zson, demo/consume-*.zson) —
  * records, nested records, arrays, strings, int64/float64, bool, null,
  * ISO-8601 timestamps, 0x bytes, `//` comments, trailing commas, and
  * named-type decorations `(=name)` — plus the exotic literals `produce`
  * can meet in arbitrary Zed input (cmd/zync/produce/command.go:62-84):
  *
  *  - maps `|{"k":v,...}|` → Spark `MapType` (SURVEY §1.2)
  *  - sets `|[v,...]|` → `ArrayType`; set-ness is dropped, the SAME lossy
  *    mapping the reference's Avro codec makes (zavro/schema.go:135-143)
  *  - type values `<int64>` → a tagged one-field struct `{_zt: string}`
  *    holding the type text (Spark has no first-class type type)
  *  - union-cast decorations `1((int64,string))` → the SURVEY §7 tagged
  *    struct `{_utag: int, _u0: <branch0>, _u1: <branch1>, ...}` with the
  *    value under its branch field; primitive-cast decorations
  *    (`1.5(float32)`) coerce the scalar
  *
  * All of these render back to ZSON text in [[Zson]], so
  * produce → pool → consume round-trips them.
  *
  * Heterogeneous top-level values fuse into one wide schema
  * ([[graft.operators.Fuse]]), with `(=name)` decorations carried in the
  * `_type` marker column (SURVEY §7) — exactly how pools store mixed
  * types. Nested `(=name)` decorations are not supported (top-level only,
  * like the fixtures).
  *
  * Parsing happens on the driver (fixtures and CLI-style `produce` inputs
  * are small); bulk data paths use parquet/JSON Spark sources instead.
  */
object ZsonValue {

  sealed trait Z
  final case class ZRecord(fields: Vector[(String, Z)]) extends Z
  final case class ZArray(items: Vector[Z]) extends Z
  final case class ZString(s: String) extends Z
  final case class ZInt(v: Long) extends Z
  final case class ZFloat(v: Double) extends Z
  final case class ZBool(v: Boolean) extends Z
  final case class ZTime(v: java.time.Instant) extends Z
  final case class ZBytes(v: Array[Byte]) extends Z
  case object ZNull extends Z
  final case class ZMap(entries: Vector[(Z, Z)]) extends Z
  final case class ZSet(items: Vector[Z]) extends Z
  final case class ZTypeVal(text: String) extends Z
  final case class ZUnion(value: Z, branches: Vector[String], tag: Int) extends Z

  /** Marker field names for the tagged-struct encodings. */
  val TypeValField = "_zt"
  val UnionTagField = "_utag"

  /** Zed primitive name ⇄ Spark type, the union-branch subset. */
  private[zson] val ZedPrimitives: Seq[(String, DataType)] = Seq(
    "int64" -> LongType, "int32" -> IntegerType, "string" -> StringType,
    "float64" -> DoubleType, "float32" -> FloatType, "bool" -> BooleanType,
    "time" -> TimestampType, "bytes" -> BinaryType)
  private val zedToSpark = ZedPrimitives.toMap
  private[zson] val sparkToZed: Map[DataType, String] =
    ZedPrimitives.map(_.swap).toMap

  /** One top-level value plus its optional named-type decoration. */
  final case class Value(z: Z, name: Option[String])

  def parseAll(text: String): Seq[Value] = {
    val p = new P(text)
    val out = scala.collection.mutable.Buffer[Value]()
    p.ws()
    while (!p.atEnd) {
      val z = p.value()
      out += Value(z, p.namedDecoration())
      p.ws()
    }
    out.toSeq
  }

  /** Spark type of a single parsed value. */
  def schemaOf(z: Z): DataType = z match {
    case ZRecord(fields) =>
      StructType(fields.map { case (n, v) => StructField(n, schemaOf(v)) })
    case ZArray(items) =>
      ArrayType(items.map(schemaOf).foldLeft(NullType: DataType)(Fuse.fuseType))
    case ZSet(items) => // set-ness dropped, like the reference's Avro codec
      ArrayType(items.map(schemaOf).foldLeft(NullType: DataType)(Fuse.fuseType))
    case ZMap(entries) =>
      // empty maps default to string→string (nothing to infer from)
      if (entries.isEmpty) MapType(StringType, StringType)
      else MapType(
        entries.map(e => schemaOf(e._1)).reduce(Fuse.fuseType),
        entries.map(e => schemaOf(e._2)).reduce(Fuse.fuseType))
    case _: ZTypeVal =>
      StructType(Seq(StructField(TypeValField, StringType)))
    case ZUnion(_, branches, _) =>
      StructType(StructField(UnionTagField, IntegerType) +:
        branches.zipWithIndex.map { case (b, i) =>
          StructField(s"_u$i", zedToSpark.getOrElse(b,
            throw new IllegalArgumentException(s"unsupported union branch type: $b")))
        })
    case _: ZString => StringType
    case _: ZInt => LongType
    case _: ZFloat => DoubleType
    case _: ZBool => BooleanType
    case _: ZTime => TimestampType
    case _: ZBytes => BinaryType
    case ZNull => NullType
  }

  /** Parse ZSON text into a DataFrame with the fused schema of all values;
    * decorations become the `_type` marker column.
    */
  def toDataFrame(spark: SparkSession, text: String): DataFrame =
    toDataFrame(spark, parseAll(text))

  /** Shared Value→DataFrame fusion, also the surface of the ZNG binary
    * reader ([[Zng.read]]).
    */
  def toDataFrame(spark: SparkSession, vals: Seq[Value]): DataFrame = {
    require(vals.nonEmpty, "no ZSON values in input")
    val fused = vals.map(v => schemaOf(v.z)).reduce(Fuse.fuseType) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"top-level ZSON values must be records, got $other")
    }
    val decorated = vals.exists(_.name.isDefined)
    val schema =
      if (decorated) StructType(fused.fields :+ StructField("_type", StringType))
      else fused
    val rows = vals.map { v =>
      val base = convert(v.z, fused).asInstanceOf[Row]
      if (decorated) Row.fromSeq(base.toSeq :+ v.name.orNull) else base
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  /** Read a .zson file into a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame =
    toDataFrame(spark, new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  // Convert a parsed value to the Spark external representation expected
  // by `target` (missing struct fields → null, ints widen to double).
  private def convert(z: Z, target: DataType): Any = (z, target) match {
    case (ZNull, _) => null
    case (ZRecord(fields), st: StructType) =>
      val byName = fields.toMap
      Row.fromSeq(st.fields.toSeq.map(f =>
        byName.get(f.name).map(v => convert(v, f.dataType)).orNull))
    case (ZArray(items), ArrayType(inner, _)) => items.map(v => convert(v, inner))
    case (ZSet(items), ArrayType(inner, _)) => items.map(v => convert(v, inner))
    case (ZMap(entries), MapType(kt, vt, _)) =>
      entries.map { case (k, v) => convert(k, kt) -> convert(v, vt) }.toMap
    case (ZTypeVal(t), st: StructType) if st.fieldNames.sameElements(Seq(TypeValField)) =>
      Row(t)
    case (ZUnion(v, _, tag), st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map { f =>
        // tag -1 = null union (no branch): null _utag, all branches null
        if (f.name == UnionTagField) (if (tag >= 0) tag else null)
        else if (tag >= 0 && f.name == s"_u$tag") convert(v, f.dataType)
        else null
      })
    case (ZInt(v), LongType) => v
    case (ZInt(v), IntegerType) => v.toInt
    case (ZInt(v), DoubleType) => v.toDouble
    case (ZInt(v), FloatType) => v.toFloat
    case (ZFloat(v), DoubleType) => v
    case (ZFloat(v), FloatType) => v.toFloat
    case (ZString(s), StringType) => s
    case (ZBool(b), BooleanType) => b
    case (ZTime(t), TimestampType) => java.sql.Timestamp.from(t)
    case (ZBytes(b), BinaryType) => b
    case (other, t) => throw new IllegalArgumentException(
      s"cannot shape $other to $t")
  }

  // ------------------------------------------------------------- parser
  private val TimePattern = """^\d{4}-\d{2}-\d{2}T[0-9:.]+Z""".r

  private final class P(s: String) {
    private var i = 0

    def atEnd: Boolean = i >= s.length
    private def peek: Char = if (i < s.length) s(i) else '\u0000'

    def ws(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < s.length && s(i).isWhitespace) { i += 1; moved = true }
        if (i + 1 < s.length && s(i) == '/' && s(i + 1) == '/') {
          while (i < s.length && s(i) != '\n') i += 1
          moved = true
        }
      }
    }

    private def eat(c: Char): Unit = {
      ws()
      require(peek == c, s"expected '$c' at $i")
      i += 1
    }

    private def ident(): String = {
      ws()
      val st = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      require(i > st, s"expected identifier at $i")
      s.substring(st, i)
    }

    def value(): Z = decorations(rawValue())

    private def rawValue(): Z = {
      ws()
      peek match {
        case '{' => record()
        case '[' => array()
        case '"' => ZString(quoted())
        case '|' => mapOrSet()
        case '<' => typeValue()
        case _ =>
          TimePattern.findFirstIn(s.substring(i)) match {
            case Some(m) => i += m.length; ZTime(java.time.Instant.parse(m))
            case None => bare()
          }
      }
    }

    /** Cast decorations after a value: `((t1,t2))` union casts become
      * tagged structs; `(prim)` primitive casts coerce the scalar.
      * `(=name)` is NOT consumed here — the top level owns it (nested
      * named decorations are out of the supported subset).
      */
    private def decorations(base: Z): Z = {
      ws()
      if (peek != '(' || (i + 1 < s.length && s(i + 1) == '=')) return base
      i += 1 // '('
      ws()
      if (peek == '(') { // union cast
        i += 1
        val branches = scala.collection.mutable.Buffer(typeName())
        ws()
        while (peek == ',') { i += 1; branches += typeName(); ws() }
        eat(')'); eat(')')
        // Tag selection: an exact-type branch wins before any widening
        // match (`1((float64,int64))` must tag int64, not float64 — the
        // first-compatible rule re-rendered integers as floats, not
        // value-preserving). A null union value (`null((int64,string))`,
        // valid Zed: the null of the union type itself) carries no branch
        // at all — tag -1, surfaced as a null `_utag`.
        val tag =
          if (base == ZNull) -1
          else {
            val exact = branches.indexWhere(b => exactBranch(base, b))
            if (exact >= 0) exact
            else branches.indexWhere(b => compatibleBranch(base, b))
          }
        require(tag >= 0 || base == ZNull,
          s"value $base matches no branch of union (${branches.mkString(",")})")
        decorations(ZUnion(base, branches.toVector, tag))
      } else { // primitive cast
        val t = typeName()
        eat(')')
        decorations(castPrim(base, t))
      }
    }

    private def typeName(): String = {
      ws()
      val st = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      require(i > st, s"expected type name at $i")
      s.substring(st, i)
    }

    /** The branch this value IS, representation-preserving. */
    private def exactBranch(z: Z, branch: String): Boolean = (z, branch) match {
      case (_: ZInt, "int64" | "int32" | "int16" | "int8" |
                     "uint64" | "uint32" | "uint16" | "uint8") => true
      case (_: ZFloat, "float64" | "float32") => true
      case (_: ZString, "string") => true
      case (_: ZBool, "bool") => true
      case (_: ZTime, "time") => true
      case (_: ZBytes, "bytes") => true
      case _ => false
    }

    /** Branches the value can widen into (tried after [[exactBranch]]). */
    private def compatibleBranch(z: Z, branch: String): Boolean =
      exactBranch(z, branch) || ((z, branch) match {
        case (_: ZInt, "float64" | "float32") => true
        case _ => false
      })

    private def castPrim(z: Z, t: String): Z = (z, t) match {
      case (ZInt(v), "float64" | "float32") => ZFloat(v.toDouble)
      case (v, "int64" | "int32" | "uint8" | "uint16" | "uint32" | "uint64" |
                "int8" | "int16" | "float64" | "float32" | "string" | "bool" |
                "time" | "bytes" | "duration") => v // representation unchanged
      case (v, other) => throw new IllegalArgumentException(
        s"unsupported cast decoration ($other) on $v")
    }

    /** `|{k:v,...}|` map or `|[v,...]|` set. */
    private def mapOrSet(): Z = {
      eat('|')
      ws()
      if (peek == '{') {
        i += 1
        val entries = scala.collection.mutable.Buffer[(Z, Z)]()
        ws()
        while (peek != '}') {
          val k = value()
          eat(':')
          entries += k -> value()
          ws()
          if (peek == ',') { i += 1; ws() }
        }
        i += 1; eat('|')
        ZMap(entries.toVector)
      } else {
        eat('[')
        val items = scala.collection.mutable.Buffer[Z]()
        ws()
        while (peek != ']') {
          items += value()
          ws()
          if (peek == ',') { i += 1; ws() }
        }
        i += 1; eat('|')
        ZSet(items.toVector)
      }
    }

    /** `<type-text>` with balanced angle brackets, text kept verbatim. */
    private def typeValue(): Z = {
      eat('<')
      val st = i
      var depth = 1
      while (depth > 0) {
        require(i < s.length, "unterminated type value")
        if (s(i) == '<') depth += 1
        else if (s(i) == '>') depth -= 1
        i += 1
      }
      ZTypeVal(s.substring(st, i - 1))
    }

    private def record(): Z = {
      eat('{')
      val fields = scala.collection.mutable.Buffer[(String, Z)]()
      ws()
      while (peek != '}') {
        val name = if (peek == '"') quoted() else ident()
        eat(':')
        fields += name -> value()
        ws()
        if (peek == ',') { i += 1; ws() } // trailing commas allowed
      }
      i += 1
      ZRecord(fields.toVector)
    }

    private def array(): Z = {
      eat('[')
      val items = scala.collection.mutable.Buffer[Z]()
      ws()
      while (peek != ']') {
        items += value()
        ws()
        if (peek == ',') { i += 1; ws() }
      }
      i += 1
      ZArray(items.toVector)
    }

    private def quoted(): String = {
      eat('"'); val sb = new StringBuilder
      while (peek != '"') {
        require(i < s.length, "unterminated string")
        if (peek == '\\') {
          i += 1
          s(i) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => throw new IllegalArgumentException(
              s"unsupported escape \\$other")
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      i += 1
      sb.toString
    }

    private def bare(): Z = {
      if (s.startsWith("0x", i)) {
        i += 2; val st = i
        while (i < s.length && "0123456789abcdefABCDEF".indexOf(s(i)) >= 0) i += 1
        return ZBytes(s.substring(st, i).grouped(2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray)
      }
      if (peek == '-' || peek.isDigit) {
        val st = i
        if (peek == '-') i += 1
        var float = false
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
            s(i) == 'E' || ((s(i) == '-' || s(i) == '+') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) {
          if (s(i) == '.' || s(i) == 'e' || s(i) == 'E') float = true
          i += 1
        }
        val tok = s.substring(st, i)
        // Zed renders whole doubles as "3." — trailing dot is still a float
        return if (float) ZFloat(tok.toDouble) else ZInt(tok.toLong)
      }
      ident() match {
        case "true" => ZBool(true)
        case "false" => ZBool(false)
        case "null" => ZNull
        case other => throw new IllegalArgumentException(
          s"unsupported ZSON token '$other' at $i")
      }
    }

    def namedDecoration(): Option[String] = {
      ws()
      if (peek == '(') {
        i += 1; eat('='); val n = ident(); eat(')')
        Some(n)
      } else None
    }
  }
}
