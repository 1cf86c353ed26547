package graft.zson

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** ZSON text rendering of DataFrame rows — the output-format surface of
  * `zync consume` (cmd/zync/consume/command.go:66-103 writes any Zed output
  * format; ZSON is the human/golden-test format).
  *
  * Null-valued fields are dropped: the fused Spark schema represents
  * Zed's per-record dynamic types, where absent fields simply don't exist
  * (SURVEY §7 marker-column strategy). Rows whose `_type` marker is set
  * render with the named-type decoration `(=name)`.
  */
object Zson {

  def render(row: Row, schema: StructType): String = {
    val named =
      if (schema.fieldNames.contains("_type")) Option(row.getAs[String]("_type"))
      else None
    val body = schema.fields.toSeq.filterNot(_.name == "_type").flatMap { f =>
      value(row.get(schema.fieldIndex(f.name)), f.dataType).map(s => s"${f.name}:$s")
    }.mkString("{", ",", "}")
    named.map(n => s"$body(=$n)").getOrElse(body)
  }

  private def value(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (null, _) => None
    // type value `<...>` — the tagged one-field struct ZsonValue produces
    case (r: Row, st: StructType)
        if st.fieldNames.sameElements(Seq(ZsonValue.TypeValField)) =>
      Option(r.getString(0)).map(t => s"<$t>")
    // union — tagged struct {_utag, _u0, ...}: render the branch value
    // with the `((t1,t2,...))` union-cast decoration, branch names
    // recovered from the Spark branch types
    case (r: Row, st: StructType)
        if st.fieldNames.contains(ZsonValue.UnionTagField) =>
      val tagIdx = st.fieldIndex(ZsonValue.UnionTagField)
      val branches = st.fields.toSeq.filter(_.name.startsWith("_u"))
        .filterNot(_.name == ZsonValue.UnionTagField)
        .sortBy(_.name.stripPrefix("_u").toInt)
      val names = branches.map(f => ZsonValue.sparkToZed.getOrElse(f.dataType,
        throw new IllegalArgumentException(
          s"unrenderable union branch type ${f.dataType}")))
      // null _utag = the union type's own null (parsed from
      // `null((t1,t2))`) — value-preserving, not a dropped field
      if (r.isNullAt(tagIdx)) Some(s"null((${names.mkString(",")}))")
      else {
        val tag = r.getInt(tagIdx)
        val bf = st.fieldIndex(s"_u$tag")
        value(r.get(bf), st.fields(bf).dataType)
          .map(s => s"$s((${names.mkString(",")}))")
      }
    case (r: Row, st: StructType) =>
      val fields = st.fields.toSeq.flatMap { f =>
        value(r.get(st.fieldIndex(f.name)), f.dataType).map(s => s"${f.name}:$s")
      }
      if (fields.isEmpty) None else Some(fields.mkString("{", ",", "}"))
    // map `|{k:v,...}|`, entries sorted by rendered key for stable output.
    // A null VALUE renders as the ZSON null literal — dropping the entry
    // (the record-field rule) would silently lose it on the
    // produce→pool→consume round trip; the entry exists, its value is null.
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      Some(m.toSeq.flatMap { case (k, x) =>
        value(k, kt).map(ks => s"$ks:${value(x, vt).getOrElse("null")}")
      }.sorted.mkString("|{", ",", "}|"))
    case (s: String, _) => Some("\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\"")
    // null ELEMENTS render as the null literal for the same reason as
    // map values: [1,null,2] must not collapse to [1,2]
    case (seq: scala.collection.Seq[_], ArrayType(inner, _)) =>
      Some(seq.map(x => value(x, inner).getOrElse("null"))
        .mkString("[", ",", "]"))
    case (b: Array[Byte], BinaryType) =>
      Some("0x" + b.map(x => f"$x%02x").mkString)
    case (t: java.sql.Timestamp, _) => Some(t.toInstant.toString)
    case (d: java.lang.Double, _) =>
      Some(if (d == d.longValue().toDouble) s"${d.longValue()}." else d.toString)
    case (f: java.lang.Float, _) =>
      Some(if (f == f.longValue().toFloat) s"${f.longValue()}." else f.toString)
    case (b: java.lang.Boolean, _) => Some(b.toString)
    case (other, _) => Some(other.toString)
  }

  /** Render a DataFrame as ZSON lines, streamed partition-by-partition via
    * `toLocalIterator` so `consume-pool`/`consume` never buffer the whole
    * pool on the driver (per-partition order is preserved after `orderBy`,
    * so line order matches the sort).
    */
  def renderAll(df: DataFrame): Iterator[String] = {
    val schema = df.schema
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala.map(r => render(r, schema))
  }
}
