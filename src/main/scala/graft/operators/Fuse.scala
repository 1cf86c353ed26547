package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema fusion — Zed's `fuse` operator as a public utility: merge any
  * number of heterogeneous DataFrames into one wide schema, recursively
  * unifying nested structs by field name and padding what's missing with
  * typed nulls (README.md:486,503; SURVEY §7 strategy).
  *
  * `unionByName(allowMissingColumns=true)` handles most cases; this helper
  * additionally reconciles structs whose shared field names have different
  * but compatible orders/nesting/numeric widths by explicitly shaping each
  * input to the fused schema.
  */
object Fuse {

  /** Compute the fused (widened) type of two types. */
  def fuseType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, y) => y
    case (x, NullType) => x
    case (x: StructType, y: StructType) =>
      val yByName = y.fields.map(f => f.name -> f).toMap
      val merged = x.fields.map { f =>
        yByName.get(f.name)
          .map(g => StructField(f.name, fuseType(f.dataType, g.dataType)))
          .getOrElse(f)
      } ++ y.fields.filterNot(f => x.fieldNames.contains(f.name))
      StructType(merged)
    case (ArrayType(xi, _), ArrayType(yi, _)) => ArrayType(fuseType(xi, yi))
    case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
      MapType(fuseType(xk, yk), fuseType(xv, yv))
    case (x: NumericType, y: NumericType) =>
      // numeric widening: the wider of the two
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      val (ix, iy) = (order.indexOf(x), order.indexOf(y))
      if (ix >= 0 && iy >= 0) order(ix.max(iy)) else DoubleType
    case (x, y) =>
      throw new IllegalArgumentException(s"cannot fuse $x with $y")
  }

  def fusedSchema(schemas: Seq[StructType]): StructType =
    schemas.reduce((a, b) => fuseType(a, b).asInstanceOf[StructType])

  private def shapeTo(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if f == t => c
      case (f: StructType, t: StructType) =>
        val built = struct(t.fields.toSeq.map { tf =>
          f.fields.find(_.name == tf.name) match {
            case Some(ff) => shapeTo(c.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        when(c.isNull, lit(null).cast(t)).otherwise(built)
      case (ArrayType(fi, _), ArrayType(ti, _)) =>
        transform(c, x => shapeTo(x, fi, ti))
      case (_, t) => c.cast(t)
    }

  /** Fuse DataFrames into one with the widened schema. */
  def fuse(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty)
    val target = fusedSchema(dfs.map(_.schema))
    dfs.map { df =>
      val bySrc = df.schema.fields.map(f => f.name -> f).toMap
      df.select(target.fields.toSeq.map { tf =>
        bySrc.get(tf.name) match {
          case Some(sf) => shapeTo(col(sf.name), sf.dataType, tf.dataType).as(tf.name)
          case None => lit(null).cast(tf.dataType).as(tf.name)
        }
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
