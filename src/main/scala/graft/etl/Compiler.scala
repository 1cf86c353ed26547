package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compiles an ETL [[Transform]] into a DataFrame program — the Spark
  * replacement for the reference's YAML→Zed compiler + lake execution
  * (ref: etl/build.go:20-216, ztests/etl-zed.yaml golden).
  *
  * Semantics reproduced exactly:
  *  - per input topic, drop records already marked done in the output pool
  *    (anti join on (topic, offset) — ref fromTemplate, etl/build.go:111-116)
  *  - switch: each surviving record routes to the FIRST matching rule
  *    (stateless case = where ∧ topic==in; denorm case = where)
  *  - stateless rule emits user-transform(out) + a done record per input
  *    (ref: buildStateless, etl/build.go:163-185)
  *  - denorm rule inner-joins left/right topic streams on the join-on
  *    field paths; emits user-transform(out) with left's kafka meta + done
  *    records for BOTH sides of each joined pair — unjoined records stay
  *    pending until their partner arrives (ref: buildDenorm, :187-216)
  *  - output offsets are assigned densely per output topic in original
  *    kafka.offset order, continuing from the output pool's next producer
  *    offset (ref: insertOffsets, etl/pipeline.go:127-164 — the reference
  *    rewrites ZSON text; here it is one window function)
  *
  * Scale: the entire program is one Catalyst plan — anti join and denorm
  * join shuffle on their keys (or broadcast when the done-set is small),
  * the renumbering window shuffles once on output topic. Nothing touches
  * the driver.
  */
object Compiler {

  /** Envelope column names every pool row carries. */
  val TypeCol = "_type"
  val Done = "done"

  final case class Program(transform: Transform) {

    /** @param input  envelope rows of the input pool(s), already restricted
      *               to data rows (no done markers)
      * @param doneSet (topic: string, offset: long) pairs already processed
      * @param baseOffsets next producer offset per output topic (missing
      *               topic = 0)
      * @param pin    hook applied to intermediates the renumbering phase
      *               re-evaluates (the routed input and each denorm join).
      *               Default identity; a caller that will materialize the
      *               result (Pipeline) passes `_.persist(...)` and
      *               unpersists after, so the scan and joins run once
      *               instead of once per renumber statistics job.
      */
    def run(input: DataFrame, doneSet: DataFrame, baseOffsets: Map[String, Long],
        pin: DataFrame => DataFrame = identity): DataFrame = {
      val t = transform
      val inputTopics = t.inputs.map(_.topic)
      val schema = input.schema

      // -- anti join against the done set (exactly-once restart safety)
      val undone = input
        .filter(col("kafka.topic").isin(inputTopics: _*))
        .join(doneSet.select(col("topic").as("_d_topic"), col("offset").as("_d_offset")),
          col("kafka.topic") === col("_d_topic") && col("kafka.offset") === col("_d_offset"),
          "left_anti")

      // -- switch: first matching rule index per record
      val ruleIdx = t.rules.zipWithIndex.foldRight(lit(-1): Column) {
        case ((r, i), rest) =>
          val cond = r.ruleType match {
            case "stateless" =>
              ZedExpr.predicate(r.where, schema) && col("kafka.topic") === r.in
            case "denorm" => ZedExpr.predicate(r.where, schema)
          }
          when(cond, lit(i)).otherwise(rest)
      }
      val routed = pin(undone.withColumn("_rule", ruleIdx))

      // -- per rule: (data rows with out + original kafka, done rows)
      val parts: Seq[(DataFrame, DataFrame)] = t.rules.zipWithIndex.map {
        case (r, i) =>
          val matched = routed.filter(col("_rule") === i).drop("_rule")
          r.ruleType match {
            case "stateless" =>
              val outAst = ZedExpr.parseOutAssign(r.zed)
              // `in` = the whole input record (ref: yield {in:this})
              val wrapped = matched.select(struct(matched.columns.toSeq.map(col): _*).as("in"))
              val data = wrapped.select(
                ZedExpr.toColumn(outAst, wrapped.schema).as("out"),
                col("in.kafka").as("_inkafka"))
                .withColumn("_outtopic", lit(r.out))
              val doneRows = matched.select(
                struct(col("kafka.topic").as("topic"),
                  col("kafka.offset").as("offset")).as("kafka"))
                .withColumn("_outtopic", lit(r.out))
              (data, doneRows)

            case "denorm" =>
              val Array(lk, rk) = r.joinOn.split("=").map(_.trim)
              require(lk.nonEmpty && rk.nonEmpty, s"join-on syntax error: ${r.joinOn}")
              val lrows = matched.filter(col("kafka.topic") === r.left)
                .select(struct(matched.columns.toSeq.map(col): _*).as("left"))
              val rrows = matched.filter(col("kafka.topic") === r.right)
                .select(struct(matched.columns.toSeq.map(col): _*).as("right"))
              val joined = pin(lrows.join(rrows, col(lk) === col(rk), "inner"))
              val data = joined.select(
                ZedExpr.toColumn(ZedExpr.parseOutAssign(r.zed), joined.schema).as("out"),
                col("left.kafka").as("_inkafka"))
                .withColumn("_outtopic", lit(r.out))
              val doneRows = joined.select(
                struct(col("left.kafka.topic").as("topic"),
                  col("left.kafka.offset").as("offset")).as("kafka"))
                .unionByName(joined.select(
                  struct(col("right.kafka.topic").as("topic"),
                    col("right.kafka.offset").as("offset")).as("kafka")))
                .withColumn("_outtopic", lit(r.out))
              (data, doneRows)
          }
      }

      // -- fuse rule outputs (heterogeneous out shapes → widened schema)
      val allData = parts.map(_._1).reduce(_.unionByName(_, allowMissingColumns = true))
      val allDone = parts.map(_._2).reduce(_.unionByName(_))

      // -- dense offset assignment per output topic, continuing from the
      //    pool high-water mark; ordered by original (offset, topic).
      //
      // Two-phase distributed renumber (same shape as the prefix sum in
      // ml/PackOps.scala): Window.partitionBy(_outtopic) alone constant-
      // folds to a NO-PARTITION window when the program has one output
      // topic — a single task numbering the whole batch. Instead, range-
      // bucket rows by the input offset (bucket = pure integer function of
      // the row, monotone in the order key, boundaries from one stats-only
      // min/max job), run the row_number window per (_outtopic, _bkt) —
      // all buckets in parallel — and add a driver-computed exclusive
      // per-(topic, bucket) count base (topics × buckets rows, metadata
      // scale). (offset, topic) is a unique total order per kafka
      // envelope, so the numbering is deterministic across re-evaluations.
      val baseExpr = baseOffsets.foldLeft(lit(0L)) { case (acc, (topic, base)) =>
        when(col("_outtopic") === topic, lit(base)).otherwise(acc)
      }
      val stats = allData.agg(
        min(col("_inkafka.offset")), max(col("_inkafka.offset"))).head()
      // `_outtopic` survives into the result so a multi-pool pipeline can
      // split rows (data AND done markers) by their destination pool; the
      // pipeline drops it before append.
      val renumbered = (if (stats.isNullAt(0)) {
        // empty batch: no window needed to number zero rows
        allData.withColumn("_newoff", baseExpr)
      } else {
        val (lo, hi) = (stats.getLong(0), stats.getLong(1))
        val nb = allData.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        // integer bucket width, ceil(span / nb): (offset - lo) / width is
        // monotone, lands in [0, nb-1], and never overflows (no multiply)
        val span = hi - lo + 1L
        val width = math.max(1L, span / nb + (if (span % nb == 0) 0L else 1L))
        val bucket = ((col("_inkafka.offset") - lit(lo)) / lit(width)).cast("int")
        val withB = allData.withColumn("_bkt", bucket)
        val counts = withB.groupBy("_outtopic", "_bkt").count().collect()
          .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
        val bucketBase: Map[(String, Int), Long] = counts.keys.groupBy(_._1)
          .flatMap { case (topic, keys) =>
            val sorted = keys.toSeq.sortBy(_._2)
            sorted.zip(sorted.scanLeft(0L)((acc, k) => acc + counts(k)))
              .map { case (k, excl) => k -> excl }
          }
        val bucketBaseExpr = bucketBase.foldLeft(lit(0L)) {
          case (acc, ((topic, b), base)) =>
            when(col("_outtopic") === topic && col("_bkt") === b, lit(base))
              .otherwise(acc)
        }
        val w = Window.partitionBy(col("_outtopic"), col("_bkt"))
          .orderBy(col("_inkafka.offset").asc, col("_inkafka.topic").asc)
        withB.withColumn("_newoff",
          row_number().over(w).cast("long") - 1L + bucketBaseExpr + baseExpr)
      }).select(
          col("out.*"),
          struct(col("_outtopic").as("topic"), col("_newoff").as("offset")).as("kafka"),
          lit(null).cast("string").as(TypeCol),
          col("_outtopic"))

      val doneOut = allDone.select(
        col("kafka"),
        lit(Done).as(TypeCol),
        col("_outtopic"))

      renumbered
        .unionByName(doneOut, allowMissingColumns = true)
        .orderBy(col("kafka.offset"))
    }
  }

  def compile(t: Transform): Program = {
    Transform.validate(t)
    Program(t)
  }
}
