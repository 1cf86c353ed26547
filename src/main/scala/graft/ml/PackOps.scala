package graft.ml

import graft.GQuery
import graft.functions._
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus→training-batch operators: sequence packing (concat-then-chunk
  * into fixed token budgets) and deterministic sampling.
  *
  * The packing prefix-sum is the scale-critical piece: a naive
  * `Window.orderBy(id)` is a single-partition sort — the whole corpus
  * through one task. [[prefixSum]] instead buckets on quantile boundaries
  * of the order key, cumsums within each bucket in parallel, and offsets
  * each bucket by the (tiny, driver-side) running total of bucket sums —
  * the classic two-phase distributed scan. Identical result, no
  * single-task bottleneck at 100 TB.
  */
object PackOps {

  /** Adds `cum` = running sum of `valueCol` in `orderCol` order
    * (`orderCol` must be numeric with unique values; `valueCol` integral).
    *
    * Integral order keys (the packing/gate case) take the FULLY LAZY
    * octave path: bucket = the monotone
    * [[graft.functions.OffsetBucketExpr]] of the key (no statistics job
    * — the same scheme as the ETL renumber), per-bucket exclusive bases
    * from [[graft.etl.OctaveScan.exclusiveBases]] IN-PLAN (a
    * metadata-scale aggregate broadcast back), so composing this into a
    * plan costs zero driver jobs and one less full pass over `df`. The
    * quantile path below remains for fractional keys, where a
    * monotone-int bucket function does not exist; it runs TWO driver
    * jobs at construction (approxQuantile + the bucket-totals collect).
    *
    * Either bucketing is a PURE FUNCTION of the row, so the windowed
    * pass and the totals pass agree by construction with no
    * materialization, and re-evaluations of the plan are deterministic.
    * (A `repartitionByRange` + `spark_partition_id` formulation is NOT
    * deterministic across two evaluations — range partitioning samples —
    * and pinning it needs a localCheckpoint of the whole input.)
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    import org.apache.spark.sql.types._
    val integral = df.schema(orderCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val parted =
      if (integral) {
        // Min-key normalization (r17 advice): the octave bucket width is
        // 2^(bitLength(key)−m), so a domain clustered at a high offset
        // (epoch millis, snowflake ids) would collapse into one or two
        // buckets and funnel the running-sum window through ONE task —
        // the very bottleneck this function exists to avoid. Shift keys
        // by the in-plan min (ONE scalar subquery over the pruned key
        // column — lazy, parallel, still zero driver jobs) so bucketing
        // always sees a dense-from-0 domain; `cum` is unchanged because
        // ANY monotone bucketing telescopes to the same running sum, and
        // the shifted bucket stays monotone by construction (saturating
        // subtract; negative domains now spread instead of collapsing
        // into bucket −1). ReuseSubquery folds the min across the window
        // and totals subtrees, so the plan pays one key-column pass.
        val m = graft.etl.OctaveScan.octaveBits(n)
        val minKey = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
          df.agg(min(col(orderCol)).cast("long")))
        df.withColumn("_bkt", graft.functions.OffsetBucketExpr
          .offsetBucketShifted(col(orderCol), minKey, m))
      } else {
        val probes = (1 until n).map(_.toDouble / n).toArray
        val bounds =
          if (probes.isEmpty) Array.empty[Double]
          else df.stat.approxQuantile(orderCol, probes, 0.001).distinct.sorted
        // bucket = #bounds strictly below the key — a BINARY SEARCH over
        // the (constant, sorted) boundary array via a native expression:
        // a per-bound indicator chain is O(buckets) per row and falls out
        // of whole-stage codegen at cluster-scale partition counts.
        df.withColumn("_bkt", searchSorted(col(orderCol), bounds))
      }
    // per-bucket running sum — parallel windows, one per key range
    val local = parted.withColumn("_local",
      sum(col(valueCol)).over(
        Window.partitionBy("_bkt").orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bucket totals → exclusive bases. sum(valueCol), NOT max of the
    // running sum — max is only correct for non-negative values.
    val totals = parted.groupBy("_bkt")
      .agg(sum(col(valueCol)).cast("long").as("_total"))
    val baseDf =
      if (integral) {
        // in-plan exclusive scan over the (single-key) bucket counts —
        // metadata-scale rows, no collect
        val m = graft.etl.OctaveScan.octaveBits(n)
        graft.etl.OctaveScan.exclusiveBases(
          totals.withColumn("_k", lit(0)), "_k", "_bkt", "_total", m, "_pb_base")
          .select(col("_bkt").as("_pb_bkt"), col("_pb_base"))
      } else {
        val collected = totals
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val bases = collected.scanLeft((0, 0L)) { case ((_, acc), (p, t)) => (p, acc + t) }
          .sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toMap
        import spark.implicits._
        bases.toSeq.toDF("_pb_bkt", "_pb_base")
      }
    local
      .join(broadcast(baseDf), col("_bkt") === col("_pb_bkt"), "left")
      .withColumn("cum", col("_local") + coalesce(col("_pb_base"), lit(0L)))
      .drop("_bkt", "_local", "_pb_bkt", "_pb_base")
  }

  /** Concat-then-chunk packing: documents in `orderCol` order fill
    * fixed-size token windows; each doc gets its sequence id and offset.
    * (A doc longer than `budget` spans sequences — same as LLM training
    * packing, where the chunker splits at the context boundary.)
    */
  def packSequences(docs: DataFrame, budget: Long, orderCol: String = "doc_id",
      tokenCol: String = "n_tokens"): DataFrame =
    prefixSum(docs, orderCol, tokenCol)
      .withColumn("seq_id", floor((col("cum") - col(tokenCol)) / budget).cast("long"))
      .withColumn("seq_off", ((col("cum") - col(tokenCol)) % budget).cast("long"))
      .drop("cum")

  private val qPack = GQuery(
    "q_pack",
    (s, d) => {
      val docs = documents(s, d).select(col("doc_id"),
        graft.functions.CountExprs.tokenCount(col("text")).as("n_tokens"))
      packSequences(docs, budget = 512L)
        .select("doc_id", "n_tokens", "seq_id", "seq_off")
    },
    Some("""WITH t AS (SELECT doc_id,
                              CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                                   x -> len(x) > 0)) AS BIGINT) AS n_tokens
                       FROM documents),
                 c AS (SELECT doc_id, n_tokens,
                              sum(n_tokens) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                       FROM t)
            SELECT doc_id, n_tokens,
                   CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
                   CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_off
            FROM c"""))

  // Deterministic sampling: md5-of-id keys are uniform, engine-independent,
  // and stable across runs — a rerun selects the SAME sample (unlike
  // rand()), which is what reproducible corpus construction needs.
  //  - uniform: hex-threshold filter, no shuffle at all (scan-speed gate)
  //  - stratified: fixed fraction per language. A rank window partitioned
  //    on lang alone funnels each language through ONE task — at 100 TB a
  //    dominant language is most of the corpus. Instead the md5 key's
  //    first two hex digits bucket each stratum 256 ways (a prefix of the
  //    sort key, so bucket-major order IS key order); per-(lang,bucket)
  //    counts are metadata scale (langs × 256 rows → driver exclusive
  //    scan, same two-phase shape as [[prefixSum]]), the exclusive bases
  //    broadcast back, and the rank window partitions on (lang, bucket) —
  //    parallel WITHIN each language.
  private val qSample = GQuery(
    "q_sample",
    (s, d) => {
      val docs = documents(s, d)
      val key = md5(col("doc_id").cast("string"))
      val uniform = docs.filter(key < "1a")
        .select(col("doc_id"), col("lang"), lit("uniform").as("method"))
      val keyed = docs.select(col("doc_id"), col("lang"), key.as("_k"))
        .withColumn("_bkt", substring(col("_k"), 1, 2))
      // per-(lang, bucket) exclusive bases + per-lang totals IN-PLAN: the
      // counts frame is langs × 256 rows (metadata scale), so a per-lang
      // window over ≤ 256 bucket rows is trivially bounded — no driver
      // collect, no construction-time Spark job, the whole gate stays one
      // lazy plan
      val wb = Window.partitionBy("lang").orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wt = Window.partitionBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val baseDf = broadcast(
        keyed.groupBy("lang", "_bkt").agg(count(lit(1)).as("_c"))
          .select(col("lang").as("_b_lang"), col("_bkt").as("_b_bkt"),
            coalesce(sum(col("_c")).over(wb), lit(0L)).as("_base"),
            sum(col("_c")).over(wt).as("_n")))
      val w = Window.partitionBy("lang", "_bkt").orderBy("_k")
      val stratified = keyed
        .join(baseDf, col("lang") === col("_b_lang") && col("_bkt") === col("_b_bkt"))
        .withColumn("_rn", row_number().over(w).cast("long") + col("_base"))
        .filter(col("_rn") <= ceil(col("_n") * 0.2))
        .select(col("doc_id"), col("lang"), lit("stratified").as("method"))
      uniform.unionByName(stratified)
    },
    Some("""SELECT doc_id, lang, 'uniform' AS method FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'
            UNION ALL
            SELECT doc_id, lang, 'stratified' FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents)
            WHERE rn <= ceil(n * 0.2)"""))

  // Mixture sampling: per-source target weights applied as deterministic
  // md5-threshold filters — the data-mixing step of corpus construction
  // (e.g. upsample books, downsample web). Rates map to hex-prefix
  // thresholds (md5 hex digits are uniform), so the whole mixture is one
  // scan-speed filter: no shuffle, no rand(), reruns select the SAME rows.
  private val mixtureRates: Seq[(String, Double, String)] =
    (0 until 20).map { i =>
      val (rate, thr) = Seq((1.0, "g"), (0.5, "8"), (0.25, "4"), (0.125, "2"))(i % 4)
      (s"src$i", rate, thr)
    }

  private val qMixture = GQuery(
    "q_mixture",
    (s, d) => {
      val thr = element_at(
        map(mixtureRates.flatMap { case (src, _, t) => Seq(lit(src), lit(t)) }: _*),
        col("source"))
      val weight = element_at(
        map(mixtureRates.flatMap { case (src, r, _) => Seq(lit(src), lit(r)) }: _*),
        col("source"))
      documents(s, d)
        .filter(md5(concat(lit("mix:"), col("doc_id").cast("string"))) < thr)
        .select(col("doc_id"), col("source"), weight.as("weight"))
    },
    Some {
      val thrCase = mixtureRates.map { case (src, _, t) =>
        s"WHEN '$src' THEN '$t'" }.mkString("CASE source ", " ", " END")
      val rateCase = mixtureRates.map { case (src, r, _) =>
        s"WHEN '$src' THEN $r" }.mkString("CASE source ", " ", " END")
      s"""SELECT doc_id, source, $rateCase AS weight
          FROM documents
          WHERE md5('mix:' || CAST(doc_id AS VARCHAR)) < $thrCase"""
    })

  // Deterministic training-order shuffle: md5-keyed shard + within-shard
  // position. At 100 TB this is one hash-key shuffle: shards bound each
  // window partition (256 of them), and writers emit shard files whose
  // concatenation is the epoch order — no global sort, no single-task
  // window, rerun-stable (same seed → same order).
  private val qShuffleOrder = GQuery(
    "q_shuffle_order",
    (s, d) => {
      val key = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
      val w = Window.partitionBy("shard").orderBy("_k", "doc_id")
      documents(s, d)
        .select(col("doc_id"), substring(key, 1, 2).as("shard"), key.as("_k"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    },
    Some("""WITH k AS (
              SELECT doc_id,
                     md5('shuf:' || CAST(doc_id AS VARCHAR)) AS key
              FROM documents)
            SELECT doc_id, substr(key, 1, 2) AS shard,
                   CAST(row_number() OVER (PARTITION BY substr(key, 1, 2)
                                           ORDER BY key, doc_id) AS BIGINT) AS pos
            FROM k"""))

  // Deterministic train/val/test split: md5-keyed assignment with fixed
  // fractions (95/2.5/2.5 here). Same properties as q_sample — scan-speed,
  // no shuffle, rerun-stable, and adding data never moves an existing doc
  // between splits (its hash doesn't change). Hex-prefix thresholds:
  // 16^4 buckets, val < 0666 (~2.5%), test < 0ccc (~2.5%), rest train.
  private val qSplit = GQuery(
    "q_split",
    (s, d) => {
      val key = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4)
      documents(s, d).select(
        col("doc_id"),
        when(key < "0666", "val")
          .when(key < "0ccc", "test")
          .otherwise("train").as("split"))
    },
    Some("""SELECT doc_id,
                   CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < '0666' THEN 'val'
                        WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < '0ccc' THEN 'test'
                        ELSE 'train' END AS split
            FROM documents"""))

  val queries: Seq[GQuery] = Seq(qPack, qSample, qMixture, qShuffleOrder, qSplit)
}
