package graft.operators

import graft.GQuery
import graft.functions.stableRound
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The relational operator inventory of the reference (SURVEY §2B): every
  * operator zync generates in its Zed programs (`etl/build.go`,
  * `fifo/lake.go`, `etl/pool.go`, demo scripts), re-expressed as declarative
  * DataFrame plans over the driver's TPC-H-ish tables.
  *
  * Scale design: all plans are pure Catalyst — filters/projections push into
  * the parquet scan, small dimension tables are broadcast explicitly, and
  * aggregations are partial (map-side combine) by construction. Nothing here
  * collects to the driver.
  */
object Relational {

  // ---- scan + filter + projection (from pool X | predicate | cut) --------
  // ref: etl/build.go:111-116, fifo/lake.go:65,85
  private val qScanFilter = GQuery(
    "q_scan_filter",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") < lit("1999-01-01") && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1999-01-01' AND l_discount > 0.05"""),
    headline = true)

  // ---- group-by aggregation (sum/count; TPC-H q1 shape) ------------------
  // ref: etl/pool.go:62 (group-by agg), demo/etl.zed
  // Money sums rounded to whole units: double accumulation order differs
  // between engines at the 1e-4 level on ~1e9 magnitudes; integer-dollar
  // rounding keeps the oracle hash-stable without weakening the check.
  private val qAgg = GQuery(
    "q_agg",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          stableRound(sum("l_quantity"), 2).as("sum_qty"),
          // The sf100 rung's scale bug: revenue is a ~100M-row-per-group
          // float64 sum whose accumulated rounding error (±2 in 5e12)
          // exceeds the integer rounding grain, so Spark's and DuckDB's
          // different accumulation orders disagree. Money columns have
          // exact decimal domains (2-decimal price, 2-decimal discount):
          // summing as DECIMAL is exact — deterministic at ANY scale and
          // any partitioning — and rendered as BIGINT on both sides.
          // Tight casts with headroom, not decimal(18,4): (18,4)*(19,4)
          // resolves to decimal(38,8) — exactly Spark's precision cap, one
          // widening away from silent allowPrecisionLoss scale reduction.
          // price needs 2 decimals and <10^10 integer digits → (12,2);
          // discount is 0.00–0.99 → (4,2); the product lands at (18,4),
          // the grouped sum at (28,4) — far below 38 at any group size.
          round(sum(col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))), 0)
            .cast("long").as("revenue"),
          count(lit(1)).as("n")),
    Some("""SELECT l_returnflag, l_linestatus,
                   floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))), 0) AS BIGINT) AS revenue,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2"""),
    headline = true)

  // ---- per-topic high-water mark (offset:=max(kafka.offset) by topic) ----
  // ref: etl/pool.go:60-81, README.md:359
  private val qGroupbyMax = GQuery(
    "q_groupby_max",
    (s, d) =>
      events(s, d)
        .groupBy(col("event_type").as("topic"))
        .agg(max("event_id").cast("long").as("offset")),
    Some("""SELECT event_type AS topic, CAST(max(event_id) AS BIGINT) AS offset
            FROM events GROUP BY 1"""))

  // ---- anti join (drop already-processed records) ------------------------
  // ref: etl/build.go:115, demo/update.zed, README.md:368-381
  private val qAntiJoin = GQuery(
    "q_anti_join",
    (s, d) => {
      val done = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      orders(s, d)
        .join(broadcast(done), col("o_custkey") === col("c_custkey"), "left_anti")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_mktsegment = 'BUILDING')"""),
    headline = true)

  // ---- semi join (EXISTS; the complement sanity of the anti join) --------
  private val qSemiJoin = GQuery(
    "q_semi_join",
    (s, d) => {
      val seg = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      orders(s, d)
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey")
    },
    Some("""SELECT o_orderkey, o_custkey FROM orders o
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_mktsegment = 'AUTOMOBILE')"""))

  // ---- inner equi join chain (denormalization) ---------------------------
  // ref: etl/build.go:187-216 (denorm rule). Dimensions broadcast: at 100 TB
  // the fact side streams, customer/nation/region stay broadcast-joined.
  private val qInnerJoin = GQuery(
    "q_inner_join",
    (s, d) =>
      orders(s, d)
        .filter(col("o_totalprice") > 200000)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("o_orderkey"), col("c_name"), col("n_name"), col("r_name"),
          col("o_totalprice")),
    Some("""SELECT o_orderkey, c_name, n_name, r_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_totalprice > 200000"""),
    headline = true)

  // ---- sort + head N (ordered limit) -------------------------------------
  // ref: fifo/lake.go:85 (head %d), etl/build.go:107 (sort kafka.offset)
  private val qSortHead = GQuery(
    "q_sort_head",
    (s, d) =>
      events(s, d)
        .orderBy("event_id")
        .limit(100)
        .select("event_id", "event_type", "user_id"),
    Some("""SELECT event_id, event_type, user_id FROM events
            ORDER BY event_id LIMIT 100"""))

  // ---- top-N per group (beyond the reference's global head/tail) ---------
  // The per-key selection every training pipeline needs (best doc per
  // cluster, latest event per user): rank within partitions — shuffles
  // once on the group key, never globally sorts.
  private val qTopPerGroup = GQuery(
    "q_top_per_group",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id").asc)
      events(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("event_type", "event_id", "value", "rk")
    },
    Some("""SELECT event_type, event_id, value, rk FROM (
              SELECT event_type, event_id, value,
                     CAST(row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS BIGINT) AS rk
              FROM events)
            WHERE rk <= 3"""))

  // ---- tail 1 (resume-from-lake offset recovery) -------------------------
  // ref: fifo/lake.go:62-82 (kafka.topic=='T' | tail 1 | yield kafka)
  private val qTail1 = GQuery(
    "q_tail1",
    (s, d) =>
      events(s, d)
        .orderBy(col("event_id").desc)
        .limit(1)
        .select("event_id", "event_type"),
    Some("SELECT event_id, event_type FROM events ORDER BY event_id DESC LIMIT 1"))

  // ---- collect aggregation (transaction reassembly) ----------------------
  // ref: demo/etl.zed:12 (records:=collect(this) by txn). Order inside the
  // collected list is made deterministic by sorting on the unique event_id.
  private val qCollect = GQuery(
    "q_collect",
    (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ",").as("types")),
    Some("""SELECT user_id, string_agg(event_type, ',' ORDER BY event_id) AS types
            FROM events GROUP BY 1"""))

  // ---- bool_or aggregation (transaction completeness) --------------------
  // ref: demo/etl.zed:12 (done:=or(value.done) by txn)
  private val qBoolOr = GQuery(
    "q_bool_or",
    (s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(
          expr("bool_or(value > 150)").as("any_big"),
          count(lit(1)).as("n")),
    Some("""SELECT user_id, bool_or(value > 150) AS any_big, count(*) AS n
            FROM events GROUP BY 1"""))

  // ---- yield (arbitrary computed reshape per record) ---------------------
  // ref: etl/build.go:91,171-181; demo/etl.zed:13-18
  private val qYield = GQuery(
    "q_yield",
    (s, d) =>
      lineitem(s, d)
        .filter(col("l_linenumber") <= 3)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          stableRound(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2)
            .as("charge"),
          when(col("l_returnflag") === "R", lit("returned")).otherwise(lit("kept"))
            .as("status")),
    Some("""SELECT l_orderkey, l_linenumber,
                   floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge,
                   CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS status
            FROM lineitem WHERE l_linenumber <= 3"""))

  // ---- cut (column projection) -------------------------------------------
  // ref: demo/update.zed:3 (cut seqno)
  private val qCut = GQuery(
    "q_cut",
    (s, d) => documents(s, d).select("doc_id", "lang", "source"),
    Some("SELECT doc_id, lang, source FROM documents"))

  // ---- switch/case routing + fork/union ----------------------------------
  // ref: etl/build.go:92-107 (switch), :137 (fork). First-match semantics:
  // each branch filters out what earlier cases took, outputs are unioned.
  private val qSwitch = GQuery(
    "q_switch",
    (s, d) => {
      val ev = events(s, d)
      val c1 = col("event_type") === "purchase" && col("value") > 100
      val c2 = col("event_type") === "error"
      val b1 = ev.filter(c1)
        .select(col("event_id"), lit("big_purchase").as("route"), col("value").as("v"))
      val b2 = ev.filter(!c1 && c2)
        .select(col("event_id"), lit("error").as("route"), col("value").as("v"))
      val b3 = ev.filter(!c1 && !c2)
        .select(col("event_id"), lit("other").as("route"), lit(null).cast("double").as("v"))
      b1.unionByName(b2).unionByName(b3)
    },
    Some("""SELECT event_id, 'big_purchase' AS route, value AS v FROM events
            WHERE event_type = 'purchase' AND value > 100
            UNION ALL
            SELECT event_id, 'error', value FROM events
            WHERE NOT (event_type = 'purchase' AND value > 100) AND event_type = 'error'
            UNION ALL
            SELECT event_id, 'other', NULL FROM events
            WHERE NOT (event_type = 'purchase' AND value > 100) AND event_type <> 'error'"""))

  // ---- fuse (heterogeneous schema union) ---------------------------------
  // ref: README.md:486,503; SURVEY §7 schema-fusion strategy
  private val qFuse = GQuery(
    "q_fuse",
    (s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id").as("id"), lit("doc").as("kind"), col("lang"))
      val evs = events(s, d)
        .select(col("event_id").as("id"), lit("event").as("kind"), col("value"))
      docs.unionByName(evs, allowMissingColumns = true)
    },
    Some("""SELECT doc_id AS id, 'doc' AS kind, lang, CAST(NULL AS DOUBLE) AS value
            FROM documents
            UNION ALL
            SELECT event_id, 'event', CAST(NULL AS VARCHAR), value FROM events"""))

  // ---- cursor range scan ( >= predicate + sort + head) -------------------
  // ref: design.md:66-85 (seqno >= cursor), demo/update.zed:3
  private val qRangeCursor = GQuery(
    "q_range_cursor",
    (s, d) =>
      events(s, d)
        .filter(col("event_id") >= 900)
        .orderBy("event_id")
        .limit(50)
        .select("event_id", "user_id", "event_type"),
    Some("""SELECT event_id, user_id, event_type FROM events
            WHERE event_id >= 900 ORDER BY event_id LIMIT 50"""))

  // ---- dense offset assignment -------------------------------------------
  // ref: etl/pipeline.go:127-164 — the reference rewrites ZSON text and
  // re-runs a query; this gate shows the SEMANTICS as the minimal window
  // form. Note the scale caveat: a per-topic rank window sorts each topic's
  // rows in ONE task, so this shape is demo-sized only. The production path
  // is etl/Compiler.scala's octave-bucketed renumber (broadcast per-bucket
  // bases, rank within bucket — parallel within a topic) with the
  // driver-known-span small-batch fast path layered on top; the gate's
  // hash-equality to that path is pinned by EtlFastPathSpec.
  private val qOffsetAssign = GQuery(
    "q_offset_assign",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("topic").orderBy("event_id")
      events(s, d)
        .select(col("event_id"), col("event_type").as("topic"))
        .withColumn("new_offset", (row_number().over(w).cast("long") + 1000000L))
    },
    Some("""SELECT event_id, event_type AS topic,
                   CAST(1000000 + row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS BIGINT)
                     AS new_offset
            FROM events"""))

  // ---- named-type marker rows (done records; is(<done>) predicate) -------
  // ref: etl/pipeline.go:29,101-115; SURVEY §7 marker-column strategy
  private val qDoneMarker = GQuery(
    "q_done_marker",
    (s, d) => {
      val ev = events(s, d)
      val data = ev.filter(col("event_id") < 10)
        .select(col("event_id").cast("long").as("offset"),
          col("event_type").as("topic"),
          lit(null).cast("string").as("_type"))
      val done = ev.groupBy(col("event_type").as("topic"))
        .agg(max("event_id").cast("long").as("offset"))
        .select(col("offset"), col("topic"), lit("done").as("_type"))
      data.unionByName(done)
    },
    Some("""SELECT CAST(event_id AS BIGINT) AS offset, event_type AS topic,
                   CAST(NULL AS VARCHAR) AS _type
            FROM events WHERE event_id < 10
            UNION ALL
            SELECT CAST(max(event_id) AS BIGINT), event_type, 'done'
            FROM events GROUP BY event_type"""))

  // ---- const map literal + lookup ----------------------------------------
  // ref: demo/etl.zed:1-18 (const customerIDs = |{...}|)
  private val regionByKey = Map(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA",
    3 -> "EUROPE", 4 -> "MIDDLE EAST")
  private val qMapLookup = GQuery(
    "q_map_lookup",
    (s, d) =>
      nation(s, d).select(
        col("n_nationkey"), col("n_name"),
        element_at(
          typedlit(regionByKey), col("n_regionkey")).as("region_name")),
    Some("""SELECT n_nationkey, n_name,
                   CASE n_regionkey WHEN 0 THEN 'AFRICA' WHEN 1 THEN 'AMERICA'
                        WHEN 2 THEN 'ASIA' WHEN 3 THEN 'EUROPE'
                        WHEN 4 THEN 'MIDDLE EAST' END AS region_name
            FROM nation"""))

  // ---- shaper string functions (to_upper, split) -------------------------
  // ref: README.md:77-80 (documented shaper example)
  private val qStringFuns = GQuery(
    "q_string_funs",
    (s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        element_at(split(col("c_name"), "#"), 2).as("cnum")),
    Some("""SELECT c_custkey, upper(c_name) AS uname,
                   split_part(c_name, '#', 2) AS cnum
            FROM customer"""))

  // ---- nested field assignment (withField offset rewrite) ----------------
  // ref: etl/pipeline.go:153 (rec.kafka.offset:=offset | yield rec)
  private val qWithField = GQuery(
    "q_withfield",
    (s, d) =>
      events(s, d)
        .select(
          struct(col("event_type").as("topic"), col("event_id").cast("long").as("offset"))
            .as("kafka"),
          col("user_id"))
        .withColumn("kafka",
          col("kafka").withField("offset", col("kafka.offset") + 5000000L))
        .select(col("kafka.topic").as("topic"), col("kafka.offset").as("offset"),
          col("user_id")),
    Some("""SELECT event_type AS topic, CAST(event_id + 5000000 AS BIGINT) AS offset, user_id
            FROM events"""))

  // ---- time-window aggregation over the event stream ---------------------
  // (micro-batch/day bucketing; ns timestamps handled via Tables.eventTime)
  private val qWindowDay = GQuery(
    "q_window_day",
    (s, d) => {
      val raw = events(s, d)
      raw.select(date_format(eventTime(raw, "ts"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("value"))
        .groupBy("day", "event_type")
        // value has an exact 2-decimal domain: a DECIMAL sum is exact and
        // order-independent (the double sum's accumulation error is a
        // function of group size — fine here today, but the q_agg sf100
        // lesson says don't leave float sums on unbounded-group gates).
        // Cast back to double so the output schema stays stable.
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    },
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events GROUP BY 1, 2"""),
    headline = true)

  // ---- skew-safe two-phase aggregation (salting) -------------------------
  // event_type has 5 hot keys across all partitions; the salted plan
  // pre-aggregates on (key, salt) so no reducer sees a whole hot key, then
  // combines the partials. Identical results to the direct groupBy — which
  // is exactly what the oracle checks.
  private val qSaltedAgg = GQuery(
    "q_salted_agg",
    (s, d) => {
      // DECIMAL partials: the whole point of the gate is salted == direct,
      // and exact decimal sums make that equivalence exact by construction
      // (a 20M-row-per-key double sum at sf100 drifts to within 0.21 of
      // the rounding boundary — the q_agg failure mode one rung later).
      val salted = events(s, d)
        .withColumn("_salt", pmod(col("event_id"), lit(16)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("pv"))
      salted.groupBy("event_type")
        .agg(sum("pn").cast("long").as("n"),
          sum("pv").cast("double").as("total"))
    },
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events GROUP BY 1"""))

  // ---- shaper scalar-function breadth ------------------------------------
  // the wider scalar surface a shaper script can use (beyond the
  // documented to_upper/split): string, conditional, null-handling, math.
  private val qScalarFuns = GQuery(
    "q_scalar_funs",
    (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_brand")).cast("long").as("brand_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        coalesce(nullif(col("p_type"), lit("unknown")), lit("n/a")).as("typ"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        abs(col("p_retailprice") - 1000.0).as("dist1000"),
        greatest(col("p_size"), lit(25)).cast("long").as("gsize"),
        when(col("p_size") % 2 === 0, lit("even")).otherwise(lit("odd")).as("parity")),
    Some("""SELECT p_partkey, lower(p_name) AS lname,
                   substr(p_type, 1, 5) AS type5,
                   CAST(length(p_brand) AS BIGINT) AS brand_len,
                   concat_ws('-', p_brand, p_type) AS bt,
                   coalesce(nullif(p_type, 'unknown'), 'n/a') AS typ,
                   regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                   abs(p_retailprice - 1000.0) AS dist1000,
                   CAST(greatest(p_size, 25) AS BIGINT) AS gsize,
                   CASE WHEN p_size % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
            FROM part"""))

  val queries: Seq[GQuery] = Seq(
    qScanFilter, qAgg, qGroupbyMax, qAntiJoin, qSemiJoin, qInnerJoin,
    qSortHead, qTail1, qTopPerGroup, qCollect, qBoolOr, qYield, qCut, qSwitch,
    qFuse, qRangeCursor, qOffsetAssign, qDoneMarker, qMapLookup, qStringFuns,
    qWithField, qWindowDay, qSaltedAgg, qScalarFuns)
}
