package graft

import graft.streaming.{ConnectJsonCodec, MemoryBus, RawStringCodec}
import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the zync command set (`zync <cmd> ...`):
  *
  * {{{
  *   graft.Main etl <lakeRoot> <transform.yaml>
  *   graft.Main etl-plan <lakeRoot> <transform.yaml>
  *   graft.Main ls <lakeRoot>
  *   graft.Main info <lakeRoot> <pool>
  *   graft.Main compact <lakeRoot> <pool>
  *   graft.Main consume-pool <lakeRoot> <pool>     # ZSON to stdout
  * }}}
  *
  * Kafka-backed produce/consume/from-kafka/to-kafka need the Kafka
  * connector jars at runtime; they are exposed via [[Commands]] and wired
  * here once a broker classpath exists.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val spark = GraftSession.local()
    try run(spark, args.toList)
    finally spark.stop()
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Main <etl|etl-plan|ls|info|compact|consume-pool> args...")

  private[graft] def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "etl" :: root :: yamlPath :: Nil =>
      val yaml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))
      val n = Commands.etl(spark, root, yaml)
      println(s"ETL'd $n records")
    case "etl-plan" :: root :: yamlPath :: Nil =>
      val yaml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(yamlPath)))
      println(Commands.etlPlan(spark, root, yaml))
    case "ls" :: root :: Nil =>
      Commands.ls(root).foreach(println)
    case "info" :: root :: pool :: Nil =>
      Commands.info(spark, root, pool).toSeq.sortBy(_._1)
        .foreach { case (k, v) => println(s"$k: $v") }
    case "compact" :: root :: pool :: Nil =>
      val p = graft.lake.Pool.open(spark, root, pool)
      val id = p.compact()
      val removed = p.vacuum()
      println(s"compacted at commit $id, vacuumed $removed files")
    case "consume-pool" :: root :: pool :: Nil =>
      val p = graft.lake.Pool.open(spark, root, pool)
      if (!p.isEmpty)
        graft.zson.Zson.renderAll(p.read().orderBy(p.key)).foreach(println)
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      usage()
      sys.exit(2)
  }
}
