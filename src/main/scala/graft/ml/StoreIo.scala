package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Tiny driver-side file primitives shared by the persisted stores
  * (MinHashStore, IvfIndex, IvfPqIndex): small marker/manifest reads and
  * the two atomic publication moves their commit protocols rest on.
  * Everything here is metadata scale — one small file per call, never a
  * Spark job.
  */
private[ml] object StoreIo {

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whole small text file, or None when absent. */
  def readSmall(fs: FileSystem, p: HPath): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** Publish a small file at a FRESH path atomically: write a dot-temp
    * sibling, then rename. Readers either see the complete file or no
    * file — never a partial write. The target must not already exist
    * (manifest sequence numbers, per-batch names); use
    * [[replaceSmallAtomic]] to overwrite.
    */
  def publishSmallAtomic(fs: FileSystem, p: HPath, body: String): Unit = {
    val tmp = new HPath(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, p), s"atomic publish failed: $tmp -> $p")
  }

  /** The live-generation successor pointer a streaming sink leaves at a
    * store's ORIGIN path on a generation flip (auto-compaction or
    * maintenance): `Some(newPath)` when flipped, None for a live origin.
    */
  def readSuccessor(fs: FileSystem, path: String): Option[String] =
    readSmall(fs, new HPath(s"$path/_successor")).map(_.trim).filter(_.nonEmpty)

  /** Record `newPath` as `path`'s live successor (atomic replace — a
    * crash leaves either the old pointer or the new one). Sinks write
    * this at the ORIGIN path on every flip, so the chain stays one hop
    * deep in steady state.
    */
  def writeSuccessor(fs: FileSystem, path: String, newPath: String): Unit =
    replaceSmallAtomic(fs, new HPath(s"$path/_successor"), newPath)

  /** Follow the successor chain from `path` to the live generation. */
  def resolveLivePath(spark: SparkSession, path: String): String = {
    var cur = path
    var hops = 0
    while (hops < 1000) {
      readSuccessor(fsOf(spark, cur), cur) match {
        case Some(next) => cur = next; hops += 1
        case None => return cur
      }
    }
    throw new IllegalStateException(
      s"successor chain from $path exceeds 1000 hops (cycle?)")
  }

  /** Overwrite a small file atomically. Local paths go through
    * java.nio ATOMIC_MOVE (rename(2) — the replace itself is atomic, so
    * a crash mid-update leaves either the old or the new content, never
    * neither); non-local Hadoop schemes fall back to delete + rename,
    * which has a small absent-file window — callers on such stores must
    * tolerate a missing marker as "no mark".
    */
  def replaceSmallAtomic(fs: FileSystem, p: HPath, body: String): Unit = {
    val tmp = new HPath(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val moved =
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!moved) {
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p), s"atomic replace failed: $tmp -> $p")
    }
  }
}
