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
