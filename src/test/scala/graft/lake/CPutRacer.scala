package graft.lake

import java.nio.file.{Files, Paths}

/** Child-process half of the cross-process conditional-PUT contention test
  * (CommitPublisherSpec spawns two of these as separate OS processes).
  *
  * Protocol: spin until `<dir>/go` exists (the parent's start barrier so
  * both processes race for real), then for each sequence number attempt to
  * publish `<dir>/seq-NNNNN` with body `writer-<id>-<seq>` and print one
  * `WIN <seq>` line per name won. The parent asserts exactly one winner
  * per name across both processes and that the on-disk body is the
  * winner's.
  */
object CPutRacer {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    val id = args(1)
    val count = args(2).toInt
    // optional 4th arg: base URL of a conditional-write endpoint → race
    // through the HTTP binding instead of the filesystem simulation
    val pub: CommitPublisher =
      if (args.length > 3) new HttpConditionalPut(java.net.URI.create(args(3)))
      else new CommitPublisher.ConditionalPut
    val go = dir.resolve("go")
    Files.write(dir.resolve(s"ready-$id"), Array.emptyByteArray)
    // Must be >= the parent's readiness window (180s on a loaded box): if
    // the OTHER racer JVM is slow to start, this one idles here waiting for
    // the go file — timing out earlier than the parent does would turn a
    // slow start into a hard raceUntilContended failure.
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (!Files.exists(go)) {
      if (System.nanoTime() > deadline) sys.error("no go file within 180s")
      Thread.onSpinWait()
    }
    for (seq <- 0 until count) {
      val tmp = dir.resolve(s".stage-$id-$seq")
      Files.write(tmp, s"writer-$id-$seq".getBytes)
      if (pub.publish(dir.resolve(f"seq-$seq%05d"), tmp)) println(s"WIN $seq")
      Files.deleteIfExists(tmp)
    }
  }
}
