package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}

/** The one primitive the pool's multi-writer commit protocol rests on:
  * atomically make `target` exist with prepared content IFF it does not
  * already exist — create-if-absent, a CAS on object existence. Everything
  * else in the protocol (nonce'd data file names, loser-retries-next-seq,
  * compact-aborts-on-conflict) composes on top of this single call.
  *
  * Two implementations:
  *  - [[CommitPublisher.HardLink]] — POSIX filesystems, the default.
  *  - [[CommitPublisher.ConditionalPut]] — the object-store shape
  *    (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`, Azure
  *    `If-None-Match: *`), simulated locally; the ROADMAP seam for lakes
  *    on stores without hard links.
  */
trait CommitPublisher {
  /** Publish `tmp`'s bytes at `target` iff `target` does not exist.
    *
    * @param target final manifest path (the sequence-numbered name being
    *               claimed)
    * @param tmp    fully written temp file in the same directory
    * @return true — this writer created `target`; false — the name was
    *         already taken (another writer won this sequence number; the
    *         caller retries at the next one or aborts)
    */
  def publish(target: Path, tmp: Path): Boolean
}

object CommitPublisher {

  /** Create-exclusive hard link: POSIX `link(2)` fails with EEXIST rather
    * than replacing, which is exactly the CAS (a plain rename silently
    * REPLACES and would drop the losing writer's commit).
    */
  object HardLink extends CommitPublisher {
    def publish(target: Path, tmp: Path): Boolean =
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** Conditional-PUT semantics, locally simulated. A real object store
    * arbitrates create-if-absent server-side and strongly consistently
    * (modern S3/GCS/Azure all do); the loser's PUT gets 412. The local
    * simulation models the two halves of that PUT separately:
    *
    *  1. "upload" — the body is staged under a writer-unique side name
    *     (pid + per-process counter, so concurrent writers in different
    *     OS processes never clobber each other's staging), then
    *  2. "conditional commit" — `link(2)` onto the final name, which the
    *     KERNEL arbitrates: it fails with EEXIST instead of replacing, so
    *     exactly one writer — across threads AND across OS processes —
    *     wins each name, and readers see the object all-or-nothing.
    *
    * No process-local claim index is involved (an earlier version kept
    * one, which was only atomic within a single JVM and grew without
    * bound); the filesystem namespace IS the arbiter, exactly as the
    * store's namespace is in production. A production binding replaces
    * [[publish]]'s body with one store PUT carrying the if-none-match
    * header — same signature, same contract.
    */
  final class ConditionalPut extends CommitPublisher {
    def publish(target: Path, tmp: Path): Boolean = {
      // Fast path: a pre-existing object 412s before any upload.
      if (Files.exists(target)) return false
      val side = target.resolveSibling(
        s".${target.getFileName}.${ProcessHandle.current.pid}-" +
          s"${ConditionalPut.staged.getAndIncrement()}.put")
      Files.copy(tmp, side, StandardCopyOption.REPLACE_EXISTING)
      try { Files.createLink(target, side); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(side)
    }
  }

  object ConditionalPut {
    /** Staging-name disambiguator within one process (pid covers across). */
    private val staged = new java.util.concurrent.atomic.AtomicLong(0L)
  }
}
