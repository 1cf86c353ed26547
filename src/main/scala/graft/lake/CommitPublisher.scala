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
    * (modern S3/GCS/Azure all do); the loser's PUT gets 412. Here a
    * per-process claim index stands in for the store's atomic existence
    * check, and the winner materializes the object with an atomic rename
    * so local readers get the same all-or-nothing visibility a PUT gives
    * store readers. Objects created by earlier processes (or other
    * publishers) count as taken.
    *
    * A production binding replaces [[publish]]'s body with one store PUT
    * carrying the if-none-match header — same signature, same contract.
    */
  final class ConditionalPut extends CommitPublisher {
    import ConditionalPut.claims

    def publish(target: Path, tmp: Path): Boolean = {
      val key = target.toAbsolutePath.toString
      if (Files.exists(target)) { // pre-existing object: name is taken
        claims.putIfAbsent(key, java.lang.Boolean.TRUE)
        return false
      }
      if (claims.putIfAbsent(key, java.lang.Boolean.TRUE) != null) return false
      // we own the name: upload + commit, atomically visible to readers
      val side = target.resolveSibling("." + target.getFileName + ".put")
      Files.copy(tmp, side, StandardCopyOption.REPLACE_EXISTING)
      Files.move(side, target, StandardCopyOption.ATOMIC_MOVE)
      true
    }
  }

  object ConditionalPut {
    /** The stand-in for the store's namespace: one atomic claim per object
      * name, shared by every publisher in this process.
      */
    private val claims =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  }
}
