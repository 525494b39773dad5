package graft.sources

import java.nio.file.{Files, Path}

/** Atomic exclusive publication of a fully-written staging file as a
  * version/instant claim file (the optimistic-concurrency primitive the
  * Delta/Hudi/Iceberg writers share).
  *
  * `Files.move(tmp, target)` without options is NOT that primitive: the
  * JDK implements "fail if target exists" as a stat-then-rename, and
  * POSIX rename(2) silently REPLACES an existing target — so two racing
  * writers can both pass the exists check, both rename, and both believe
  * they own the version while one commit's content is silently lost
  * (observed as two appenders returning the same Delta version, one of
  * them vanished from the log). `link(2)` is the correct claim: creating
  * a hard link fails with EEXIST atomically in the filesystem, so exactly
  * one racer wins, and readers only ever observe the complete file.
  */
object AtomicClaim {

  /** Publish `tmp` (already fully written) as `target`.
    *
    * Success: `target` exists with tmp's content and `tmp` is gone.
    * Lost race: throws [[java.nio.file.FileAlreadyExistsException]] and
    * `tmp` is left in place for the caller's retry/cleanup path.
    * Filesystems without hard links fall back to the weaker exclusive
    * move (same semantics, minus the TOCTOU guarantee). */
  def publish(tmp: Path, target: Path): Unit = {
    try Files.createLink(target, tmp)
    catch {
      // FileAlreadyExistsException IS the lost-race signal — propagate.
      // Everything else that means "this filesystem can't hard-link"
      // degrades to the exclusive move: the JDK throws UOE on providers
      // without link support, but Linux filesystems that reject link(2)
      // at runtime (vfat EPERM, some network mounts EACCES) surface as
      // FileSystemException instead.
      case e: java.nio.file.FileAlreadyExistsException => throw e
      case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
        Files.move(tmp, target) // consumed tmp on success; EEXIST propagates
        return
    }
    Files.delete(tmp)
  }
}
