package graft.store

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local filesystem that MODELS object-store commit semantics — the
  * storage tier where the write lock's create-if-absent and the
  * manifest flip's rename are historically CHECK-THEN-ACT:
  *
  *  - `create(p, overwrite = false)` is exists-then-create: the check
  *    and the create are separate steps, with an injectable hook in
  *    between so a spec can line two racers up PAST the check
  *    deterministically — both "win", last body standing.
  *  - `rename(src, dst)` silently REPLACES an existing destination
  *    (copy-object + delete semantics) — the lost-commit shape.
  *  - [[AtomicCommit.putIfAbsent]] is a TRUE conditional write
  *    (JVM-arbitrated — the stand-in for S3 If-None-Match / GCS
  *    generation preconditions), which is what the `conditional`
  *    [[CommitArbiter]] discovers and uses.
  *
  * Registered under `racy://` by [[CommitArbiterSpec]] to prove
  * exactly-one-winner commits on storage whose native primitives are
  * non-atomic. */
class RacyFileSystem extends RawLocalFileSystem with AtomicCommit {
  override def getScheme: String = "racy"
  override def getUri: URI = URI.create("racy:///")

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      if (exists(p))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
      RacyFileSystem.afterExistsCheck(p.toString)
    }
    // force overwrite underneath: the no-overwrite flag was "checked"
    // above — exactly how a check-then-put connector behaves
    super.create(p, permission, true, bufferSize, replication, blockSize,
      progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false) // silent replace, never an error
    super.rename(src, dst)
  }

  override def putIfAbsent(path: Path, body: Array[Byte]): Boolean =
    RacyFileSystem.casLock.synchronized {
      if (exists(path)) false
      else {
        val out = super.create(path, true)
        try out.write(body) finally out.close()
        true
      }
    }
}

object RacyFileSystem {
  /** In-JVM arbitration for [[AtomicCommit.putIfAbsent]] — all racers
    * in a spec share one cached FileSystem instance, so a JVM monitor
    * IS a true conditional-write primitive here. */
  val casLock = new Object

  /** Fires between the exists-check and the create when
    * `overwrite = false` — a spec parks the first racer here until the
    * second has also passed the check. */
  @volatile var afterExistsCheck: String => Unit = _ => ()

  def withHook[A](hook: String => Unit)(body: => A): A = {
    afterExistsCheck = hook
    try body finally afterExistsCheck = _ => ()
  }
}
