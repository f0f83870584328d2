package graft.store

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.JsonMethods.{compact, render}

/** Cross-writer mutual exclusion for table mutations — the guard a
  * SHARED warehouse needs: two jobs appending to the same table would
  * otherwise interleave their staging swaps and meta writes (each step
  * is individually atomic, but the read-merge-swap sequence is not).
  *
  * Protocol: `_graft_lock` in the table dir, taken with
  * create-if-absent (`fs.create(p, overwrite = false)`); the file body
  * records the holder's token, operation, and acquire time. Writers
  * that find the lock held fail fast with the holder's context (no
  * blocking — batch mutators should surface contention, not queue
  * invisibly behind it).
  *
  * ATOMICITY CAVEAT: create-if-absent is atomic on HDFS and local
  * filesystems (the namenode / kernel arbitrates), which is what this
  * lock's mutual exclusion rests on. Object-store connectors (s3a, gs,
  * abfs, wasb, oss, cos) historically implement it as check-then-put —
  * two racing writers can BOTH "acquire". On those schemes the lock
  * degrades to advisory: acquire logs a loud warning once per scheme,
  * and deployments needing hard exclusion there should front mutations
  * with an external coordinator (or a connector with true conditional
  * writes, e.g. S3 If-None-Match) instead of this file lock.
  *
  * Liveness is the lock file's MODIFICATION TIME, not its content: a
  * holder's daemon heartbeat bumps the mtime (atomic `setTimes` — no
  * torn content for a concurrent reader to misread) every TTL/3, so
  * the stale TTL can stay tight (15 min) while an hours-long mutation
  * — a 100 TB rebucket — stays protected. A lock whose mtime is older
  * than `staleMs` belongs to a crashed writer and is broken; the
  * delete-then-create race between two breakers resolves by the
  * create's atomicity (exactly one wins, the loser errors). An
  * UNREADABLE lock is judged by the same mtime rule — a fresh torn
  * file is a writer mid-write (fail fast), an old one is crashed
  * garbage (break it).
  *
  * Release deletes the lock ONLY if it still carries the releaser's
  * token, so a writer that stalled past the TTL and lost a takeover
  * cannot delete the new holder's lock; its heartbeat likewise stops
  * the moment it observes a foreign token.
  */
object WriteLock {

  val FileName = "_graft_lock"

  /** Default stale-lock TTL — generous against GC pauses and slow
    * filesystems, tiny against operator response time. The heartbeat
    * (TTL/3) keeps arbitrarily long mutations fresh. */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  final case class Holder(token: String, op: String, acquiredAtMs: Long)

  /** Runs `body` holding the table's write lock. */
  def withLock[A](spark: SparkSession, tableDir: String, op: String,
                  staleMs: Long = DefaultStaleMs)(body: => A): A =
    withLockWait(spark, tableDir, op, waitMs = 0L, staleMs)(body)

  /** [[withLock]] that POLLS a held lock for up to `waitMs` before
    * giving up (~250 ms backoff), instead of the default fail-fast.
    * For SHORT critical sections only — the optimistic commit path
    * ([[KeyedTable.appendConcurrent]]) holds the lock for a manifest
    * flip, not a write job, so a contending committer is moments from
    * releasing and queueing briefly beats surfacing a spurious
    * conflict. Long mutations keep fail-fast: invisible queueing
    * behind an hours-long rebucket helps nobody. */
  def withLockWait[A](spark: SparkSession, tableDir: String, op: String,
                      waitMs: Long,
                      staleMs: Long = DefaultStaleMs)(body: => A): A = {
    val p = new Path(tableDir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    warnIfNonAtomicCreate(fs, p)
    val token = UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try {
        acquire(fs, p, token, op, staleMs, retried = false)
        acquired = true
      } catch {
        case e: StoreException
            if waitMs > 0 && System.currentTimeMillis() < deadline &&
               e.getMessage != null &&
               e.getMessage.startsWith("table is write-locked") =>
          Thread.sleep(250L)
      }
    }
    val beat = heartbeat(fs, p, token, staleMs)
    beat.start()
    try body
    finally {
      beat.interrupt()
      release(fs, p, token)
    }
  }

  /** Schemes whose Hadoop connectors implement create-if-absent as
    * check-then-put rather than an atomic primitive (see class doc). */
  private val NonAtomicCreateSchemes =
    Set("s3a", "s3", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos")

  private val warnedSchemes = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def warnIfNonAtomicCreate(fs: FileSystem, p: Path): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    if (NonAtomicCreateSchemes.contains(scheme) && warnedSchemes.add(scheme))
      System.err.println(
        s"[graft] WARNING: filesystem scheme '$scheme' does not guarantee atomic " +
        s"create-if-absent; the write lock at $p is ADVISORY on this storage — " +
        "two racing writers may both acquire it. Use an external coordinator " +
        "for hard mutual exclusion on object stores.")
  }

  private def lockJson(token: String, op: String): String =
    compact(render(JObject(
      "token" -> JString(token) ::
      "op" -> JString(op) ::
      "acquiredAtMs" -> JInt(System.currentTimeMillis()) :: Nil)))

  private def mtimeAge(fs: FileSystem, p: Path): Option[Long] =
    try Some(System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime)
    catch { case _: Exception => None }

  /** Atomic create-if-absent of the lock file with `body` as content;
    * true when WE created it, false on contention.
    *
    * The `file` scheme CANNOT go through `fs.create(p, overwrite =
    * false)`: Hadoop's ChecksumFileSystem/RawLocalFileSystem implement
    * the no-overwrite flag as exists-then-create — two racing writers
    * (e.g. two threads of one driver, or two drivers on a shared NFS
    * mount) can BOTH pass the exists check, both "acquire", and then
    * silently overwrite each other's manifest commits (POSIX rename
    * replaces an existing target without error — the lost-commit shape
    * ConcurrentAppendSpec reproduces). java.io.File.createNewFile is
    * O_CREAT|O_EXCL, kernel-arbitrated — exactly one winner.
    *
    * A failure writing the body (disk full, stream error) deletes the
    * just-created file before rethrowing — our own fresh-but-torn lock
    * must not block every writer (us included) for the full TTL. */
  private def createAtomically(fs: FileSystem, p: Path,
                               body: Array[Byte]): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    if (scheme == "file") {
      val f = new java.io.File(p.toUri.getPath)
      Option(f.getParentFile).foreach(_.mkdirs())
      if (!f.createNewFile()) false
      else {
        // raw write bypasses Hadoop's checksum; a stale `.crc` from an
        // fs.create-written lock (older code) would fail fs.open reads
        new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
        try {
          val out = new java.io.FileOutputStream(f)
          try out.write(body) finally out.close()
        } catch {
          case e: Throwable =>
            try { f.delete(); () } catch { case _: Exception => () }
            throw e
        }
        true
      }
    } else {
      val out =
        try fs.create(p, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => null
          case _: java.nio.file.FileAlreadyExistsException => null
          // some FileSystems surface the lost race as a plain
          // IOException; treat it as contention only when the lock
          // file is actually there, otherwise it is a real FS error
          case _: java.io.IOException if fs.exists(p) => null
        }
      if (out == null) false
      else {
        try {
          try out.write(body)
          finally out.close()
        } catch {
          case e: Throwable =>
            try fs.delete(p, false) catch { case _: Exception => () }
            throw e
        }
        true
      }
    }
  }

  private def acquire(fs: FileSystem, p: Path, token: String, op: String,
                      staleMs: Long, retried: Boolean): Unit = {
    val created =
      createAtomically(fs, p, lockJson(token, op).getBytes("UTF-8"))
    if (!created) {
      // liveness = mtime age (heartbeat-maintained); a vanished file
      // between the failed create and this check counts as fresh
      // contention — retry once rather than guessing
      val fresh = mtimeAge(fs, p).forall(_ <= staleMs)
      if (fresh) {
        val who = readHolder(fs, p)
          .map(h => s"${h.op} (token ${h.token})")
          .getOrElse("a writer mid-write (lock not yet readable)")
        throw new StoreException(
          s"table is write-locked by $who" +
          mtimeAge(fs, p).fold("")(a => s", last heartbeat ${a} ms ago") +
          "; concurrent mutation rejected — retry after it finishes, or " +
          s"break a crashed writer's lock by deleting $p")
      }
      if (retried)
        throw new StoreException(
          s"could not acquire write lock $p after breaking a stale lock " +
          "(another writer won the re-acquire race)")
      // crashed writer: break the lock; the create above arbitrates
      // the race between concurrent breakers
      fs.delete(p, false)
      acquire(fs, p, token, op, staleMs, retried = true)
    }
  }

  /** Daemon thread bumping the lock's mtime every TTL/3 while the
    * mutation runs; stops itself if the lock no longer carries our
    * token (we were broken as stale — don't fight the new holder). */
  private def heartbeat(fs: FileSystem, p: Path, token: String,
                        staleMs: Long): Thread = {
    val t = new Thread(() => {
      val interval = math.max(1000L, staleMs / 3)
      var ours = true
      try {
        while (ours && !Thread.currentThread().isInterrupted) {
          Thread.sleep(interval)
          ours = readHolder(fs, p).exists(_.token == token)
          if (ours) {
            try fs.setTimes(p, System.currentTimeMillis(), -1)
            catch { case _: Exception => () } // next beat retries
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-${p.getName}")
    t.setDaemon(true)
    t
  }

  private def release(fs: FileSystem, p: Path, token: String): Unit = {
    // only delete a lock that is still OURS — after a stale takeover
    // the file carries the new holder's token and must survive
    if (readHolder(fs, p).exists(_.token == token)) fs.delete(p, false)
  }

  /** The current holder, or None when absent/unreadable. */
  def readHolder(fs: FileSystem, p: Path): Option[Holder] =
    try {
      val in = fs.open(p)
      val s = try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, "UTF-8")
      } finally in.close()
      val j = JsonMethods.parse(s)
      (j \ "token", j \ "op", j \ "acquiredAtMs") match {
        case (JString(t), JString(o), JInt(a)) => Some(Holder(t, o, a.toLong))
        case _ => None
      }
    } catch { case _: Exception => None }
}
