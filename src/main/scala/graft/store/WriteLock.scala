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
  * Protocol: `_graft_lock` in the table dir, taken with the one
  * primitive every Hadoop FileSystem makes atomic — create-if-absent
  * (`fs.create(p, overwrite = false)`); the file body records the
  * holder's token, operation, and acquire time. Writers that find the
  * lock held fail fast with the holder's context (no blocking — batch
  * mutators should surface contention, not queue invisibly behind it).
  *
  * Crash recovery: a writer that dies mid-mutation leaves its lock
  * behind (its staging dirs are reclaimed separately by the vacuum). A
  * lock older than `staleMs` is broken and re-acquired — delete-then-
  * create races between two breakers resolve by the create's
  * atomicity (exactly one wins, the loser errors). Release deletes the
  * lock ONLY if it still carries the releaser's token, so a writer
  * that stalled past the TTL and lost a takeover cannot delete the
  * new holder's lock (its own commit may still corrupt the winner's —
  * the TTL must exceed any plausible mutation duration; 15 min default
  * vs seconds-scale mutations).
  */
object WriteLock {

  val FileName = "_graft_lock"

  /** Default stale-lock TTL. Mutations are seconds-scale; anything
    * this old is a crashed writer. */
  val DefaultStaleMs: Long = 15 * 60 * 1000L

  final case class Holder(token: String, op: String, acquiredAtMs: Long)

  /** Runs `body` holding the table's write lock. */
  def withLock[A](spark: SparkSession, tableDir: String, op: String,
                  staleMs: Long = DefaultStaleMs)(body: => A): A = {
    val p = new Path(tableDir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = UUID.randomUUID().toString
    acquire(fs, p, token, op, staleMs, retried = false)
    try body
    finally release(fs, p, token)
  }

  private def acquire(fs: FileSystem, p: Path, token: String, op: String,
                      staleMs: Long, retried: Boolean): Unit = {
    val attempt =
      try {
        // the atomic create-if-absent; parents are created as needed
        val out = fs.create(p, false)
        try out.write(compact(render(JObject(
          "token" -> JString(token) ::
          "op" -> JString(op) ::
          "acquiredAtMs" -> JInt(System.currentTimeMillis()) :: Nil)))
          .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!attempt) {
      val holder = readHolder(fs, p)
      val fresh = holder.exists(h =>
        System.currentTimeMillis() - h.acquiredAtMs <= staleMs)
      if (fresh) {
        val h = holder.get
        throw new StoreException(
          s"table is write-locked by another ${h.op} (token ${h.token}, " +
          s"held ${System.currentTimeMillis() - h.acquiredAtMs} ms); " +
          "concurrent mutation rejected — retry after it finishes, or break " +
          s"a crashed writer's lock by deleting $p")
      }
      if (retried)
        throw new StoreException(
          s"could not acquire write lock $p after breaking a stale lock " +
          "(another writer won the re-acquire race)")
      // stale (or unreadable — a torn write from a crashed writer):
      // break it and retry once; the create above arbitrates the race
      fs.delete(p, false)
      acquire(fs, p, token, op, staleMs, retried = true)
    }
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
