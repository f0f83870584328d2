package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcConsumer

/** #33h streaming changelog consumer — the continuous form of
  * [[CdcConsumer]]: tail a keyed table's `_changelog/` as a FILE STREAM
  * (each upsert's batch directory is one new arrival) and fold every
  * micro-batch of before/after images into a derived grouped aggregate,
  * maintained as VERSIONED parquet snapshots.
  *
  * Why this composes safely:
  *  - the fold is ADDITIVE (insert credits; update debits the old image
  *    and credits the new), so it commutes across micro-batch slicing —
  *    file-arrival order inside the stream never changes the result;
  *  - snapshots are versioned: the folded state materializes fully at a
  *    temp path and commits by ONE atomic rename to
  *    `<derivedPath>.s<N>` — there is never an instant without a
  *    complete readable snapshot (the caller-seeded `derivedPath` is
  *    state −1);
  *  - each committed state records WHO folded it (a consumer id minted
  *    per checkpoint) at WHICH streaming epoch, plus the changelog
  *    HIGH-WATER MARK (max `batch` id folded). Two replay shapes are
  *    then both exactly-once:
  *     * same checkpoint, crash between state commit and checkpoint
  *       write → the re-delivered epoch is ≤ the committed epoch of the
  *       same consumer → SKIP (no double count);
  *     * checkpoint lost/rebuilt → a NEW consumer id sees the old
  *       state; the full redelivery is filtered to `batch > hwm`, so
  *       already-folded changelog batches drop and batches the lost
  *       checkpoint never folded still land (the guard is data-scoped,
  *       not checkpoint-scoped).
  *  - a crash BEFORE a commit leaves a temp dir the replay overwrites;
  *    superseded states are garbage-collected after each commit,
  *    keeping the immediately-previous one for in-flight readers.
  *
  * Read the current state with [[readDerived]]. At 100 TB this is the
  * "derived table follows the base table" loop: upserts pay one
  * delta-sized classification each, and the derived aggregate follows
  * within a trigger without ever scanning the base.
  */
object StreamingCdc {

  private val MetaFile = "_graft_cdc_meta"

  private final case class StateMeta(consumerId: String, epoch: Long,
                                     hwm: Long)

  private def versionOf(name: String, base: String): Option[Long] =
    if (name.startsWith(base + ".s")) name.stripPrefix(base + ".s").toLongOption
    else None

  /** (stateVersion, path, meta) of the newest committed state; the
    * caller-seeded `derivedPath` itself is version −1 with no meta.
    * One parent-dir listing. */
  private def currentState(fs: FileSystem,
                           derivedPath: String): (Long, String, Option[StateMeta]) = {
    val p = new Path(derivedPath)
    val base = p.getName
    val versions = fs.listStatus(p.getParent).toSeq
      .filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath.getName, base)
        .map(_ -> st.getPath.toString))
    if (versions.isEmpty) (-1L, derivedPath, None)
    else {
      val (v, dir) = versions.maxBy(_._1)
      (v, dir, readMeta(fs, new Path(dir, MetaFile)))
    }
  }

  private def readMeta(fs: FileSystem, p: Path): Option[StateMeta] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, UTF_8).split("\n") match {
          case Array(cid, e, h) => Some(StateMeta(cid, e.toLong, h.toLong))
          case _ => None
        }
      } finally in.close()
    }

  private def writeMeta(fs: FileSystem, p: Path, m: StateMeta): Unit = {
    val out = fs.create(p, true)
    try out.write(s"${m.consumerId}\n${m.epoch}\n${m.hwm}".getBytes(UTF_8))
    finally out.close()
  }

  /** One id per CHECKPOINT, minted on first use and persisted inside
    * it — how a committed state knows whether a re-delivered epoch id
    * is its own (skip) or a rebuilt checkpoint's (filter by hwm). */
  private def consumerIdOf(fs: FileSystem, checkpoint: String): String = {
    val p = new Path(checkpoint, "_graft_consumer_id")
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        new String(bytes, UTF_8).trim
      } finally in.close()
    } else {
      val id = UUID.randomUUID().toString
      fs.mkdirs(new Path(checkpoint))
      val out = fs.create(p, false)
      try out.write(id.getBytes(UTF_8)) finally out.close()
      id
    }
  }

  /** The derived aggregate's current snapshot (seed or newest committed
    * state) — the read side of the consumer. */
  def readDerived(spark: SparkSession, derivedPath: String): DataFrame = {
    val fs = new Path(derivedPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(currentState(fs, derivedPath)._2)
  }

  /** Start the consumer over `<warehouse>/<table>/_changelog/batch=*`.
    *
    * @param derivedPath seed snapshot holding the aggregate state
    *                    (groupCol, countCol, sumCol) — must exist (seed
    *                    it with the base aggregate at stream-start
    *                    horizon, or an empty frame for "from scratch");
    *                    folded states commit as `<derivedPath>.s<N>`
    *                    siblings, resolved by [[readDerived]]
    * @return a query running with Trigger.AvailableNow (drains the
    *         changelog backlog and stops; rerun with the same
    *         checkpoint to consume later batches incrementally) */
  def start(spark: SparkSession, warehouse: String, table: String,
            derivedPath: String, checkpoint: String,
            groupCol: String, countCol: String, sumCol: String,
            valueCol: String): StreamingQuery = {
    val clRoot = s"$warehouse/$table/${graft.store.KeyedTable.ChangelogDir}"
    val clGlob = s"$clRoot/batch=*"
    // schema from the committed batches, WITH the `batch` partition
    // value — the high-water mark is the max batch id folded. basePath
    // keeps the partition column visible despite the glob consuming
    // the partition directories.
    val sch = spark.read.option("mergeSchema", "true")
      .option("basePath", clRoot).parquet(clGlob).schema
    spark.readStream.schema(sch).option("mergeSchema", "true")
      .option("basePath", clRoot).parquet(clGlob)
      .writeStream
      .queryName(s"graft-cdc-$table")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val fs = new Path(derivedPath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val consumerId = consumerIdOf(fs, checkpoint)
        val (curVer, curDir, curMeta) = currentState(fs, derivedPath)
        val sameConsumer = curMeta.exists(_.consumerId == consumerId)
        if (sameConsumer && curMeta.exists(_.epoch >= epochId)) {
          // this epoch's state already committed — the crash landed
          // between the commit and the checkpoint write; folding again
          // would double-count, so the replay is a no-op
          ()
        } else {
          val curHwm = curMeta.map(_.hwm).getOrElse(-1L)
          // a REBUILT checkpoint re-delivers everything: drop changelog
          // batches the surviving state already folded (data-scoped
          // guard); under the original checkpoint nothing is filtered —
          // Spark's own file tracking guarantees no re-delivery there,
          // so a changelog batch split across micro-batches stays whole
          val rows = if (sameConsumer) batch
                     else batch.filter(col("batch") > curHwm)
          // batch is a partition-dir value — cast pins the accessor type
          val head = rows.agg(max(col("batch").cast("long")), count(lit(1))).head()
          if (head.getLong(1) == 0L) () // nothing unfolded arrived
          else {
            val newHwm = math.max(curHwm, head.getLong(0))
            val newVer = curVer + 1
            val tmp = new Path(s"$derivedPath.tmp-$newVer")
            val committed = new Path(s"$derivedPath.s$newVer")
            fs.delete(tmp, true) // partial output of a crashed attempt
            CdcConsumer.applyGroupedAgg(s.read.parquet(curDir), rows,
                groupCol, countCol, sumCol, valueCol)
              .write.parquet(tmp.toString) // materialized BEFORE commit
            writeMeta(fs, new Path(tmp, MetaFile),
              StateMeta(consumerId, epochId, newHwm))
            if (!fs.rename(tmp, committed))
              throw new graft.store.StoreException(
                s"cdc snapshot commit failed: $tmp -> $committed")
            // GC superseded states, keeping the immediately-previous
            // one for readers that resolved just before this commit
            val base = new Path(derivedPath).getName
            fs.listStatus(new Path(derivedPath).getParent).foreach { st =>
              versionOf(st.getPath.getName, base).foreach { v =>
                if (v < curVer) fs.delete(st.getPath, true)
              }
            }
          }
        }
        ()
      }
      .start()
  }
}
