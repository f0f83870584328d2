package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - snapshots are versioned BY STREAMING EPOCH: the folded state for
  *    epoch N materializes fully at a temp path and commits by ONE
  *    atomic rename to `<derivedPath>.v<N>`; the current state is the
  *    highest committed version (the seed at `derivedPath` when none) —
  *    there is never an instant without a complete readable snapshot;
  *  - the committed version doubles as the REPLAY GUARD: Spark
  *    checkpoints the batch id only after foreachBatch returns, so a
  *    crash after the snapshot commit re-delivers the same epoch on
  *    restart — the fold sees `.v<N>` already committed and SKIPS,
  *    instead of double-counting the deltas (at-least-once delivery,
  *    exactly-once state);
  *  - a crash BEFORE the commit leaves a stale temp dir the replay
  *    overwrites; superseded versions are garbage-collected after each
  *    commit, keeping one previous version for in-flight readers.
  *
  * Read the current state with [[readDerived]]. At 100 TB this is the
  * "derived table follows the base table" loop: upserts pay one
  * delta-sized classification each, and the derived aggregate follows
  * within a trigger without ever scanning the base.
  */
object StreamingCdc {

  private def versionOf(name: String, base: String): Option[Long] =
    if (name.startsWith(base + ".v")) name.stripPrefix(base + ".v").toLongOption
    else None

  /** (epoch, path) of the newest committed snapshot; the caller-seeded
    * `derivedPath` itself acts as epoch −1. One parent-dir listing. */
  private def currentState(fs: FileSystem, derivedPath: String): (Long, String) = {
    val p = new Path(derivedPath)
    val base = p.getName
    val versions = fs.listStatus(p.getParent).toSeq
      .filter(_.isDirectory)
      .flatMap(st => versionOf(st.getPath.getName, base)
        .map(_ -> st.getPath.toString))
    if (versions.isEmpty) (-1L, derivedPath)
    else versions.maxBy(_._1)
  }

  /** The derived aggregate's current snapshot (seed or newest committed
    * version) — the read side of the consumer. */
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
    *                    folded states commit as `<derivedPath>.v<N>`
    *                    siblings, resolved by [[readDerived]]
    * @return a query running with Trigger.AvailableNow (drains the
    *         changelog backlog and stops; rerun with the same
    *         checkpoint to consume later batches incrementally) */
  def start(spark: SparkSession, warehouse: String, table: String,
            derivedPath: String, checkpoint: String,
            groupCol: String, countCol: String, sumCol: String,
            valueCol: String): StreamingQuery = {
    val clGlob = s"$warehouse/$table/${graft.store.KeyedTable.ChangelogDir}/batch=*"
    // schema from one committed batch (data columns only — the batch
    // partition value is irrelevant to an additive fold)
    val sch = spark.read.parquet(clGlob).schema
    spark.readStream.schema(sch).parquet(clGlob)
      .writeStream
      .queryName(s"graft-cdc-$table")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val s = batch.sparkSession
        val fs = new Path(derivedPath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val (curEpoch, curDir) = currentState(fs, derivedPath)
        if (curEpoch >= epochId) {
          // this epoch's snapshot already committed — the crash landed
          // between the commit and the checkpoint write; folding again
          // would double-count, so the replay is a no-op
          ()
        } else {
          val tmp = new Path(s"$derivedPath.tmp-$epochId")
          val committed = new Path(s"$derivedPath.v$epochId")
          fs.delete(tmp, true) // partial output of a crashed attempt
          CdcConsumer.applyGroupedAgg(s.read.parquet(curDir), batch,
              groupCol, countCol, sumCol, valueCol)
            .write.parquet(tmp.toString) // materialized BEFORE the commit
          if (!fs.rename(tmp, committed))
            throw new graft.store.StoreException(
              s"cdc snapshot commit failed: $tmp -> $committed")
          // GC superseded versions, keeping the immediately-previous one
          // for readers that resolved just before this commit
          val base = new Path(derivedPath).getName
          fs.listStatus(new Path(derivedPath).getParent).foreach { st =>
            versionOf(st.getPath.getName, base).foreach { v =>
              if (v < curEpoch) fs.delete(st.getPath, true)
            }
          }
        }
        ()
      }
      .start()
  }
}
