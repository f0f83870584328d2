package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.CdcConsumer

/** #33h streaming changelog consumer — the continuous form of
  * [[CdcConsumer]]: tail a keyed table's `_changelog/` as a FILE STREAM
  * (each upsert's batch directory is one new arrival) and fold every
  * micro-batch of before/after images into a derived grouped aggregate,
  * maintained as a parquet snapshot via an atomic swap.
  *
  * Why this composes safely:
  *  - the fold is ADDITIVE (insert credits; update debits the old image
  *    and credits the new), so it commutes across micro-batch slicing —
  *    file-arrival order inside the stream never changes the result;
  *  - foreachBatch runs micro-batches serially with checkpointed batch
  *    ids, so a restart resumes from the unprocessed changelog files
  *    only — the derived table is brought up to date by |new batches|
  *    worth of work, never a recompute;
  *  - the snapshot swap materializes the NEXT state fully before the
  *    current one is replaced (write-aside + rename), so a crash
  *    mid-batch leaves the old consistent snapshot and an unprocessed
  *    batch id — replay-safe.
  *
  * At 100 TB this is the "derived table follows the base table" loop:
  * upserts pay one delta-sized classification each, and the derived
  * aggregate follows within a trigger without ever scanning the base.
  */
object StreamingCdc {

  /** Start the consumer over `<warehouse>/<table>/_changelog/batch=*`.
    *
    * @param derivedPath parquet snapshot holding the aggregate state
    *                    (groupCol, countCol, sumCol) — must exist (seed
    *                    it with the base aggregate at stream-start
    *                    horizon, or an empty frame for "from scratch")
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val next = new Path(derivedPath + ".next")
        val cur = new Path(derivedPath)
        val fs = cur.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(next, true)
        CdcConsumer.applyGroupedAgg(s.read.parquet(derivedPath), batch,
            groupCol, countCol, sumCol, valueCol)
          .write.parquet(next.toString) // materialized BEFORE the swap
        fs.delete(cur, true)
        if (!fs.rename(next, cur))
          throw new graft.store.StoreException(
            s"cdc snapshot swap failed: $next -> $cur")
        ()
      }
      .start()
  }
}
