package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{KeyedTable, WriteMode}

/** #33h streaming changelog consumer: the derived aggregate follows the
  * base table across changelog-enabled upserts — converging to a full
  * recompute after every drained backlog, and resuming incrementally
  * from the checkpoint when later batches arrive. */
class StreamingCdcSpec extends SparkSpec {

  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("g"))
    .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,4)")).as("s"))

  private def snap(p: String) = StreamingCdc.readDerived(spark, p)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet

  test("derived snapshot converges to recompute; restart consumes only new batches") {
    val root = Files.createTempDirectory("graft-spec-scdc-").toString
    val w = s"$root/wh"
    val derived = s"$root/derived"
    val ckpt = s"$root/ckpt"
    KeyedTable.toSql(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    // seed the snapshot with the base aggregate at stream-start horizon
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(derived)

    // two changelog batches: inserts + a group move
    KeyedTable.toSql(Seq((4L, "c", 4.0), (5L, "a", 5.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((3L, "a", 33.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)

    StreamingCdc.start(spark, w, "t", derived, ckpt,
      "g", "n", "s", "v").awaitTermination()
    assert(snap(derived) ==
      agg(KeyedTable.readSql(spark, w, "t")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet)

    // a later batch: rerun with the SAME checkpoint — only batch 2 folds
    KeyedTable.toSql(Seq((1L, "b", 100.0), (6L, "c", 6.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    StreamingCdc.start(spark, w, "t", derived, ckpt,
      "g", "n", "s", "v").awaitTermination()
    val expected = agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(snap(derived) == expected, s"got ${snap(derived)}, want $expected")
  }

  /** One changelog batch whose files land in SEPARATE micro-batches
    * (maxFilesPerTrigger = 1): the shape where a "max batch id folded"
    * high-water mark over-claims. Returns (warehouse, derived, #files). */
  private def splitBatchFixture(root: String): (String, String, Int) = {
    val w = s"$root/wh"
    val derived = s"$root/derived"
    KeyedTable.toSql(Seq((1L, "a", 10.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(derived)
    // multiple part files in ONE changelog batch: the changes frame
    // keeps its shuffle partitioning when AQE coalescing is off
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      KeyedTable.toSql(
        (2L to 9L).map(i => (i, if (i % 2 == 0) "a" else "b", i * 1.0))
          .toDF("k", "g", "v"),
        w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    } finally spark.conf.set(coalesceKey, saved)
    val nFiles = new java.io.File(s"$w/t/_changelog/batch=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 2,
      s"fixture needs a multi-file changelog batch, got $nFiles file(s)")
    (w, derived, nFiles)
  }

  test("a changelog batch split across epochs survives a crash plus " +
       "checkpoint loss: the unfolded remainder lands, nothing double-counts") {
    val root = Files.createTempDirectory("graft-spec-scdc-").toString
    val (w, derived, _) = splitBatchFixture(root)
    // fold exactly ONE file of batch 0, then crash (after the state
    // commit, before the checkpoint write — the dangerous window)
    intercept[Exception] {
      StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt1",
        "g", "n", "s", "v", maxFilesPerTrigger = Some(1),
        crashAfterEpochs = Some(1)).awaitTermination()
    }
    val partial = snap(derived)
    assert(partial != agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet,
      "crash injection folded everything — the fixture did not split")
    // checkpoint LOST: a rebuilt consumer re-delivers every file. A
    // batch-granular mark would either drop batch 0's remainder (mark
    // advanced) or double-count its folded file (mark not advanced);
    // the file-granular frontier folds exactly the remainder.
    StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt2",
      "g", "n", "s", "v").awaitTermination()
    val expected = agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(snap(derived) == expected,
      s"rebuilt checkpoint diverged: ${snap(derived)} != $expected")
  }

  test("same-checkpoint resume after a mid-backlog crash re-skips the " +
       "committed epoch and folds the rest") {
    val root = Files.createTempDirectory("graft-spec-scdc-").toString
    val (w, derived, _) = splitBatchFixture(root)
    intercept[Exception] {
      StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt",
        "g", "n", "s", "v", maxFilesPerTrigger = Some(1),
        crashAfterEpochs = Some(1)).awaitTermination()
    }
    // SAME checkpoint: the crashed epoch re-delivers (its write never
    // reached the checkpoint), the committed state's epoch guard skips
    // it, and the remaining files fold one epoch at a time
    StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt",
      "g", "n", "s", "v", maxFilesPerTrigger = Some(1)).awaitTermination()
    val expected = agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(snap(derived) == expected,
      s"same-checkpoint resume diverged: ${snap(derived)} != $expected")
  }

  test("replayed epochs are skipped: at-least-once delivery, exactly-once state") {
    val root = Files.createTempDirectory("graft-spec-scdc-").toString
    val w = s"$root/wh"
    val derived = s"$root/derived"
    KeyedTable.toSql(Seq((1L, "a", 10.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(derived)
    KeyedTable.toSql(Seq((2L, "a", 5.0), (3L, "b", 1.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt1",
      "g", "n", "s", "v").awaitTermination()
    val once = snap(derived)
    assert(once == agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet)
    // re-deliver the SAME changelog batches from a REBUILT checkpoint
    // (the lost-checkpoint shape): every batch is already below the
    // snapshot's high-water mark, so the fold must skip them all, not
    // double-count
    StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt2",
      "g", "n", "s", "v").awaitTermination()
    assert(snap(derived) == once,
      s"replayed epoch double-counted: ${snap(derived)} != $once")
    // ...and a batch the lost checkpoint NEVER folded must still land:
    // the guard is data-scoped (changelog batch ids), not
    // checkpoint-scoped (epoch ids) — a fresh checkpoint re-delivers
    // everything and exactly the unfolded suffix applies
    KeyedTable.toSql(Seq((4L, "b", 2.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    StreamingCdc.start(spark, w, "t", derived, s"$root/ckpt3",
      "g", "n", "s", "v").awaitTermination()
    assert(snap(derived) == agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet,
      "fresh checkpoint dropped a never-folded batch")
  }

  test("changelog retention: expiry at-or-below the fold position is " +
       "transparent; expiry past it fails the stream toward a re-seed") {
    val root = Files.createTempDirectory("graft-spec-scdc-").toString
    val w = s"$root/wh"
    val derived = s"$root/derived"
    val ckpt = s"$root/ckpt"
    KeyedTable.toSql(Seq((1L, "a", 10.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(derived)
    // batches 0, 1, 2; fold them all -> hwm = 2
    KeyedTable.toSql(Seq((2L, "a", 2.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((3L, "b", 3.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((4L, "b", 4.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    StreamingCdc.start(spark, w, "t", derived, ckpt,
      "g", "n", "s", "v").awaitTermination()
    // SAFE expiry: everything reaped is already folded (floor 2 <= hwm+1)
    assert(KeyedTable.expireChangelog(spark, w, "t",
      beforeBatch = Some(2L)) == 2)
    // batch 3 lands; the restart folds it on, unbothered by retention
    KeyedTable.toSql(Seq((5L, "c", 5.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    StreamingCdc.start(spark, w, "t", derived, ckpt,
      "g", "n", "s", "v").awaitTermination()
    assert(snap(derived) == agg(KeyedTable.readSql(spark, w, "t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet)
    // UNSAFE expiry: batches 4 and 5 land but expire (floor 6) before
    // the consumer (hwm 3) ever folds them — the file stream would
    // silently never list them, so start() must fail loudly instead
    KeyedTable.toSql(Seq((6L, "c", 6.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((7L, "a", 7.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((8L, "a", 8.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    assert(KeyedTable.expireChangelog(spark, w, "t",
      beforeBatch = Some(6L)) == 4) // reaps 2, 3 (folded) + 4, 5 (never folded)
    val e = intercept[graft.store.StoreException] {
      StreamingCdc.start(spark, w, "t", derived, ckpt,
        "g", "n", "s", "v")
    }
    assert(e.getMessage.contains("re-seed"), e.getMessage)
    assert(e.getMessage.contains("4 .. 5"), e.getMessage)
  }
}
