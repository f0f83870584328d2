package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CdcConsumer

/** The changelog's read-side payoff (#11l consumer): a derived grouped
  * aggregate maintained purely from before/after images must equal a
  * full recompute after any multi-batch upsert sequence — bit-identical,
  * because the fold stays decimal. Replays three changelog batches
  * covering inserts, value updates, group MOVES, unchanged rows, NULL
  * values, and partial-column deltas. */
class CdcConsumerSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-spec-cdcc-").toString

  private def agg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("g"))
    .agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,4)")).as("s"))

  test("incremental fold over 3 batches equals full recompute") {
    val w = wh()
    KeyedTable.toSql(
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    // materialize the snapshot to parquet (type-preserving) BEFORE deltas
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(s"$w/derived")

    // batch 0: inserts, incl. one with a NULL value
    KeyedTable.toSql(Seq((5L, "a", Some(5.0)), (6L, "c", None))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    // batch 1: value update + a GROUP MOVE (b → c) + an unchanged row
    KeyedTable.toSql(Seq((1L, "a", 11.5), (3L, "c", 30.0), (2L, "a", 20.0))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    // batch 2: partial-column delta — only v arrives; g keeps its stored
    // value, so images must carry the stored group for both sides
    KeyedTable.toSql(Seq((4L, 44.0), (5L, 5.0)).toDF("k", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)

    val log = KeyedTable.readChangelog(spark, w, "t")
    assert(log.select("batch").distinct().count() == 3)
    val incremental = CdcConsumer.applyGroupedAgg(
        spark.read.parquet(s"$w/derived"), log,
        groupCol = "g", countCol = "n", sumCol = "s", valueCol = "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val recomputed = agg(KeyedTable.readSql(spark, w, "t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(incremental == recomputed,
      s"incremental $incremental != recompute $recomputed")
    // sanity on the expected final shape: a{1,2,5}, b{4}, c{3,6}
    assert(recomputed.map(t => t._1 -> t._2).toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 2L))
  }

  test("a group vacated by moves drops out; a brand-new group appears") {
    val w = wh()
    KeyedTable.toSql(Seq((1L, "solo", 7.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(s"$w/derived")
    KeyedTable.toSql(Seq((1L, "moved", 7.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    val out = CdcConsumer.applyGroupedAgg(spark.read.parquet(s"$w/derived"),
        KeyedTable.readChangelog(spark, w, "t"),
        "g", "n", "s", "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("moved" -> 1L), s"got $out")
  }

  test("a group holding only NULL values folds to sum = NULL, like a recompute") {
    val w = wh()
    KeyedTable.toSql(Seq((1L, "a", Some(10.0))).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    agg(KeyedTable.readSql(spark, w, "t")).write.parquet(s"$w/derived")
    // group 'nul' is first seen via inserts carrying ONLY NULL values;
    // group 'a' also gains a NULL row (non-NULL base sum must survive)
    KeyedTable.toSql(
      Seq[(Long, String, Option[Double])](
        (2L, "nul", None), (3L, "nul", None), (4L, "a", None))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)))).toSet
    val incremental = shape(CdcConsumer.applyGroupedAgg(
      spark.read.parquet(s"$w/derived"),
      KeyedTable.readChangelog(spark, w, "t"), "g", "n", "s", "v"))
    val recomputed = shape(agg(KeyedTable.readSql(spark, w, "t")))
    assert(incremental == recomputed,
      s"incremental $incremental != recompute $recomputed")
    assert(incremental.exists { case (g, n, s) => g == "nul" && n == 2L && s.isEmpty },
      s"all-NULL group must sum to NULL, got $incremental")
  }

  test("nnCol: a non-NULL group emptied of values by updates folds to NULL too") {
    val w = wh()
    KeyedTable.toSql(
      Seq[(Long, String, Option[Double])](
        (1L, "z", Some(3.0)), (2L, "z", Some(4.0)), (3L, "a", Some(1.0)))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    def aggNn(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).as("s"),
        count(col("v")).as("nn"))
    aggNn(KeyedTable.readSql(spark, w, "t")).write.parquet(s"$w/derived")
    // every non-NULL value of group 'z' is UPDATED to NULL: a recompute
    // yields sum = NULL; without a persisted non-null count the fold
    // can only say 0 (documented) — with nnCol it must say NULL
    KeyedTable.toSql(
      Seq[(Long, String, Option[Double])]((1L, "z", None), (2L, "z", None))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("g", "n", "s")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)))).toSet
    val incremental = shape(CdcConsumer.applyGroupedAgg(
      spark.read.parquet(s"$w/derived"),
      KeyedTable.readChangelog(spark, w, "t"), "g", "n", "s", "v",
      nnCol = Some("nn")))
    val recomputed = shape(aggNn(KeyedTable.readSql(spark, w, "t")))
    assert(incremental == recomputed,
      s"incremental $incremental != recompute $recomputed")
    assert(incremental.exists { case (g, n, s) => g == "z" && n == 2L && s.isEmpty },
      s"emptied group must sum to NULL with nnCol, got $incremental")
  }
}
