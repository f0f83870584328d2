package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Change-data-capture on upsert (#11l): each changelog-enabled upsert
  * classifies its delta against the pre-image — insert / update /
  * unchanged, null-safe, partial-column aware — into monotonically
  * numbered batches an incremental consumer reads back with pruning. */
class ChangelogSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-spec-cdc-").toString

  test("ops classify against the pre-image; batches number monotonically") {
    val w = wh()
    val base = (1L to 100L).map(i => (i, s"v$i", i * 1.0)).toDF("k", "v", "x")
    KeyedTable.toSql(base, w, "t", pk = Seq("k"))
    // delta: 50 new keys, 3 changed rows, 2 rows upserted with identical
    // values, 1 value set to null (a change), PLUS k=7 value vs null
    val delta = (
      (101L to 150L).map(i => (i, s"v$i", i * 1.0)) ++            // inserts
      Seq((1L, "CHANGED", 1.0), (2L, "v2", 99.0),                 // updates
          (3L, null.asInstanceOf[String], 3.0)) ++                // null IS a change
      Seq((4L, "v4", 4.0), (5L, "v5", 5.0))                       // unchanged
    ).toDF("k", "v", "x")
    KeyedTable.toSql(delta, w, "t", pk = Seq("k"),
      how = WriteMode.Upsert, changelog = true)
    val log = KeyedTable.readChangelog(spark, w, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(log.size == 55)
    assert((101L to 150L).forall(log(_) == "insert"))
    assert(log(1L) == "update" && log(2L) == "update" && log(3L) == "update")
    assert(log(4L) == "unchanged" && log(5L) == "unchanged")

    // second upsert → batch 1; sinceBatch prunes batch 0
    KeyedTable.toSql(Seq((1L, "AGAIN", 1.0)).toDF("k", "v", "x"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    val batches = KeyedTable.readChangelog(spark, w, "t")
      .select("batch").distinct().as[Long].collect().sorted.toSeq
    assert(batches == Seq(0L, 1L))
    val recent = KeyedTable.readChangelog(spark, w, "t", sinceBatch = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(recent.toSeq == Seq((1L, "update")))
  }

  test("partial-column upsert: absent columns never make a row 'update'") {
    val w = wh()
    KeyedTable.toSql(
      (1L to 10L).map(i => (i, s"v$i", i * 1.0)).toDF("k", "v", "x"),
      w, "t", pk = Seq("k"))
    // only column x arrives: same value for k=1 (unchanged), new for k=2
    KeyedTable.toSql(Seq((1L, 1.0), (2L, -1.0)).toDF("k", "x"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    val log = KeyedTable.readChangelog(spark, w, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(log == Map(1L -> "unchanged", 2L -> "update"))
  }

  test("plain upserts write no changelog; reading one then errors") {
    val w = wh()
    KeyedTable.toSql(Seq((1L, "a")).toDF("k", "v"), w, "t", pk = Seq("k"))
    KeyedTable.toSql(Seq((1L, "b")).toDF("k", "v"), w, "t", pk = Seq("k"),
      how = WriteMode.Upsert)
    intercept[StoreException](KeyedTable.readChangelog(spark, w, "t"))
    // the table itself is unaffected by the missing log
    assert(KeyedTable.readSql(spark, w, "t").collect().head.getString(1) == "b")
  }
}
