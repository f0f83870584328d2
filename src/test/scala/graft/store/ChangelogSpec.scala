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

  test("before/after images: inserts NULL-old, updates carry both sides, " +
       "partial-column deltas image the stored value") {
    val w = wh()
    KeyedTable.toSql(
      Seq((1L, "keep", 10.0), (2L, "old", 20.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    // insert k=3; update k=2 (group move + reprice); partial row k=1
    // arrives with only v (g imaged from the store on BOTH sides)
    KeyedTable.toSql(Seq((3L, Some("new"), Some(3.0)), (2L, Some("moved"), Some(22.0)))
        .toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    KeyedTable.toSql(Seq((1L, 11.0)).toDF("k", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    val rows = KeyedTable.readChangelog(spark, w, "t")
      .select("k", "op", "old_g", "new_g", "old_v", "new_v")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(rows(3L) == (("insert", None, Some("new"), None, Some(3.0))))
    assert(rows(2L) == (("update", Some("old"), Some("moved"), Some(20.0), Some(22.0))))
    // partial-column delta: g absent from the incoming frame — the
    // post-image is the STORED group, not NULL
    assert(rows(1L) == (("update", Some("keep"), Some("keep"), Some(10.0), Some(11.0))))
  }

  test("commit protocol: no staging leftovers, batches only for committed upserts") {
    val w = wh()
    KeyedTable.toSql((1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v"),
      w, "t", pk = Seq("k"))
    KeyedTable.toSql(Seq((1L, -1.0)).toDF("k", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    val dir = new java.io.File(s"$w/t")
    val leftovers = dir.listFiles().map(_.getName)
      .filter(_.startsWith(".staging"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(", ")}")
    assert(new java.io.File(s"$w/t/_changelog/batch=0").isDirectory)
    // a FAILED upsert (duplicate PKs in the delta fails validation)
    // leaves no new batch and no staging dir
    intercept[StoreException](
      KeyedTable.toSql(Seq((2L, 1.0), (2L, 2.0)).toDF("k", "v"),
        w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true))
    val after = dir.listFiles().map(_.getName)
    assert(!after.exists(_.startsWith(".staging")),
      "failed upsert left staging dirs")
    assert(!new java.io.File(s"$w/t/_changelog/batch=1").exists(),
      "failed upsert committed a phantom changelog batch")
  }

  test("changelog-enabled delete records one `delete` row per removed row") {
    import org.apache.spark.sql.functions.col
    val w = wh()
    KeyedTable.toSql(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    assert(KeyedTable.delete(spark, w, "t", col("k") <= 2L,
      changelog = true) == 2L)
    val log = KeyedTable.readChangelog(spark, w, "t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("op"),
        r.getAs[String]("old_g"), Option(r.getAs[Any]("new_g")))).toSet
    // pre-images carried, post-images NULL, exactly the removed keys
    assert(log == Set((1L, "delete", "a", None), (2L, "delete", "b", None)),
      s"got $log")
    // the fold debits the vanished rows: derived ≡ recompute
    import spark.implicits._
    val base = Seq(("a", 1L, BigDecimal("10.0000")), ("b", 1L, BigDecimal("20.0000")),
      ("c", 1L, BigDecimal("30.0000"))).toDF("g", "n", "s")
      .select(col("g"), col("n"), col("s").cast("decimal(18,4)").as("s"))
    val out = graft.operators.CdcConsumer.applyGroupedAgg(base,
        KeyedTable.readChangelog(spark, w, "t"), "g", "n", "s", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSet
    assert(out == Set(("c", 1L, 30.0)), s"got $out")
  }

  test("table-property CDC: once a changelog exists, EVERY mutation " +
       "captures it — flag-less append/upsert/delete and SQL DELETE") {
    val w = wh()
    KeyedTable.toSql(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"))
    // first changelog-enabled mutation sets the table property
    KeyedTable.toSql(Seq((3L, "c", 30.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert, changelog = true)
    assert(TableMeta.read(spark, s"$w/t").changelog)
    // a FLAG-LESS append still logs its rows as inserts
    KeyedTable.toSql(Seq((4L, "d", 40.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Append)
    // a FLAG-LESS upsert still logs
    KeyedTable.toSql(Seq((1L, "a", 11.0)).toDF("k", "g", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Upsert)
    // a FLAG-LESS programmatic delete still logs
    assert(KeyedTable.delete(spark, w, "t", col("k") === 2L) == 1L)
    // SQL DELETE (which cannot express the flag at all) still logs
    val cat = "graft_cdcprop"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    try spark.sql(s"DELETE FROM $cat.t WHERE k = 4")
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
    val log = KeyedTable.readChangelog(spark, w, "t")
      .select("batch", "k", "op").collect()
      .map(r => (r.getAs[Long]("batch"), r.getAs[Long]("k"),
        r.getAs[String]("op"))).toSet
    assert(log == Set(
      (0L, 3L, "insert"),   // the enabling upsert
      (1L, 4L, "insert"),   // flag-less append
      (2L, 1L, "update"),   // flag-less upsert
      (3L, 2L, "delete"),   // flag-less delete
      (4L, 4L, "delete")),  // SQL DELETE
      s"got $log")
    // the fold over the WHOLE log reproduces a recompute — no mutation
    // escaped capture, so a derived aggregate never drifts
    val derived = graft.operators.CdcConsumer.applyGroupedAgg(
        Seq(("a", 1L, BigDecimal("10.0000")), ("b", 1L, BigDecimal("20.0000")))
          .toDF("g", "n", "s")
          .select(col("g"), col("n"), col("s").cast("decimal(18,4)").as("s")),
        KeyedTable.readChangelog(spark, w, "t"), "g", "n", "s", "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue))).toSet
    val recomputed = KeyedTable.readSql(spark, w, "t")
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,4)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue))).toSet
    assert(derived == recomputed, s"derived $derived != recompute $recomputed")
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
