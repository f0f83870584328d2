package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, TempDirs}

/** Changelog retention (`expireChangelog` + `CALL
  * graft.system.expire_changelog`): folded batches below a batch/age
  * floor are reaped under the write lock, the floor is persisted
  * BEFORE any delete, later reads/folds at or above the floor are
  * unaffected, and an expired cursor fails loudly toward a re-sync. */
class ChangelogRetentionSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-clexp")

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  /** Surviving batch numbers on disk. */
  private def batchDirs(t: String): Set[Long] = {
    val cl = new Path(KeyedTable.tableDir(wh, t), KeyedTable.ChangelogDir)
    val fs = cl.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(cl).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .toSet
  }

  test("batch-floor expiry reaps a prefix, floor cursor reads on, " +
      "expired cursor fails toward a re-sync") {
    val t = "t_clexp1"
    KeyedTable.toSql(df((1L, "a"), (2L, "b"), (3L, "c")), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    KeyedTable.toSql(df((2L, "B")), wh, t, how = WriteMode.Upsert) // batch 0
    KeyedTable.toSql(df((4L, "d")), wh, t, how = WriteMode.Append) // batch 1
    KeyedTable.toSql(df((3L, "C")), wh, t, how = WriteMode.Upsert) // batch 2
    assert(batchDirs(t) == Set(0L, 1L, 2L))

    // dry run first: exact prediction, zero deletes, no floor
    assert(KeyedTable.expireChangelog(spark, wh, t,
      beforeBatch = Some(2L), dryRun = true) == 2)
    assert(batchDirs(t) == Set(0L, 1L, 2L), "dry run must not delete")
    KeyedTable.readChangelog(spark, wh, t).count(): Unit // no floor yet

    val removed = KeyedTable.expireChangelog(spark, wh, t,
      beforeBatch = Some(2L))
    assert(removed == 2)
    assert(batchDirs(t) == Set(2L), "expired dirs must be gone")

    // at-the-floor cursor: unaffected (the update image of id=3)
    val survived = KeyedTable.readChangelog(spark, wh, t, sinceBatch = 2)
    assert(survived.selectExpr("cast(batch as long)").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L))
    assert(survived.filter("op = 'update'").count() == 1L)

    // below-the-floor cursor: loud failure naming the re-sync path
    val e = intercept[StoreException] {
      KeyedTable.readChangelog(spark, wh, t, sinceBatch = 0)
    }
    assert(e.getMessage.contains("re-sync"), e.getMessage)
    assert(e.getMessage.contains("2"), e.getMessage)

    // idempotent: nothing below the floor remains to expire
    assert(KeyedTable.expireChangelog(spark, wh, t,
      beforeBatch = Some(2L)) == 0)

    // the table itself never notices: data reads stay whole
    assert(KeyedTable.readSql(spark, wh, t).count() == 4L)
  }

  test("the newest batch never expires, however wide the dials") {
    val t = "t_clexp2"
    KeyedTable.toSql(df((1L, "a")), wh, t, pk = Seq("id"))
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    KeyedTable.toSql(df((1L, "A")), wh, t, how = WriteMode.Upsert) // 0
    KeyedTable.toSql(df((2L, "b")), wh, t, how = WriteMode.Append) // 1
    val removed = KeyedTable.expireChangelog(spark, wh, t,
      beforeBatch = Some(Long.MaxValue), olderThanMs = Some(0L))
    assert(removed == 1, "only the non-newest batch may expire")
    assert(batchDirs(t) == Set(1L))
    // the merged read still infers a schema from the surviving batch
    assert(KeyedTable.readChangelog(spark, wh, t, sinceBatch = 1)
      .count() == 1L)
  }

  test("the age gate refuses young batches; both dials compose") {
    val t = "t_clexp3"
    KeyedTable.toSql(df((1L, "a")), wh, t, pk = Seq("id"))
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    KeyedTable.toSql(df((1L, "A")), wh, t, how = WriteMode.Upsert) // 0
    KeyedTable.toSql(df((2L, "b")), wh, t, how = WriteMode.Append) // 1
    // everything is seconds old: a day's age floor admits nothing
    assert(KeyedTable.expireChangelog(spark, wh, t,
      beforeBatch = Some(2L), olderThanMs = Some(24L * 3600 * 1000)) == 0)
    assert(batchDirs(t) == Set(0L, 1L))
    // an undialed call refuses rather than wipe
    val e = intercept[StoreException] {
      KeyedTable.expireChangelog(spark, wh, t)
    }
    assert(e.getMessage.contains("beforeBatch"), e.getMessage)
  }

  test("the age dial judges by FILE mtimes, not the (object-store " +
      "synthetic) directory mtime") {
    val t = "t_clexp5"
    KeyedTable.toSql(df((1L, "a")), wh, t, pk = Seq("id"))
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    KeyedTable.toSql(df((1L, "A")), wh, t, how = WriteMode.Upsert) // 0
    KeyedTable.toSql(df((2L, "b")), wh, t, how = WriteMode.Append) // 1
    KeyedTable.toSql(df((3L, "c")), wh, t, how = WriteMode.Append) // 2
    // simulate S3A-style synthetic directory mtimes: every batch DIR
    // claims to be from 1970 while its files carry real commit times
    val cl = new Path(KeyedTable.tableDir(wh, t), KeyedTable.ChangelogDir)
    val fs = cl.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(cl).filter(_.getPath.getName.startsWith("batch="))
      .foreach(st => fs.setTimes(st.getPath, 1000L, -1))
    // a day's age floor must still admit nothing: the FILES are fresh
    assert(KeyedTable.expireChangelog(spark, wh, t,
      olderThanMs = Some(24L * 3600 * 1000)) == 0)
    assert(batchDirs(t) == Set(0L, 1L, 2L))
  }

  test("CALL graft.system.expire_changelog drives the same primitive") {
    val t = "t_clexp4"
    KeyedTable.toSql(df((1L, "a")), wh, t, pk = Seq("id"))
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    KeyedTable.toSql(df((1L, "A")), wh, t, how = WriteMode.Upsert) // 0
    KeyedTable.toSql(df((2L, "b")), wh, t, how = WriteMode.Append) // 1
    KeyedTable.toSql(df((3L, "c")), wh, t, how = WriteMode.Append) // 2
    val cat = "graft_clexp_cat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val removed = spark.sql(
        s"CALL $cat.system.expire_changelog('$t', before_batch => 2)")
        .collect().head.getInt(0)
      assert(removed == 2)
      assert(batchDirs(t) == Set(2L))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
