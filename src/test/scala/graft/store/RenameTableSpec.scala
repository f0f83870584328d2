package graft.store

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.TempDirs

/** Table rename (#11ak): one directory rename under the write lock —
  * metadata-only at any scale — plus the manifest-cache invalidation
  * that makes recycled table names (drop/rename + recreate) safe
  * within one driver JVM. */
class RenameTableSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-rename")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  test("programmatic rename: data, meta, manifests, tags all travel") {
    KeyedTable.toSql(df((1L, "a"), (2L, "b")), wh, "rt_src", pk = Seq("id"))
    KeyedTable.tagSnapshot(spark, wh, "rt_src", "cut")
    KeyedTable.toSql(df((3L, "c")), wh, "rt_src",
      pk = Seq("id"), how = WriteMode.Append)
    Catalog.renameTable(spark, wh, "rt_src", "rt_dst")
    assert(!Catalog.hasTable(spark, wh, "rt_src"))
    val rows = KeyedTable.readSql(spark, wh, "rt_dst")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(1L, 2L, 3L))
    // history and tags are intact under the new name
    assert(KeyedTable.history(spark, wh, "rt_dst").count() == 2L)
    assert(KeyedTable.readSql(spark, wh, "rt_dst",
      asOfTag = Some("cut")).count() == 2L)
    // no lock file left behind in the renamed dir
    val lock = new org.apache.hadoop.fs.Path(
      KeyedTable.tableDir(wh, "rt_dst"), WriteLock.FileName)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(lock), "carried lock file must be removed")
    // writes under the new name work (the lock cycle is clean)
    KeyedTable.toSql(df((4L, "d")), wh, "rt_dst",
      pk = Seq("id"), how = WriteMode.Append)
    assert(KeyedTable.readSql(spark, wh, "rt_dst").count() == 4L)
  }

  test("rename guards: missing source, existing target, bad name") {
    KeyedTable.toSql(df((1L, "a")), wh, "rt_g1", pk = Seq("id"))
    KeyedTable.toSql(df((1L, "a")), wh, "rt_g2", pk = Seq("id"))
    intercept[StoreException](
      Catalog.renameTable(spark, wh, "rt_nope", "rt_x"))
    intercept[StoreException](
      Catalog.renameTable(spark, wh, "rt_g1", "rt_g2"))
    intercept[StoreException](
      Catalog.renameTable(spark, wh, "rt_g1", "Bad Name!"))
    // failures leave both tables whole
    assert(KeyedTable.readSql(spark, wh, "rt_g1").count() == 1L)
    assert(KeyedTable.readSql(spark, wh, "rt_g2").count() == 1L)
  }

  test("SQL ALTER TABLE ... RENAME TO through the catalog") {
    val cat = s"graft_ren${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      KeyedTable.toSql(df((1L, "a"), (2L, "b")), wh, "rt_sql", pk = Seq("id"))
      spark.sql(s"ALTER TABLE $cat.rt_sql RENAME TO rt_sql2")
      assert(spark.sql(s"SELECT * FROM $cat.rt_sql2").count() == 2L)
      intercept[Exception](spark.sql(s"SELECT * FROM $cat.rt_sql").collect())
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("drop + same-name recreate never serves the old table's manifest") {
    KeyedTable.toSql(df((1L, "old"), (2L, "old")), wh, "rt_cycle",
      pk = Seq("id"))
    // populate the parsed-manifest cache for v0 under this path
    assert(KeyedTable.readSql(spark, wh, "rt_cycle").count() == 2L)
    Catalog.dropTable(spark, wh, "rt_cycle")
    KeyedTable.toSql(df((10L, "new"), (11L, "new"), (12L, "new")),
      wh, "rt_cycle", pk = Seq("id"))
    // the recreate re-mints v0 at the IDENTICAL manifest path: a stale
    // cache hit would resolve to the old (deleted) files
    val rows = KeyedTable.readSql(spark, wh, "rt_cycle")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(10L, 11L, 12L), s"got $rows")
  }

  test("rename + same-name recreate never serves the old table's manifest") {
    KeyedTable.toSql(df((1L, "old")), wh, "rt_cycle2", pk = Seq("id"))
    assert(KeyedTable.readSql(spark, wh, "rt_cycle2").count() == 1L)
    Catalog.renameTable(spark, wh, "rt_cycle2", "rt_cycle2_moved")
    KeyedTable.toSql(df((20L, "new"), (21L, "new")), wh, "rt_cycle2",
      pk = Seq("id"))
    val rows = KeyedTable.readSql(spark, wh, "rt_cycle2")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(20L, 21L), s"got $rows")
    // and the moved table still reads its own data
    assert(KeyedTable.readSql(spark, wh, "rt_cycle2_moved")
      .select("id").head().getLong(0) == 1L)
  }
}
