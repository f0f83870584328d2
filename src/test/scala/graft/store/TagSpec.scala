package graft.store

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.TempDirs

/** Snapshot tags (#11ab): a tag pins a version under a stable name,
  * survives vacuum until dropped, and resolves through readSql(asOfTag)
  * and SQL `VERSION AS OF '<name>'`. */
class TagSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-tag")

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
    (4L, "d", 4.0))

  private def values(d: DataFrame): Set[(Long, String, Double)] =
    d.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("a tagged snapshot survives vacuum(0) and reads back exactly") {
    val t = "t_tag"
    KeyedTable.toSql(df(base: _*), wh, t, pk = Seq("id"), buckets = 4) // v0
    val v = KeyedTable.tagSnapshot(spark, wh, t, "baseline")
    assert(v == 0L)
    KeyedTable.toSql(df((2L, "B", 20.0), (5L, "e", 5.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Upsert) // v1 supersedes bucket files
    assert(KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L) >= 0)
    // v0 still resolves — manifest kept, files kept via union-liveness
    val old = KeyedTable.readSql(spark, wh, t, asOfTag = Some("baseline"))
    assert(values(old) == base.toSet)
    // current state unaffected
    val cur = KeyedTable.readSql(spark, wh, t)
    assert(values(cur) == Set((1L, "a", 1.0), (2L, "B", 20.0),
      (3L, "c", 3.0), (4L, "d", 4.0), (5L, "e", 5.0)))
    // tags listing
    val tl = KeyedTable.tags(spark, wh, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tl == Seq(("baseline", 0L)))
  }

  test("SQL VERSION AS OF resolves a tag name") {
    val t = "t_tag_sql"
    KeyedTable.toSql(df(base: _*), wh, t, pk = Seq("id"), buckets = 4)
    KeyedTable.tagSnapshot(spark, wh, t, "cut_v1")
    KeyedTable.delete(spark, wh, t,
      org.apache.spark.sql.functions.col("id") > 2L)
    val cat = "graft_tagspec"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val tagged = spark.sql(
        s"SELECT id, name, v FROM $cat.$t VERSION AS OF 'cut_v1'")
      assert(values(tagged) == base.toSet)
      val cur = spark.sql(s"SELECT id, name, v FROM $cat.$t")
      assert(values(cur) == base.take(2).toSet)
      // numeric version still works alongside tags
      val v0 = spark.sql(s"SELECT id, name, v FROM $cat.$t VERSION AS OF 0")
      assert(values(v0) == base.toSet)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("dropTag releases the snapshot to the next vacuum") {
    val t = "t_tag_drop"
    KeyedTable.toSql(df(base: _*), wh, t, pk = Seq("id"), buckets = 4) // v0
    KeyedTable.tagSnapshot(spark, wh, t, "temp")
    KeyedTable.toSql(df((1L, "A", 10.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Upsert) // v1
    assert(KeyedTable.dropTag(spark, wh, t, "temp"))
    assert(!KeyedTable.dropTag(spark, wh, t, "temp")) // idempotent-false
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    val e = intercept[StoreException] {
      KeyedTable.readSql(spark, wh, t, asOfVersion = Some(0L)).collect()
    }
    assert(e.getMessage.contains("no manifest version 0"))
    intercept[StoreException] {
      KeyedTable.readSql(spark, wh, t, asOfTag = Some("temp")).collect()
    }
  }

  test("tag validation: duplicates, numeric names, unknown versions") {
    val t = "t_tag_valid"
    KeyedTable.toSql(df(base: _*), wh, t, pk = Seq("id"), buckets = 4)
    KeyedTable.tagSnapshot(spark, wh, t, "x")
    val dup = intercept[StoreException] {
      KeyedTable.tagSnapshot(spark, wh, t, "x")
    }
    assert(dup.getMessage.contains("already exists"))
    val num = intercept[StoreException] {
      KeyedTable.tagSnapshot(spark, wh, t, "42")
    }
    assert(num.getMessage.contains("shadow"))
    val missing = intercept[StoreException] {
      KeyedTable.tagSnapshot(spark, wh, t, "y", version = Some(99L))
    }
    assert(missing.getMessage.contains("cannot tag version 99"))
    val unknown = intercept[StoreException] {
      KeyedTable.readSql(spark, wh, t, asOfTag = Some("nope")).collect()
    }
    assert(unknown.getMessage.contains("no snapshot tag 'nope'"))
    assert(unknown.getMessage.contains("x")) // names what exists
  }
}
