package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.TempDirs

/** SQL ALTER TABLE surface (#11ag): ADD COLUMNS / DROP COLUMN lowered
  * onto the store's metadata-only evolutions, everything else refused. */
class SqlAlterSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-sqlalter")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private def withCat[A](body: String => A): A = {
    val cat = s"graft_alterspec${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("ADD COLUMNS is metadata-only; old rows read NULL; writes fill it") {
    val t = "t_alter_add"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    withCat { cat =>
      spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (w DOUBLE, tagc STRING)")
      val after = KeyedTable.readSql(spark, wh, t)
      assert(after.columns.toSeq == Seq("id", "name", "v", "w", "tagc"))
      assert(after.filter(col("w").isNotNull || col("tagc").isNotNull).count() == 0)
      // the evolved column is writable through the normal paths
      spark.sql(s"UPDATE $cat.$t SET w = v * 2.0 WHERE id = 1")
      val got = KeyedTable.readSql(spark, wh, t).select("id", "w").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == Map(1L -> Some(2.0), 2L -> None))
    }
  }

  test("DROP COLUMN tombstones; re-ADD of the name is refused") {
    val t = "t_alter_drop"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      spark.sql(s"ALTER TABLE $cat.$t DROP COLUMN v")
      assert(KeyedTable.readSql(spark, wh, t).columns.toSeq == Seq("id", "name"))
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (v DOUBLE)")
      }
      assert(e.getMessage.contains("dropped"))
      // a FULL rewrite clears the tombstone (same-count rebucket is a
      // no-op and must keep it), then the name is free
      KeyedTable.rebucket(spark, wh, t, newBuckets = 4)
      spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (v DOUBLE)")
      assert(KeyedTable.readSql(spark, wh, t).columns.toSeq
        == Seq("id", "name", "v"))
    }
  }

  test("refused shapes: NOT NULL adds, PK drops and renames, nested " +
      "fields; value-column renames now SUPPORTED (RenameColumnSpec)") {
    val t = "t_alter_refuse"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      val nn = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.$t ADD COLUMNS (x DOUBLE NOT NULL)")
      }
      assert(nn.getMessage.contains("must be nullable"))
      // value-column renames lower onto KeyedTable.renameColumn
      spark.sql(s"ALTER TABLE $cat.$t RENAME COLUMN name TO nm")
      assert(KeyedTable.readSql(spark, wh, t).columns.contains("nm"))
      val rnPk = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.$t RENAME COLUMN id TO k")
      }
      assert(rnPk.getMessage.contains("primary-key"))
      val pk = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.$t DROP COLUMN id")
      }
      assert(pk.getMessage.contains("primary-key"))
    }
  }

  test("SET TBLPROPERTIES('changelog') toggles CDC; SHOW TBLPROPERTIES reads") {
    import spark.implicits._
    val w = TempDirs.tempDir("graft-alter-props")
    KeyedTable.toSql(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"),
      w, "tp", pk = Seq("k"))
    val cat = s"graft_props${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    try {
      val props0 = spark.sql(s"SHOW TBLPROPERTIES $cat.tp")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props0("primary_key") == "k" && props0("changelog") == "false",
        s"got $props0")
      spark.sql(s"ALTER TABLE $cat.tp SET TBLPROPERTIES('changelog'='true')")
      // every later mutation logs a batch — no per-call flag
      KeyedTable.toSql(Seq((2L, 21.0), (3L, 30.0)).toDF("k", "v"),
        w, "tp", pk = Seq("k"), how = WriteMode.Upsert)
      val log = KeyedTable.readChangelog(spark, w, "tp")
        .select(col("k"), col("op")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(log == Set((2L, "update"), (3L, "insert")), s"got $log")
      // UNSET stops the log; existing batches stay readable
      spark.sql(s"ALTER TABLE $cat.tp UNSET TBLPROPERTIES('changelog')")
      KeyedTable.toSql(Seq((4L, 40.0)).toDF("k", "v"),
        w, "tp", pk = Seq("k"), how = WriteMode.Upsert)
      assert(KeyedTable.readChangelog(spark, w, "tp").count() == 2L)
      // non-changelog properties are refused loudly
      intercept[Exception](spark.sql(
        s"ALTER TABLE $cat.tp SET TBLPROPERTIES('buckets'='64')"))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
