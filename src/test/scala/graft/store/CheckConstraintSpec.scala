package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.TempDirs

/** CHECK constraints (#11ai): named SQL predicates enforced atomically
  * on every write path, SQL NULL-passes semantics, registration
  * validates existing data. */
class CheckConstraintSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-check")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private def values(d: DataFrame): Set[(Long, String, Double)] =
    d.select("id", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("every write path rejects violating rows atomically; NULL passes") {
    val t = "t_check"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.addCheckConstraint(spark, wh, t, "v_pos", "v >= 0")
    // append: one bad row rejects the WHOLE batch, table unchanged
    val e1 = intercept[StoreException] {
      KeyedTable.toSql(df((3L, "c", 3.0), (4L, "d", -4.0)), wh, t,
        pk = Seq("id"), how = WriteMode.Append)
    }
    assert(e1.getMessage.contains("v_pos") && e1.getMessage.contains("1 row"))
    assert(values(KeyedTable.readSql(spark, wh, t))
      == Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // upsert: same contract
    intercept[StoreException] {
      KeyedTable.toSql(df((1L, "a", -1.0)), wh, t,
        pk = Seq("id"), how = WriteMode.Upsert)
    }
    // update: the POST-image is what the check sees
    intercept[StoreException] {
      KeyedTable.update(spark, wh, t, col("id") === 1L,
        Map("v" -> (col("v") - 100.0)))
    }
    assert(values(KeyedTable.readSql(spark, wh, t))
      == Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // appendConcurrent enforces too
    intercept[StoreException] {
      KeyedTable.appendConcurrent(df((9L, "z", -9.0)), wh, t)
    }
    // NULL passes (ANSI CHECK): a NULL v is not a provable violation
    import spark.implicits._
    val withNull = Seq((5L, "e", None: Option[Double]))
      .toDF("id", "name", "v")
    KeyedTable.toSql(withNull, wh, t, pk = Seq("id"), how = WriteMode.Append)
    assert(KeyedTable.readSql(spark, wh, t).count() == 3)
    // valid writes proceed
    KeyedTable.toSql(df((6L, "f", 6.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    assert(KeyedTable.readSql(spark, wh, t).count() == 4)
  }

  test("merge: tombstone deletes are exempt, written images are checked") {
    val t = "t_check_merge"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.addCheckConstraint(spark, wh, t, "v_pos", "v >= 0")
    // a delete-tombstone for id=1 plus a valid insert: fine even though
    // the tombstone row itself carries no meaningful v
    import spark.implicits._
    val feed = Seq((1L, "a", -999.0, true), (3L, "c", 3.0, false))
      .toDF("id", "name", "v", "del")
    val (ins, upd, del) = KeyedTable.merge(feed, wh, t,
      deleteWhen = col("del"))
    assert((ins, upd, del) == (1L, 0L, 1L))
    // a violating UPDATE image through merge rejects
    val bad = Seq((2L, "b", -2.0, false)).toDF("id", "name", "v", "del")
    intercept[StoreException] {
      KeyedTable.merge(bad, wh, t, deleteWhen = col("del"))
    }
  }

  test("registration validates existing rows; duplicate and bad names refused") {
    val t = "t_check_reg"
    KeyedTable.toSql(df((1L, "a", -1.0)), wh, t, pk = Seq("id"), buckets = 2)
    val e = intercept[StoreException] {
      KeyedTable.addCheckConstraint(spark, wh, t, "v_pos", "v >= 0")
    }
    assert(e.getMessage.contains("1 existing row"))
    KeyedTable.addCheckConstraint(spark, wh, t, "v_big", "v >= -10")
    intercept[StoreException] {
      KeyedTable.addCheckConstraint(spark, wh, t, "v_big", "v >= -20")
    }
    intercept[StoreException] {
      KeyedTable.addCheckConstraint(spark, wh, t, "nope", "no_such_col > 0")
    }
    assert(KeyedTable.dropCheckConstraint(spark, wh, t, "v_big"))
    assert(!KeyedTable.dropCheckConstraint(spark, wh, t, "v_big"))
  }

  test("a constraint added while appendConcurrent was staging is enforced at commit") {
    val t = "t_check_race"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    val dir = wh + s"/$t"
    // hold the write lock; start a violating appendConcurrent — it
    // stages unlocked, then polls for the commit lock while we register
    // the constraint under our lock (validated against a snapshot that
    // excludes the staged rows). On release, the commit must enforce
    // the NEW constraint itself and abort.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    @volatile var staged = false
    val fut = WriteLock.withLock(spark, dir, "spec-hold") {
      val f = Future {
        intercept[StoreException] {
          KeyedTable.appendConcurrent(df((2L, "b", -2.0)), wh, t,
            commitWaitMs = 60000L)
        }
      }
      // wait for the racer to finish staging (its .staging-append-* dir
      // appears) before we mutate meta — deterministic ordering
      val fsys = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!staged && System.nanoTime() < deadline) {
        staged = fsys.listStatus(new org.apache.hadoop.fs.Path(dir))
          .exists(_.getPath.getName.startsWith(".staging-append-"))
        if (!staged) Thread.sleep(50)
      }
      assert(staged, "racer never staged")
      val m = TableMeta.read(spark, dir)
      TableMeta.write(spark, dir, m.copy(checks = m.checks + ("v_pos" -> "v >= 0")))
      f
    }
    val e = Await.result(fut, 90.seconds)
    assert(e.getMessage.contains("v_pos"))
    // the violating row never landed
    assert(values(KeyedTable.readSql(spark, wh, t)) == Set((1L, "a", 1.0)))
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT CHECK") {
    val t = "t_check_sql"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    val cat = s"graft_checkspec${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"ALTER TABLE $cat.$t ADD CONSTRAINT v_pos CHECK (v >= 0)")
      intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.$t VALUES (2, 'b', -2.0, NULL)")
      }
      assert(KeyedTable.readSql(spark, wh, t).count() == 1)
      spark.sql(s"ALTER TABLE $cat.$t DROP CONSTRAINT v_pos")
      spark.sql(s"INSERT INTO $cat.$t VALUES (2, 'b', -2.0, NULL)")
      assert(KeyedTable.readSql(spark, wh, t).count() == 2)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
