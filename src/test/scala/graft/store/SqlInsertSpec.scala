package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL write surface (#11m): `INSERT INTO graft.t` routes through the
  * store's own append path — same PK validation, bucket layout, and
  * writer lock as programmatic toSql; OVERWRITE is rejected. */
class SqlInsertSpec extends SparkSpec {

  import spark.implicits._

  // one catalog NAME per test: Spark caches catalog instances by name,
  // so re-pointing an existing name at a new warehouse would not take
  private def withCatalog[A](cat: String)(body: String => A): A = {
    val w = Files.createTempDirectory("graft-spec-ins-").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    try body(w)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("INSERT INTO appends through the store; layout and reads stay intact") {
    withCatalog("graft_w1") { w =>
      KeyedTable.toSql((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"),
        w, "t", pk = Seq("k"))
      // by-position insert includes the exposed pb_bucket column → NULL
      spark.sql("INSERT INTO graft_w1.t VALUES (101, 'v101', NULL), (102, 'v102', NULL)")
      val back = KeyedTable.readSql(spark, w, "t")
      assert(back.count() == 102)
      assert(back.filter(col("k") === 101L).head().getString(1) == "v101")
      // the new rows landed in their hash buckets (range read still prunes)
      assert(KeyedTable.readSql(spark, w, "t", lowest = Seq(101L),
        highest = Seq(102L)).count() == 2)
      // and SQL reads see them through the same catalog
      assert(spark.sql("SELECT count(*) FROM graft_w1.t").head().getLong(0) == 102L)
    }
  }

  test("INSERT INTO SELECT works; PK overlap fails with the append contract") {
    withCatalog("graft_w2") { w =>
      KeyedTable.toSql((1L to 50L).map(i => (i, i * 1.0)).toDF("k", "x"),
        w, "a", pk = Seq("k"))
      KeyedTable.toSql((51L to 80L).map(i => (i, i * 1.0)).toDF("k", "x"),
        w, "b", pk = Seq("k"))
      spark.sql("INSERT INTO graft_w2.a SELECT k, x, NULL FROM graft_w2.b")
      assert(KeyedTable.readSql(spark, w, "a").count() == 80)
      // overlapping keys: the append contract rejects (reference sql.py)
      val e = intercept[Exception](
        spark.sql("INSERT INTO graft_w2.a SELECT k, x, NULL FROM graft_w2.b"))
      assert(e.toString.contains("Append would overwrite existing PKs"),
        s"expected PK-overlap failure, got $e")
      assert(KeyedTable.readSql(spark, w, "a").count() == 80, "failed insert wrote nothing")
    }
  }

  test("explicit auto-index values are rejected (lazily) as a StoreException") {
    withCatalog("graft_w4") { w =>
      KeyedTable.toSql(Seq(("a", 1.0)).toDF("g", "v"), w, "t",
        autoIndex = true)
      // a NON-NULL id slot fails — caught mid-write (the guard rides the
      // write's own pass, never its own job) but surfaced clean
      val e = intercept[StoreException](
        spark.sql("INSERT INTO graft_w4.t VALUES (77, 'b', 2.0, NULL)"))
      assert(e.getMessage.contains("assigns ids itself"), s"got $e")
      assert(KeyedTable.readSql(spark, w, "t").count() == 1,
        "failed insert wrote nothing")
      // NULL slots pass and the store assigns the next id
      spark.sql("INSERT INTO graft_w4.t VALUES (NULL, 'b', 2.0, NULL)")
      val ids = KeyedTable.readSql(spark, w, "t")
        .select(Names.AutoIndex).as[Long].collect().sorted.toSeq
      assert(ids == Seq(0L, 1L), ids.toString)
    }
  }

  test("INSERT OVERWRITE is rejected") {
    withCatalog("graft_w3") { w =>
      KeyedTable.toSql(Seq((1L, "a")).toDF("k", "v"), w, "t", pk = Seq("k"))
      val e = intercept[Exception](
        spark.sql("INSERT OVERWRITE graft_w3.t VALUES (9, 'z', NULL)"))
      assert(e.toString.contains("INSERT OVERWRITE is not supported") ||
        String.valueOf(e.getMessage).contains("not supported"), s"got $e")
      assert(KeyedTable.readSql(spark, w, "t").count() == 1)
    }
  }
}
