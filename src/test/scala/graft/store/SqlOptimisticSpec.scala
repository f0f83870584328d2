package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.{SparkSpec, TempDirs}

/** `TBLPROPERTIES('commit_mode'='optimistic')` — table-property
  * routing of SQL DML onto the bucket-level optimistic twins: a
  * Spark-SQL-only writer (the common case for orchestrated pipelines)
  * gets the same multi-writer behavior as the programmatic API. The
  * manifest's per-commit `op` string is the routing witness:
  * `updateConcurrent` / `deleteConcurrent` / `mergeConcurrent` /
  * `appendConcurrent` vs the locked `update` / `delete` /
  * `upsert(merge)` / `append`. */
class SqlOptimisticSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-sqlopt")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "bal")
  }

  private def withCat[A](body: String => A): A = {
    val cat = s"graft_sqlopt${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  private def currentOp(t: String): Option[String] =
    Manifest.current(spark, KeyedTable.tableDir(wh, t)).flatMap(_.op)

  test("SET/UNSET TBLPROPERTIES('commit_mode') routes every SQL DML " +
      "verb onto the optimistic twins and back") {
    val t = "t_sqlopt_route"
    KeyedTable.toSql(df((1L to 40L).map(i => (i, s"n$i", i * 1.0)): _*),
      wh, t, pk = Seq("id"), buckets = 4)
    withCat { cat =>
      // locked by default
      spark.sql(s"UPDATE $cat.$t SET bal = bal + 1 WHERE id <= 10")
      assert(currentOp(t).contains("update"))
      spark.sql(
        s"ALTER TABLE $cat.$t SET TBLPROPERTIES('commit_mode'='optimistic')")
      val props = spark.sql(s"SHOW TBLPROPERTIES $cat.$t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props("commit_mode") == "optimistic")
      spark.sql(s"UPDATE $cat.$t SET bal = bal + 1 WHERE id <= 10")
      assert(currentOp(t).contains("updateConcurrent"))
      spark.sql(s"INSERT INTO $cat.$t VALUES (100, 'ins', 5.0, NULL)")
      assert(currentOp(t).contains("appendConcurrent"))
      spark.sql(s"DELETE FROM $cat.$t WHERE id = 100")
      assert(currentOp(t).exists(_.startsWith("deleteConcurrent")))
      spark.sql(s"""MERGE INTO $cat.$t tgt
        USING (SELECT 7L AS id, 'M' AS name, 9.0 AS bal,
                      CAST(NULL AS INT) AS ${KeyedTable.BucketCol}) src
        ON tgt.id = src.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      assert(currentOp(t).contains("mergeConcurrent"))
      // back to locked
      spark.sql(s"ALTER TABLE $cat.$t UNSET TBLPROPERTIES('commit_mode')")
      spark.sql(s"UPDATE $cat.$t SET bal = bal + 1 WHERE id <= 10")
      assert(currentOp(t).contains("update"))
      // content stayed coherent through the mode flips
      val got = KeyedTable.readSql(spark, wh, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Double]("bal")).toMap
      assert(got(7L) == 9.0 + 1.0) // merge post-image + final update
      assert(got(20L) == 20.0)
      assert(!got.contains(100L))
    }
  }

  test("two SQL UPDATEs on disjoint buckets race: the staged one " +
      "commits through the interferer's window") {
    val t = "t_sqlopt_race"
    KeyedTable.toSql(df((1L to 40L).map(i => (i, s"n$i", i * 1.0)): _*),
      wh, t, pk = Seq("id"), buckets = 4)
    val byBucket = spark.read.parquet(KeyedTable.dataDir(wh, t))
      .select(col("id"), col(KeyedTable.BucketCol))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val keysA = byBucket(byBucket.keys.min)
    val keysB = byBucket(byBucket.keys.max)
    withCat { cat =>
      spark.sql(
        s"ALTER TABLE $cat.$t SET TBLPROPERTIES('commit_mode'='optimistic')")
      // while A's SQL UPDATE is staged-but-uncommitted, B's commits
      // (fire-once guard: B's statement re-enters updateConcurrent and
      // would otherwise re-trigger this same global hook forever)
      var fired = false
      KeyedTable.UpdateConcurrentHooks.betweenPhases = () =>
        if (!fired) {
          fired = true
          spark.sql(s"UPDATE $cat.$t SET bal = -2.0 " +
            s"WHERE id IN (${keysB.mkString(",")})")
        }
      try spark.sql(s"UPDATE $cat.$t SET bal = -1.0 " +
        s"WHERE id IN (${keysA.mkString(",")})")
      finally KeyedTable.UpdateConcurrentHooks.betweenPhases = () => ()
      val got = KeyedTable.readSql(spark, wh, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Double]("bal")).toMap
      keysA.foreach(k => assert(got(k) == -1.0, s"A's update on $k"))
      keysB.foreach(k => assert(got(k) == -2.0, s"B's update on $k"))
    }
  }

  test("CREATE TABLE accepts commit_mode; bad values refuse loudly") {
    withCat { cat =>
      spark.sql(s"""CREATE TABLE $cat.t_sqlopt_create (k BIGINT, v STRING)
        TBLPROPERTIES('primary_key'='k', 'buckets'='2',
                      'commit_mode'='optimistic')""")
      spark.sql(s"INSERT INTO $cat.t_sqlopt_create VALUES (1, 'a', NULL)")
      assert(currentOp("t_sqlopt_create").contains("appendConcurrent"))
      val e = intercept[Exception] {
        KeyedTable.setCommitMode(spark, wh, "t_sqlopt_create", "yolo")
      }
      assert(e.getMessage.contains("commit_mode"), e.getMessage)
    }
  }

  test("auto-index tables keep SQL INSERT on the locked path (id " +
      "assignment arbitrates under the lock)") {
    withCat { cat =>
      spark.sql(s"""CREATE TABLE $cat.t_sqlopt_auto (v STRING)
        TBLPROPERTIES('auto_index'='true', 'commit_mode'='optimistic')""")
      spark.sql(s"INSERT INTO $cat.t_sqlopt_auto VALUES (NULL, 'a', NULL)")
      assert(currentOp("t_sqlopt_auto").exists(!_.contains("Concurrent")))
      assert(KeyedTable.readSql(spark, wh, "t_sqlopt_auto").count() == 1)
    }
  }
}
