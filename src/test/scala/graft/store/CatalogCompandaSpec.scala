package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CatalogCompandaSpec extends SparkSpec {

  private def wh(): String = Files.createTempDirectory("graft-spec-").toString

  test("catalog: hasTable / tableNames / columnNames / dropTable (reference util.py)") {
    val w = wh()
    assert(!Catalog.hasTable(spark, w, "nation"))
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    KeyedTable.toSql(Tables.region(spark, sfDir), w, "region", pk = Seq("r_regionkey"))
    assert(Catalog.hasTable(spark, w, "nation"))
    assert(Catalog.tableNames(spark, w) == Seq("nation", "region"))
    assert(Catalog.columnNames(spark, w, "nation") ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(Catalog.primaryKey(spark, w, "nation") == Seq("n_nationkey"))
    Catalog.dropTable(spark, w, "region")
    assert(Catalog.tableNames(spark, w) == Seq("nation"))
    intercept[StoreException](Catalog.dropTable(spark, w, "region"))
  }

  test("describe reports pk min/max and count (reference util.py:45)") {
    val w = wh()
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    val d = Catalog.describe(spark, w).collect()
    assert(d.length == 1)
    assert(d(0).getString(0) == "nation" && d(0).getString(1) == "0" &&
      d(0).getString(2) == "24" && d(0).getLong(3) == 25L)
  }

  test("registerViews: the warehouse is queryable from spark.sql") {
    val w = wh()
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    KeyedTable.toSql(Tables.region(spark, sfDir), w, "region", pk = Seq("r_regionkey"))
    assert(Catalog.registerViews(spark, w) == Seq("nation", "region"))
    val joined = spark.sql(
      """SELECT r_name, count(*) AS n FROM nation
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""").collect()
    assert(joined.length == 5 && joined.map(_.getLong(1)).sum == 25)
    spark.catalog.dropTempView("nation")
    spark.catalog.dropTempView("region")
  }

  test("GraftCatalog: SQL over graft.<table> without registration; writes rejected") {
    val w = wh()
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    spark.conf.set("spark.sql.catalog.graft_t", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_t.warehouse", w)
    try {
      val rows = spark.sql(
        "SELECT n_name FROM graft_t.nation WHERE n_nationkey = 3").collect()
      assert(rows.length == 1)
      assert(spark.sql("SHOW TABLES IN graft_t").collect().map(_.getString(1))
        .contains("nation"))
      intercept[Exception](
        spark.sql("CREATE TABLE graft_t.newtbl (id BIGINT) USING parquet"))
      // the catalog table carries the bucket column for SPJ joins
      assert(spark.sql("SELECT * FROM graft_t.nation").columns.contains("pb_bucket"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_t")
      spark.conf.unset("spark.sql.catalog.graft_t.warehouse")
    }
  }

  test("GraftCatalog: SQL join on pk + pb_bucket plans storage-partitioned (no exchange)") {
    val w = wh()
    val cust = Tables.customer(spark, sfDir)
    val roll = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    KeyedTable.toSql(cust, w, "c", pk = Seq("c_custkey"))
    KeyedTable.toSql(roll, w, "o", pk = Seq("c_custkey"))
    spark.conf.set("spark.sql.catalog.graft_j", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_j.warehouse", w)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val joined = spark.sql(
        """SELECT /*+ MERGE(l) */ l.c_custkey, l.c_name, r.n_orders
           FROM graft_j.c l JOIN graft_j.o r
           ON l.c_custkey = r.c_custkey AND l.pb_bucket = r.pb_bucket""")
      assert(joined.count() == roll.count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally Seq("spark.sql.catalog.graft_j", "spark.sql.catalog.graft_j.warehouse")
      .foreach(spark.conf.unset)
  }

  test("describe answers from footer stats via the keyed source's own pushdown") {
    val w = wh()
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    // the same shape describe plans per table: a driver-local scan
    // (FooterAgg), never a BatchScan — no session conf involved
    val agg = KeyedTableSource.read(spark, w, "nation")
      .agg(min(col("n_nationkey")), max(col("n_nationkey")), count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"),
      s"aggregate not answered from footers:\n$plan")
    assert(agg.head().toSeq == Seq(0L, 24L, 25L))
  }

  test("concurrent describe racing session conf flips is safe (no shared child session)") {
    val w = wh()
    KeyedTable.toSql(Tables.nation(spark, sfDir), w, "nation", pk = Seq("n_nationkey"))
    val key = "spark.sql.parquet.filterPushdown"
    val default = spark.conf.get(key)
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          try {
            (0 until 3).foreach { j =>
              if ((i + j) % 2 == 0) spark.conf.set(key, "false")
              else spark.conf.unset(key)
              val d = Catalog.describe(spark, w).collect()
              assert(d.length == 1 && d(0).getLong(3) == 25L)
            }
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent describe failed: ${errs.peek()}")
    } finally spark.conf.set(key, default)
  }

  test("companda equal frames (reference companda.py:40)") {
    val orders = Tables.orders(spark, sfDir)
    val r = Companda(orders, orders.select(orders.columns.reverse.map(col): _*),
      pk = Seq("o_orderkey"))
    assert(r.equal && r.columnsEqual)
  }

  test("companda column-set mismatch") {
    val orders = Tables.orders(spark, sfDir)
    val r = Companda(orders, orders.drop("o_totalprice"), pk = Seq("o_orderkey"))
    assert(!r.equal && !r.columnsEqual)
  }

  test("companda epsilon: small deltas equal, big deltas not (companda.py:129)") {
    val orders = Tables.orders(spark, sfDir)
    val nudged = orders.withColumn("o_totalprice", col("o_totalprice") + 0.0001)
    assert(Companda(orders, nudged, pk = Seq("o_orderkey")).equal)
    val shoved = orders.withColumn("o_totalprice", col("o_totalprice") + 10)
    val r = Companda(orders, shoved, pk = Seq("o_orderkey"))
    assert(!r.equal && r.columnsEqual && r.message.contains("o_totalprice"))
  }

  test("companda NaN/NULL placement must match (companda.py:143)") {
    val orders = Tables.orders(spark, sfDir)
    val withNull = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 100 === 0, lit(null)).otherwise(col("o_totalprice")))
    assert(!Companda(orders, withNull, pk = Seq("o_orderkey")).equal)
  }

  test("companda length mismatch") {
    val orders = Tables.orders(spark, sfDir)
    val r = Companda(orders, orders.filter(col("o_orderkey") > 10), pk = Seq("o_orderkey"))
    assert(!r.equal && r.columnsEqual && r.message.contains("len"))
  }

  test("companda checkDtype flags type differences (companda.py:124)") {
    val orders = Tables.orders(spark, sfDir)
    val asInt = orders.withColumn("o_totalprice", col("o_totalprice").cast("long"))
    val loose = Companda(orders, asInt, pk = Seq("o_orderkey"))
    assert(!loose.equal || loose.equal) // values may differ after truncation; just not crash
    val strict = Companda(orders, asInt, pk = Seq("o_orderkey"), checkDtype = true)
    assert(!strict.equal)
  }

  test("companda ignoreIndex: positional compare after each side sorts by its own index (companda.py:46)") {
    import spark.implicits._
    // the reference's auto-index scenario (test_sql.py:104): same rows,
    // but df2's synthetic PK shares no values with df1's — positionally
    // equal once each side is sorted by its own index
    val df1 = Seq((10L, "a", 1.0), (20L, "b", 2.0), (30L, "c", 3.0))
      .toDF("pk", "name", "x")
    val df2 = Seq((100L, "a", 1.0), (200L, "b", 2.0), (300L, "c", 3.0))
      .toDF("auto_pk", "name", "x")
    assert(!Companda(df1, df1.withColumnRenamed("pk", "auto_pk"),
      pk = Seq("pk")).equal) // column sets differ without ignoreIndex
    assert(Companda(df1, df2, pk = Seq("pk"), ignoreIndex = true,
      df2Pk = Seq("auto_pk")).equal)
    // sorting is per-side: rows arriving in different physical order
    // still line up positionally
    assert(Companda(df1.orderBy(col("pk").desc), df2, pk = Seq("pk"),
      ignoreIndex = true, df2Pk = Seq("auto_pk")).equal)
    // a genuine value difference is still caught
    val df2bad = Seq((100L, "a", 1.0), (200L, "b", 2.0), (300L, "c", 99.0))
      .toDF("auto_pk", "name", "x")
    val r = Companda(df1, df2bad, pk = Seq("pk"), ignoreIndex = true,
      df2Pk = Seq("auto_pk"))
    assert(!r.equal && r.columnsEqual && r.message.contains("x"))
    // doubled frame vs doubled frame (test_sql.py:841): lengths match
    val r2 = Companda(df1.union(df1), df2.union(df2), pk = Seq("pk"),
      ignoreIndex = true, df2Pk = Seq("auto_pk"))
    assert(r2.equal)
    // length mismatch still reported first
    assert(Companda(df1.union(df1), df2, pk = Seq("pk"), ignoreIndex = true,
      df2Pk = Seq("auto_pk")).message.contains("len"))
  }

  test("companda ignoreAllNanColumns drops empty columns (companda.py:64)") {
    val orders = Tables.orders(spark, sfDir)
    val extraNull = orders.withColumn("empty", lit(null).cast("double"))
    assert(!Companda(orders, extraNull, pk = Seq("o_orderkey")).equal)
    assert(Companda(orders, extraNull, pk = Seq("o_orderkey"),
      ignoreAllNanColumns = true).equal)
  }
}
