package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Footer-metadata aggregate pushdown on the keyed-table DSv2 path
  * (#11k): an unfiltered global COUNT/MIN/MAX plans as a driver-local
  * scan — zero tasks, zero data bytes — and anything the footers can't
  * answer exactly falls back to a real scan with identical results. */
class AggPushdownSpec extends SparkSpec {

  private def wh(): String = Files.createTempDirectory("graft-spec-agg-").toString

  private def plan(df: DataFrame) = df.queryExecution.executedPlan

  private def hasLocalScan(df: DataFrame): Boolean =
    plan(df).collect { case l: LocalTableScanExec => l }.nonEmpty ||
      plan(df).toString.contains("LocalTableScan")

  private def hasBatchScan(df: DataFrame): Boolean =
    plan(df).toString.contains("BatchScan")

  test("count/min/max over the whole table answer from footers as a LocalTableScan") {
    import spark.implicits._
    val w = wh()
    val df = (1 to 500).map(i =>
      (i.toLong, i * 1.5, if (i % 5 == 0) null else s"v$i")).toDF("k", "x", "v")
    KeyedTable.toSql(df, w, "t", pk = Seq("k"))
    val q = KeyedTableSource.read(spark, w, "t")
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"), max(col("k")).as("mx"),
        min(col("x")).as("xmn"), max(col("x")).as("xmx"))
    assert(hasLocalScan(q) && !hasBatchScan(q),
      s"expected footer-only plan, got\n${plan(q)}")
    val r = q.collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 1L && r.getLong(2) == 500L)
    assert(r.getDouble(3) == 1.5 && r.getDouble(4) == 750.0)
  }

  test("count(col) subtracts footer null counts exactly") {
    import spark.implicits._
    val w = wh()
    val df = (1 to 300).map(i =>
      (i.toLong, if (i % 3 == 0) None else Some(i * 2.0))).toDF("k", "x")
    KeyedTable.toSql(df, w, "t", pk = Seq("k"))
    val q = KeyedTableSource.read(spark, w, "t").agg(count(col("x")).as("nx"))
    assert(hasLocalScan(q) && !hasBatchScan(q), s"plan:\n${plan(q)}")
    assert(q.collect().head.getLong(0) == 200L)
  }

  test("filters, groupBy, and string min/max all decline to a real scan, same answers") {
    import spark.implicits._
    val w = wh()
    val df = (1 to 200).map(i => (i.toLong, s"v$i", i % 7)).toDF("k", "v", "g")
    KeyedTable.toSql(df, w, "t", pk = Seq("k"))
    val t = KeyedTableSource.read(spark, w, "t")
    val filtered = t.filter(col("k") > 100L).agg(count(lit(1)))
    assert(hasBatchScan(filtered), "filtered agg must scan")
    assert(filtered.collect().head.getLong(0) == 100L)
    val grouped = t.groupBy(col("g")).agg(count(lit(1)).as("n"))
    assert(hasBatchScan(grouped), "grouped agg must scan")
    assert(grouped.collect().map(_.getLong(1)).sum == 200L)
    val strAgg = t.agg(min(col("v")))
    assert(hasBatchScan(strAgg), "string min/max is not footer-safe")
    assert(strAgg.collect().head.getString(0) == "v1")
  }

  test("multi-file buckets (append-heavy) aggregate across every footer") {
    import spark.implicits._
    val w = wh()
    KeyedTable.toSql((1L to 200L).map(i => (i, i * 1.0)).toDF("k", "x"),
      w, "t", pk = Seq("k"))
    KeyedTable.toSql((201L to 350L).map(i => (i, i * 1.0)).toDF("k", "x"),
      w, "t", pk = Seq("k"), how = WriteMode.Append)
    KeyedTable.toSql((351L to 500L).map(i => (i, i * 1.0)).toDF("k", "x"),
      w, "t", pk = Seq("k"), how = WriteMode.Append)
    val q = KeyedTableSource.read(spark, w, "t")
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"), max(col("x")).as("mx"))
    assert(hasLocalScan(q) && !hasBatchScan(q), s"plan:\n${plan(q)}")
    val r = q.collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 1L && r.getDouble(2) == 500.0)
  }

  test("SQL count(*) through the graft catalog is footer-only too") {
    import spark.implicits._
    val w = wh()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    try {
      KeyedTable.toSql((1 to 123).map(i => (i.toLong, i * 3.0)).toDF("k", "x"),
        w, "agg_sql_t", pk = Seq("k"))
      val q = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM graft.agg_sql_t")
      assert(hasLocalScan(q) && !hasBatchScan(q), s"plan:\n${plan(q)}")
      val r = q.collect().head
      assert(r.getLong(0) == 123L && r.getLong(1) == 123L)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft.warehouse")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("empty table: count 0, min/max null, still footer-only") {
    import spark.implicits._
    val w = wh()
    val df = (1 to 50).map(i => (i.toLong, i * 1.0)).toDF("k", "x")
    KeyedTable.toSql(df.filter(lit(false)), w, "t", pk = Seq("k"))
    val q = KeyedTableSource.read(spark, w, "t")
      .agg(count(lit(1)).as("n"), min(col("k")).as("mn"))
    assert(hasLocalScan(q) && !hasBatchScan(q), s"plan:\n${plan(q)}")
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }
}
