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

  test("companda ignoreAllNanColumns drops empty columns (companda.py:64)") {
    val orders = Tables.orders(spark, sfDir)
    val extraNull = orders.withColumn("empty", lit(null).cast("double"))
    assert(!Companda(orders, extraNull, pk = Seq("o_orderkey")).equal)
    assert(Companda(orders, extraNull, pk = Seq("o_orderkey"),
      ignoreAllNanColumns = true).equal)
  }
}
