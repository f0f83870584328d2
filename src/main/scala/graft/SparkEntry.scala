package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has a `queries` entry here; oracle SQL
  * (DuckDB dialect, same parquet tables registered by bare name) is in
  * `oracleSql` for the SQL-expressible ones. Column names/aliases match
  * between the two on purpose: the driver sorts columns by name before
  * hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PbQueries.queries ++ LlmQueries.queries ++ Analytics.queries ++ Map(
      "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = PbQueries.oracles ++ LlmQueries.oracles ++ Analytics.oracles ++ Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                                          AS sum_qty,
             round(sum(l_extendedprice), 2)                                     AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
             round(avg(l_quantity), 4)                                          AS avg_qty,
             round(avg(l_extendedprice), 4)                                     AS avg_price,
             round(avg(l_discount), 4)                                          AS avg_disc,
             count(*)                                                           AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim,
  )
}

/** Analytics headline queries (SURVEY.md §2 #14-20). */
object Queries {

  /** TPC-H Q1 pricing summary (agg pipeline; map-side partial agg). */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
