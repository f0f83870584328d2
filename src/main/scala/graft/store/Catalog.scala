package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-level catalog utilities — mirrors the reference's
  * util.py (has_table, get_db_table_names, get_table_column_names,
  * drop_db_table, describe_database; /root/reference/pandabase/util.py).
  * A "database" is a warehouse directory; a "table" is a KeyedTable dir.
  */
object Catalog {

  def hasTable(spark: SparkSession, warehouse: String, table: String): Boolean =
    TableMeta.exists(spark, KeyedTable.tableDir(warehouse, table))

  /** Reference: util.py:23 get_db_table_names. */
  def tableNames(spark: SparkSession, warehouse: String): Seq[String] = {
    val p = new Path(warehouse)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, TableMeta.FileName)))
      .map(_.getPath.getName).sorted
  }

  /** Reference: util.py:31 get_table_column_names. */
  def columnNames(spark: SparkSession, warehouse: String, table: String): Seq[String] =
    TableMeta.read(spark, KeyedTable.tableDir(warehouse, table)).schema.fieldNames.toSeq

  def primaryKey(spark: SparkSession, warehouse: String, table: String): Seq[String] =
    TableMeta.read(spark, KeyedTable.tableDir(warehouse, table)).pk

  /** Reference: util.py:5 drop_db_table. */
  def dropTable(spark: SparkSession, warehouse: String, table: String): Unit = {
    val p = new Path(KeyedTable.tableDir(warehouse, table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new StoreException(s"no such table: $table")
    fs.delete(p, true)
  }

  /** Register every table of a warehouse as a session temp view (named
    * after the table), so the whole store is queryable from
    * `spark.sql` — the SQL face of `readSql`. Views are lazy plans over
    * the bucket layout: filters and pruning behave exactly as through
    * `readSql` (range pushdown, column pruning). Returns the names. */
  def registerViews(spark: SparkSession, warehouse: String): Seq[String] = {
    val names = tableNames(spark, warehouse)
    names.foreach { t =>
      KeyedTable.readSql(spark, warehouse, t).createOrReplaceTempView(t)
    }
    names
  }

  /** Per-table PK min/max + row count, one row per table — the
    * reference's describe_database (util.py:45). min/max rendered as
    * strings so heterogeneous PK types fit one frame; composite-PK
    * tables report min/max of the leading PK column (the reference
    * reports only 'multi' for those — we do strictly more).
    *
    * Planned under the V2 parquet source with aggregate pushdown, so
    * for stat-friendly PK types the per-table min/max/count come from
    * FOOTER METADATA (`PushedAggregation` in the plan) — describing a
    * warehouse of 1,000 100 TB tables is a metadata job, O(files) not
    * O(rows). Types the footer can't answer exactly (e.g. strings,
    * which parquet may truncate) silently fall back to a normal scan —
    * same values either way. The result is materialized inside the
    * conf window (it's ≤ one row per table) so the returned frame is
    * plain local data and the session confs are restored.
    */
  def describe(spark: SparkSession, warehouse: String): DataFrame = {
    if (tableNames(spark, warehouse).isEmpty)
      // reference describe_database returns an empty mapping (util.py:45)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], describeSchema)
    val confs = Map(
      // V2 parquet (aggregate pushdown is a DSv2-only feature)…
      "spark.sql.sources.useV1SourceList" -> "",
      // …with MIN/MAX/COUNT answered from footer statistics
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val rows =
      try {
        val frames = tableNames(spark, warehouse).map { t =>
          val meta = TableMeta.read(spark, KeyedTable.tableDir(warehouse, t))
          val head = meta.pk.head
          KeyedTable.readSql(spark, warehouse, t)
            .agg(
              min(col(head)).cast("string").as("pk_min"),
              max(col(head)).cast("string").as("pk_max"),
              count(lit(1)).as("n_rows"))
            .select(lit(t).as("table_name"), col("pk_min"), col("pk_max"), col("n_rows"))
        }
        frames.reduce(_ unionByName _).orderBy("table_name").collect().toIndexedSeq
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), describeSchema)
  }

  private val describeSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("pk_min", StringType),
      StructField("pk_max", StringType),
      StructField("n_rows", LongType, nullable = false)))
  }
}
