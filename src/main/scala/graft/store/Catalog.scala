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

  /** Every catalog op takes the reference's optional `schema=` kwarg
    * (util.py:5-15): a namespace resolving to `<warehouse>/<schema>/`
    * (see [[KeyedTable.schemaDir]]). None = default namespace. */
  def hasTable(spark: SparkSession, warehouse: String, table: String,
               schema: Option[String] = None): Boolean =
    TableMeta.exists(spark,
      KeyedTable.tableDir(KeyedTable.schemaDir(warehouse, schema), table))

  /** Reference: util.py:23 get_db_table_names — with `schema` the names
    * come back qualified (`schema.table`), mirroring SQLAlchemy's
    * reflected `meta.tables` keys. */
  def tableNames(spark: SparkSession, warehouse: String,
                 schema: Option[String] = None): Seq[String] = {
    val p = new Path(KeyedTable.schemaDir(warehouse, schema))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val bare = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, TableMeta.FileName)))
      .map(_.getPath.getName).sorted
    schema.fold(bare)(s => bare.map(t => s"$s.$t"))
  }

  /** Schemas (namespaces) present under the warehouse: directories that
    * are not themselves tables but contain at least one table. */
  def schemaNames(spark: SparkSession, warehouse: String): Seq[String] = {
    val p = new Path(warehouse)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        !fs.exists(new Path(s.getPath, TableMeta.FileName)) &&
        fs.listStatus(s.getPath).exists(c => c.isDirectory &&
          fs.exists(new Path(c.getPath, TableMeta.FileName))))
      .map(_.getPath.getName).sorted
  }

  /** Reference: util.py:31 get_table_column_names. */
  def columnNames(spark: SparkSession, warehouse: String, table: String,
                  schema: Option[String] = None): Seq[String] =
    TableMeta.read(spark,
      KeyedTable.tableDir(KeyedTable.schemaDir(warehouse, schema), table))
      .schema.fieldNames.toSeq

  def primaryKey(spark: SparkSession, warehouse: String, table: String,
                 schema: Option[String] = None): Seq[String] =
    TableMeta.read(spark,
      KeyedTable.tableDir(KeyedTable.schemaDir(warehouse, schema), table)).pk

  /** Reference: util.py:5 drop_db_table. */
  def dropTable(spark: SparkSession, warehouse: String, table: String,
                schema: Option[String] = None): Unit = {
    val dir = KeyedTable.tableDir(KeyedTable.schemaDir(warehouse, schema), table)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new StoreException(
        s"no such table: ${schema.fold(table)(s => s"$s.$table")}")
    // take the write lock first: dropping out from under an active
    // mutator would otherwise fail its commit mid-sequence (the dir
    // delete below removes the lock with the table)
    WriteLock.withLock(spark, dir, "drop") {
      fs.delete(p, true)
    }
    // the dir may be recycled by a same-name recreate: stale parsed
    // manifests at the identical v<N> paths must not survive the drop
    Manifest.invalidate(dir)
  }

  /** Rename a table: ONE directory rename under the table's write lock
    * — a metadata operation at any scale (no data moves; on HDFS/local
    * the rename is a single namenode/kernel op). Mutators contending
    * on the old name fail cleanly (lock first, then their existence
    * check sees the dir gone); a mid-scan reader of the old name fails
    * with missing paths, the same contract a concurrent drop already
    * has. Object-store caveat: directory "rename" is copy+delete
    * there, mirroring [[WriteLock]]'s atomicity caveat. */
  def renameTable(spark: SparkSession, warehouse: String, oldName: String,
                  newName: String, schema: Option[String] = None): Unit = {
    if (Names.cleanName(newName) != newName)
      throw new StoreException(
        s"Illegal characters in table name: $newName. " +
        s"try: ${Names.cleanName(newName)}")
    val wh = KeyedTable.schemaDir(warehouse, schema)
    val oldDir = KeyedTable.tableDir(wh, oldName)
    val newDir = KeyedTable.tableDir(wh, newName)
    val oldP = new Path(oldDir)
    val newP = new Path(newDir)
    val fs = oldP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(oldP))
      throw new StoreException(
        s"no such table: ${schema.fold(oldName)(s => s"$s.$oldName")}")
    WriteLock.withLock(spark, oldDir, "renameTable") {
      if (!TableMeta.exists(spark, oldDir))
        throw new StoreException(
          s"no such table: ${schema.fold(oldName)(s => s"$s.$oldName")}")
      if (fs.exists(newP))
        throw new StoreException(
          s"rename target already exists: " +
          s"${schema.fold(newName)(s => s"$s.$newName")}")
      if (!fs.rename(oldP, newP))
        throw new StoreException(s"rename $oldDir -> $newDir failed")
      // the rename carried our lock file into the new dir; remove it
      // there (we still hold the token — no other writer can have
      // locked a path that only just appeared). withLock's release on
      // the OLD path then finds nothing, which it tolerates.
      fs.delete(new Path(newDir, WriteLock.FileName), false): Unit
    }
    // parsed manifests cached under the old path must not serve a
    // future same-name recreate
    Manifest.invalidate(oldDir)
  }

  /** Register every table of a warehouse as a session temp view (named
    * after the table; `<schema>_<table>` inside a namespace — temp view
    * names cannot carry dots), so the whole store is queryable from
    * `spark.sql` — the SQL face of `readSql`. Views are lazy plans over
    * the bucket layout: filters and pruning behave exactly as through
    * `readSql` (range pushdown, column pruning). Returns the view names. */
  def registerViews(spark: SparkSession, warehouse: String,
                    schema: Option[String] = None): Seq[String] = {
    val wh = KeyedTable.schemaDir(warehouse, schema)
    val bare = tableNames(spark, wh)
    bare.map { t =>
      val view = schema.fold(t)(s => s"${s}_$t")
      KeyedTable.readSql(spark, wh, t).createOrReplaceTempView(view)
      view
    }
  }

  /** Per-table PK min/max + row count, one row per table — the
    * reference's describe_database (util.py:45). min/max rendered as
    * strings so heterogeneous PK types fit one frame; composite-PK
    * tables report min/max of the leading PK column (the reference
    * reports only 'multi' for those — we do strictly more).
    *
    * Planned through the keyed table's OWN DSv2 aggregate pushdown
    * ([[KeyedScanBuilder.pushAggregation]]): for stat-friendly PK types
    * the per-table min/max/count come from FOOTER METADATA as a
    * driver-local scan — describing a warehouse of 1,000 100 TB tables
    * is a metadata job, O(files) not O(rows), with zero executor tasks.
    * Types the footer can't answer exactly (e.g. strings, which parquet
    * may truncate) silently fall back to a normal scan — same values
    * either way. Native pushdown means no session conf is ever touched
    * (the former stats child session and its conf-sync machinery are
    * gone); the result is materialized (≤ one row per table) and
    * returned as plain local data.
    */
  /** Union width is CAPPED: tables are described in batches of
    * [[DescribeBatch]] union branches per job rather than one
    * 1,000-branch union — planning cost stays linear with a bounded
    * constant, each batch is a small independent metadata job, and the
    * driver holds ≤ one row per table either way. */
  val DescribeBatch = 64

  def describe(spark: SparkSession, warehouse: String,
               schema: Option[String] = None): DataFrame = {
    val wh = KeyedTable.schemaDir(warehouse, schema)
    val bare = tableNames(spark, wh)
    if (bare.isEmpty)
      // reference describe_database returns an empty mapping (util.py:45)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], describeSchema)
    val rows = {
      val frames = bare.map { t =>
        val meta = TableMeta.read(spark, KeyedTable.tableDir(wh, t))
        val head = meta.pk.head
        val qualified = schema.fold(t)(s => s"$s.$t")
        KeyedTableSource.read(spark, wh, t)
          .agg(
            min(col(head)).cast("string").as("pk_min"),
            max(col(head)).cast("string").as("pk_max"),
            count(lit(1)).as("n_rows"))
          .select(lit(qualified).as("table_name"), col("pk_min"), col("pk_max"), col("n_rows"))
      }
      frames.grouped(DescribeBatch)
        .flatMap(batch => batch.reduce(_ unionByName _).collect())
        .toIndexedSeq.sortBy(_.getString(0))
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
