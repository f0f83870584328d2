package graft.store

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 view of a keyed table that makes the store's physical
  * bucket layout VISIBLE TO CATALYST: the scan reports
  * `KeyGroupedPartitioning(identity(pb_bucket))` with one input
  * partition per bucket directory, so a join of two keyed tables that
  * includes `pb_bucket` equality (every PK join qualifies — the bucket
  * is a function of the PK) plans as a storage-partitioned join with
  * ZERO exchange on either side, inside normal Catalyst planning:
  * whole-stage codegen, AQE, spillable sort-merge — none of which the
  * previous RDD `zipPartitions` tier had (and no in-memory build of a
  * whole bucket).
  *
  * The identity transform is the key trick: `bucket(n, pk)` transforms
  * only resolve through a FunctionCatalog, but identity over the
  * physical partition column resolves against the relation output, so
  * a plain path-based provider suffices.
  *
  * Read behavior matches the store layout: data files are the bucket
  * dirs' parquet (vectorized reader, column pruning pushed down); the
  * `pb_bucket` column is served from directory partition values. All
  * `buckets` partitions are always emitted (missing dirs → empty file
  * lists) so two tables with the same bucket count report identical
  * partition values and always zip cleanly.
  */
class KeyedTableSource extends TableProvider {

  private def meta(options: CaseInsensitiveStringMap): (TableMeta, String) = {
    val warehouse = options.get("warehouse")
    val table = options.get("table")
    require(warehouse != null && table != null,
      "graft keyed-table source requires 'warehouse' and 'table' options")
    val spark = SparkSession.active
    (TableMeta.read(spark, KeyedTable.tableDir(warehouse, table)),
      s"${KeyedTable.tableDir(warehouse, table)}/data")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (m, _) = meta(options)
    StructType(m.schema.fields :+ KeyedTableSource.bucketField)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val (m, dataDir) = meta(new CaseInsensitiveStringMap(properties))
    new KeyedBatchTable(m, dataDir)
  }

  override def supportsExternalMetadata(): Boolean = false
}

object KeyedTableSource {
  val bucketField: StructField =
    StructField(KeyedTable.BucketCol, IntegerType, nullable = true)

  /** DataFrame over the keyed table through the V2 source — includes
    * the `pb_bucket` column and carries KeyGroupedPartitioning. */
  def read(spark: SparkSession, warehouse: String, table: String) =
    spark.read.format(classOf[KeyedTableSource].getName)
      .option("warehouse", warehouse).option("table", table).load()
}

private[store] class KeyedBatchTable(meta: TableMeta, dataDir: String)
    extends Table with SupportsRead {

  override def name(): String = dataDir

  override def schema(): StructType =
    StructType(meta.schema.fields :+ KeyedTableSource.bucketField)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedScanBuilder(meta, dataDir, schema())
}

private[store] class KeyedScanBuilder(meta: TableMeta, dataDir: String,
                                      full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KeyedScan(meta, dataDir, required)
}

private[store] class KeyedScan(meta: TableMeta, dataDir: String,
                               required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {

  private val readDataSchema =
    StructType(required.fields.filterNot(_.name == KeyedTable.BucketCol))
  private val readPartitionSchema =
    StructType(required.fields.filter(_.name == KeyedTable.BucketCol))

  // the reader factory appends partition columns after data columns
  override def readSchema(): StructType =
    StructType(readDataSchema.fields ++ readPartitionSchema.fields)

  override def toBatch: Batch = this

  override def description(): String =
    s"graft keyed table $dataDir (buckets=${meta.buckets}, pk=${meta.pk.mkString(",")})"

  /** Identity over the physical bucket column — only reportable when
    * the column survives pruning (the partitioning expression must
    * resolve against the scan output). */
  override def outputPartitioning(): Partitioning =
    if (readPartitionSchema.fields.nonEmpty)
      new KeyGroupedPartitioning(
        Array(Expressions.identity(KeyedTable.BucketCol)), meta.buckets)
    else new UnknownPartitioning(meta.buckets)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE listing of the data dir (not an exists() RPC per bucket —
    // thousands of buckets would mean thousands of driver round-trips)
    val bucketDirs = fs.listStatus(root).filter(_.isDirectory)
      .map(st => st.getPath.getName -> st.getPath).toMap
    (0 until meta.buckets).map { b =>
      val key = new GenericInternalRow(Array[Any](b))
      val files: Array[PartitionedFile] =
        bucketDirs.get(s"${KeyedTable.BucketCol}=$b") match {
          case Some(dir) =>
            fs.listStatus(dir)
              .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName)
              .map(st => new PartitionedFile(key, SparkPath.fromPath(st.getPath),
                0L, st.getLen, Array.empty[String], st.getModificationTime,
                st.getLen, Map.empty[String, Any]))
          case None => Array.empty[PartitionedFile]
        }
      new KeyedFilePartition(b, files, key): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    org.apache.spark.sql.execution.datasources.parquet.GraftParquetSupport
      .readerFactory(SparkSession.active, meta.schema, readDataSchema, readPartitionSchema)
}

/** A FilePartition that also exposes its bucket id as the partition
  * key, which is what lets BatchScanExec group partitions into a
  * catalyst KeyGroupedPartitioning. */
private[store] class KeyedFilePartition(
    override val index: Int,
    override val files: Array[PartitionedFile],
    key: InternalRow)
    extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}
