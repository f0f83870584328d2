package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark catalog plugin exposing a graft warehouse to pure SQL:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.store.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *   // then: SELECT ... FROM graft.my_table
  * }}}
  *
  * Reads go through [[KeyedTableSource]]'s table, so catalog-addressed
  * queries get the same column pruning and KeyGroupedPartitioning as
  * `PkJoin` — a SQL join of two `graft.*` tables on pk + pb_bucket
  * plans storage-partitioned. Writes stay with `KeyedTable.toSql`
  * (create/alter/rename through SQL are rejected — the store's write
  * semantics, PK validation, bucketing and staged commits are the
  * library's contract, not DDL's).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"set spark.sql.catalog.$name.warehouse to the warehouse directory")
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Catalog.tableNames(spark, warehouse)
      .map(t => Identifier.of(namespace, t)).toArray

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && Catalog.hasTable(spark, warehouse, ident.name)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = KeyedTable.tableDir(warehouse, ident.name)
    new KeyedBatchTable(TableMeta.read(spark, dir), s"$dir/data")
  }

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && {
      Catalog.dropTable(spark, warehouse, ident.name); true
    }

  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created through KeyedTable.toSql (PK + bucket layout)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolution goes through KeyedTable.toSql(addNewColumns = true)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft tables cannot be renamed through SQL")
}
