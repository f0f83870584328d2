package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's `schema=` namespace kwarg (util.py:5-15, sql.py:46):
  * schema.table addressing, per-schema listing, schema'd drop/describe.
  * A schema is a sub-warehouse directory, so every store op works
  * unchanged inside one. */
class SchemaNamespaceSpec extends SparkSpec {

  private def wh(): String = Files.createTempDirectory("graft-spec-ns-").toString

  private def sample(n: Int, tag: String): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"${tag}_$i")).toDF("id", "name")
  }

  test("same table name resolves independently per schema") {
    val w = wh()
    KeyedTable.toSql(sample(5, "def"), w, "t", pk = Seq("id"))
    KeyedTable.toSql(sample(7, "raw"), w, "t", pk = Seq("id"), schema = Some("raw"))
    KeyedTable.toSql(sample(9, "cln"), w, "t", pk = Seq("id"), schema = Some("clean"))
    assert(KeyedTable.readSql(spark, w, "t").count() === 5)
    assert(KeyedTable.readSql(spark, w, "t", schema = Some("raw")).count() === 7)
    assert(KeyedTable.readSql(spark, w, "t", schema = Some("clean"))
      .filter(col("id") === 3).head().getString(1) === "cln_3")
  }

  test("catalog ops honor the schema namespace") {
    val w = wh()
    KeyedTable.toSql(sample(3, "a"), w, "top", pk = Seq("id"))
    KeyedTable.toSql(sample(3, "b"), w, "inner1", pk = Seq("id"), schema = Some("raw"))
    KeyedTable.toSql(sample(3, "c"), w, "inner2", pk = Seq("id"), schema = Some("raw"))
    assert(Catalog.hasTable(spark, w, "inner1", Some("raw")))
    assert(!Catalog.hasTable(spark, w, "inner1"))
    // per-schema listing comes back QUALIFIED, like SQLAlchemy's
    // reflected meta.tables keys (reference util.py:23)
    assert(Catalog.tableNames(spark, w, Some("raw")) === Seq("raw.inner1", "raw.inner2"))
    // the default listing sees only top-level tables, not schema dirs
    assert(Catalog.tableNames(spark, w) === Seq("top"))
    assert(Catalog.schemaNames(spark, w) === Seq("raw"))
    assert(Catalog.columnNames(spark, w, "inner1", Some("raw")) === Seq("id", "name"))
    assert(Catalog.primaryKey(spark, w, "inner2", Some("raw")) === Seq("id"))
    Catalog.dropTable(spark, w, "inner1", Some("raw"))
    assert(Catalog.tableNames(spark, w, Some("raw")) === Seq("raw.inner2"))
    intercept[StoreException] { Catalog.dropTable(spark, w, "inner1", Some("raw")) }
  }

  test("describe and registerViews work inside a schema; names qualify") {
    val w = wh()
    KeyedTable.toSql(sample(4, "x"), w, "aaa", pk = Seq("id"), schema = Some("s1"))
    KeyedTable.toSql(sample(6, "y"), w, "bbb", pk = Seq("id"), schema = Some("s1"))
    val d = Catalog.describe(spark, w, Some("s1")).collect()
    assert(d.map(_.getString(0)).toSeq === Seq("s1.aaa", "s1.bbb"))
    assert(d.map(_.getLong(3)).toSeq === Seq(4L, 6L))
    val views = Catalog.registerViews(spark, w, Some("s1"))
    assert(views === Seq("s1_aaa", "s1_bbb"))
    assert(spark.sql("SELECT count(*) FROM s1_bbb").head().getLong(0) === 6L)
  }

  test("GraftCatalog: schema namespaces at the SQL surface") {
    val w = wh()
    KeyedTable.toSql(sample(4, "top"), w, "t0", pk = Seq("id"))
    KeyedTable.toSql(sample(6, "ns"), w, "t1", pk = Seq("id"), schema = Some("raw"))
    spark.conf.set("spark.sql.catalog.graft_ns", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ns.warehouse", w)
    try {
      // schema.table addressing straight from SQL
      assert(spark.sql("SELECT count(*) FROM graft_ns.raw.t1").head().getLong(0) === 6L)
      assert(spark.sql("SELECT count(*) FROM graft_ns.t0").head().getLong(0) === 4L)
      assert(spark.sql("SHOW NAMESPACES IN graft_ns").collect()
        .map(_.getString(0)).toSeq === Seq("raw"))
      assert(spark.sql("SHOW TABLES IN graft_ns.raw").collect()
        .map(_.getString(1)).toSeq === Seq("t1"))
      // namespace DDL: create is a mkdir, drop refuses non-empty
      spark.sql("CREATE NAMESPACE graft_ns.stage")
      intercept[Exception](spark.sql("DROP NAMESPACE graft_ns.raw"))
      spark.sql("DROP NAMESPACE graft_ns.raw CASCADE")
      assert(spark.sql("SHOW NAMESPACES IN graft_ns").collect().isEmpty)
    } finally Seq("spark.sql.catalog.graft_ns", "spark.sql.catalog.graft_ns.warehouse")
      .foreach(spark.conf.unset)
  }

  test("storage-partitioned join works inside a schema, through SQL and PkJoin") {
    import spark.implicits._
    val w = wh()
    val l = (1 to 300).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val r = (1 to 300).filter(_ % 2 == 0).map(i => (i.toLong, i * 1.0)).toDF("k", "rv")
    KeyedTable.toSql(l, w, "l", pk = Seq("k"), schema = Some("s1"))
    KeyedTable.toSql(r, w, "r", pk = Seq("k"), schema = Some("s1"))
    // the schema is a sub-warehouse: PkJoin co-partitions within it
    val got = PkJoin.pkJoin(spark, KeyedTable.schemaDir(w, Some("s1")), "l", "r")
    assert(got.count() === 150)
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"))
    // and the SQL surface addresses the same tables via the namespace
    spark.conf.set("spark.sql.catalog.graft_ns2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ns2.warehouse", w)
    try {
      val sqlJoin = spark.sql(
        """SELECT /*+ MERGE(a) */ a.k, a.lv, b.rv
           FROM graft_ns2.s1.l a JOIN graft_ns2.s1.r b
           ON a.k = b.k AND a.pb_bucket = b.pb_bucket""")
      assert(sqlJoin.count() === 150)
      assert(!sqlJoin.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally Seq("spark.sql.catalog.graft_ns2", "spark.sql.catalog.graft_ns2.warehouse")
      .foreach(spark.conf.unset)
  }

  test("schema/table name collisions are rejected in both directions") {
    val w = wh()
    // a default-namespace table named 's' exists: addressing schema 's'
    // (which would write _graft_meta INTO the schema dir or nest tables
    // inside the table dir) must fail, not silently flip the dir's kind
    KeyedTable.toSql(sample(3, "t"), w, "s", pk = Seq("id"))
    val e1 = intercept[StoreException] {
      KeyedTable.toSql(sample(3, "u"), w, "inner", pk = Seq("id"), schema = Some("s"))
    }
    assert(e1.getMessage.contains("is a TABLE"), e1.getMessage)

    // a schema 'ns' with tables exists: creating a default-namespace
    // TABLE named 'ns' would bury the schema's tables
    KeyedTable.toSql(sample(3, "v"), w, "inner", pk = Seq("id"), schema = Some("ns"))
    val e2 = intercept[StoreException] {
      KeyedTable.toSql(sample(3, "w"), w, "ns", pk = Seq("id"))
    }
    assert(e2.getMessage.contains("SCHEMA namespace"), e2.getMessage)
    // both originals still read back intact
    assert(KeyedTable.readSql(spark, w, "s").count() == 3)
    assert(KeyedTable.readSql(spark, w, "inner", schema = Some("ns")).count() == 3)
  }

  test("illegal schema names are rejected") {
    intercept[IllegalNameException] {
      KeyedTable.toSql(sample(2, "z"), wh(), "t", pk = Seq("id"),
        schema = Some("Bad Schema!"))
    }
  }

  test("describe batches union width at 100 tables, one row per table") {
    val w = wh()
    import spark.implicits._
    (1 to 100).foreach { i =>
      val df = Seq((1L, i), (2L, i * 2)).toDF("id", "v")
      KeyedTable.toSql(df, w, f"t_$i%03d", pk = Seq("id"), buckets = 1,
        validate = false, inferBool = false)
    }
    val t0 = System.nanoTime()
    val d = Catalog.describe(spark, w).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(d.length === 100)
    assert(d.map(_.getString(0)).toSeq === (1 to 100).map(i => f"t_$i%03d"))
    assert(d.forall(_.getLong(3) === 2L))
    // batched metadata jobs: 100 tiny tables must describe in seconds,
    // not in one 100-branch plan that the optimizer chews minutes on
    assert(secs < 60.0, s"describe took $secs s at 100 tables")
  }
}
