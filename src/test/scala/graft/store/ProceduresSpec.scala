package graft.store

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.TempDirs

/** SQL `CALL graft.system.*` procedures (#11am): the maintenance
  * surface from pure SQL, each lowering onto the programmatic
  * primitive with identical guards. */
class ProceduresSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-proc")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "g", "v")
  }

  private def withCat[A](body: String => A): A = {
    val cat = s"graft_proc${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try body(cat)
    finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("branch WAP end-to-end through CALL") {
    val t = "pr_wap"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      val fork = spark.sql(s"CALL $cat.system.create_branch('$t', 'stage')")
        .head().getLong(0)
      assert(fork == 0L)
      KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@stage",
        pk = Seq("id"), how = WriteMode.Append)
      val v = spark.sql(s"CALL $cat.system.fast_forward('$t', 'stage')")
        .head().getLong(0)
      assert(v == 1L)
      assert(spark.sql(s"SELECT * FROM $cat.$t").count() == 2L)
      assert(spark.sql(s"CALL $cat.system.drop_branch('$t', 'stage')")
        .head().getBoolean(0))
    }
  }

  test("tags, restore, vacuum, rename through CALL (named args included)") {
    val t = "pr_tags"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      assert(spark.sql(s"CALL $cat.system.create_tag('$t', 'cut')")
        .head().getLong(0) == 0L)
      KeyedTable.toSql(df((2L, "b", 2.0)), wh, t,
        pk = Seq("id"), how = WriteMode.Append) // v1
      // metadata-only restore by tag, named-arg form
      val nv = spark.sql(s"CALL $cat.system.restore('$t', tag => 'cut')")
        .head().getLong(0)
      assert(nv == 2L)
      assert(spark.sql(s"SELECT * FROM $cat.$t").count() == 1L)
      assert(spark.sql(s"CALL $cat.system.drop_tag('$t', 'cut')")
        .head().getBoolean(0))
      // vacuum returns a count (>= 0) and leaves the table whole
      val removed = spark.sql(
        s"CALL $cat.system.vacuum('$t', older_than_ms => 0)")
        .head().getInt(0)
      assert(removed >= 0)
      assert(spark.sql(s"SELECT * FROM $cat.$t").count() == 1L)
      assert(spark.sql(s"CALL $cat.system.rename_table('$t', '${t}_x')")
        .head().getBoolean(0))
      assert(spark.sql(s"SELECT * FROM $cat.${t}_x").count() == 1L)
    }
  }

  test("compact, rebucket, zorder through CALL") {
    val t = "pr_maint"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    (2L to 6L).foreach(i =>
      KeyedTable.toSql(df((i, "x", i.toDouble)), wh, t,
        pk = Seq("id"), how = WriteMode.Append))
    withCat { cat =>
      val rewritten = spark.sql(
        s"CALL $cat.system.compact('$t', min_files => 2)").head().getInt(0)
      assert(rewritten > 0)
      assert(spark.sql(s"CALL $cat.system.rebucket('$t', 4)")
        .head().getInt(0) == 4)
      spark.sql(s"CALL $cat.system.zorder('$t', 'id', 'v')")
      assert(spark.sql(s"SELECT * FROM $cat.$t").count() == 6L)
    }
  }

  test("SHOW PROCEDURES lists the system namespace; set_stats_columns works") {
    val t = "pr_show"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system")
        .collect().map(_.toString).mkString("\n")
      assert(listed.contains("create_branch") && listed.contains("vacuum"),
        listed)
      assert(spark.sql(
        s"CALL $cat.system.set_stats_columns('$t', 'v, g')")
        .head().getString(0) == "v,g")
      assert(TableMeta.read(spark,
        KeyedTable.tableDir(wh, t)).statsCols == Seq("v", "g"))
    }
  }

  test("procedures address schema-namespaced tables as 'schema.table'") {
    val t = "pr_ns"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"),
      schema = Some("raw"))
    withCat { cat =>
      assert(spark.sql(s"CALL $cat.system.create_tag('raw.$t', 'cut')")
        .head().getLong(0) == 0L)
      assert(spark.sql(s"CALL $cat.system.create_branch('raw.$t', 'b')")
        .head().getLong(0) == 0L)
      KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@b",
        pk = Seq("id"), how = WriteMode.Upsert, schema = Some("raw"))
      assert(spark.sql(s"CALL $cat.system.fast_forward('raw.$t', 'b')")
        .head().getLong(0) == 1L)
      assert(spark.sql(s"SELECT * FROM $cat.raw.$t").count() == 2L)
    }
  }

  test("unknown procedure and bad namespace fail clearly") {
    val t = "pr_neg"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    withCat { cat =>
      val e = intercept[Exception](
        spark.sql(s"CALL $cat.system.does_not_exist('$t')"))
      // Spark wraps the catalog error as FAILED_TO_LOAD_ROUTINE; our
      // message rides in the cause chain
      def msgs(x: Throwable): String =
        if (x == null) "" else x.getMessage + " | " + msgs(x.getCause)
      assert(msgs(e).contains("no such procedure") ||
        e.getMessage.contains("FAILED_TO_LOAD_ROUTINE"), msgs(e))
      intercept[Exception](
        spark.sql(s"CALL $cat.other_ns.vacuum('$t')"))
      // guard errors propagate from the primitive (fork of a branch ref)
      spark.sql(s"CALL $cat.system.create_branch('$t', 'b1')")
      val e2 = intercept[Exception](
        spark.sql(s"CALL $cat.system.create_branch('$t', 'b1')"))
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
    }
  }
}
