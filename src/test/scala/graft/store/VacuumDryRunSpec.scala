package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.{SparkSpec, TempDirs}

/** `vacuum(dryRun = true)` — the Delta VACUUM DRY RUN move: the
  * identical decision tree (including the liveness union computed as
  * if the age-expired manifests were gone), zero deletes, and a count
  * that PREDICTS the real run. */
class VacuumDryRunSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-vdry")

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  /** Every path under the table dir (files and dirs), relative. */
  private def tree(t: String): Set[String] = {
    val root = new Path(KeyedTable.tableDir(wh, t))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val rel = st.getPath.toString.stripPrefix(root.toString)
        if (st.isDirectory) rel +: walk(st.getPath) else Seq(rel)
      }
    walk(root).toSet
  }

  test("dry run deletes nothing and predicts the real reap exactly") {
    val t = "t_vdry"
    KeyedTable.toSql(df((1L, "a"), (2L, "b"), (3L, "c")), wh, t,
      pk = Seq("id"), buckets = 2)
    // two upserts: superseded bucket files + two expirable manifests
    KeyedTable.toSql(df((2L, "B")), wh, t, how = WriteMode.Upsert)
    KeyedTable.toSql(df((3L, "C")), wh, t, how = WriteMode.Upsert)
    // plus an abandoned staging dir a crashed write would leave
    val dir = KeyedTable.tableDir(wh, t)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir, ".staging-upsert-deadbeef"))
    val before = tree(t)
    val predicted = KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L,
      dryRun = true)
    assert(predicted > 0, "fixture must have garbage to predict")
    assert(tree(t) == before, "dry run must not touch the filesystem")
    // table still reads whole, history intact
    assert(KeyedTable.readSql(spark, wh, t).count() == 3L)
    val real = KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    assert(real == predicted,
      s"dry run predicted $predicted, real reap removed $real")
    // a second dry run over the clean table predicts zero
    assert(KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L,
      dryRun = true) == 0)
    assert(KeyedTable.readSql(spark, wh, t)
      .select("name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("B", "C", "a"))
  }

  test("a zero-age vacuum never reaps FRESH staging of the unlocked " +
      "stagers; stale staging and retired dirs still reap") {
    val t = "t_vdry_floor"
    KeyedTable.toSql(df((1L, "a"), (2L, "b")), wh, t, pk = Seq("id"),
      buckets = 2)
    val dir = KeyedTable.tableDir(wh, t)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // every unlocked stager's prefix, FRESH — a mid-stage optimistic
    // verb / maintenance rewrite / changelog batch an aggressive
    // vacuum must not reap out from under its commit
    val freshDirs = Seq(".staging-upsertc-x", ".staging-updatec-x",
      ".staging-updatec-dv-x", ".staging-mergec-x", ".staging-deletec-x",
      ".staging-changelog-x", ".staging-compact-x", ".staging-zorder-x",
      ".staging-rebucket-x", ".staging-append-x")
    freshDirs.foreach(d => fs.mkdirs(new Path(dir, d)))
    // a STALE stager (past the WriteLock.DefaultStaleMs floor) and an
    // old retired dir are genuine crash garbage: both reap
    val stale = new Path(dir, ".staging-upsertc-stale")
    val retired = new Path(dir, ".retired-old")
    fs.mkdirs(stale)
    fs.mkdirs(retired)
    fs.setTimes(stale, 1000L, -1)
    fs.setTimes(retired, 1000L, -1)
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L): Unit
    freshDirs.foreach(d => assert(fs.exists(new Path(dir, d)),
      s"$d is mid-stage (fresh) and must survive a zero-age vacuum"))
    assert(!fs.exists(stale), "stale staging past the floor must reap")
    assert(!fs.exists(retired), "old retired dirs must reap")
    freshDirs.foreach(d => fs.delete(new Path(dir, d), true))
  }

  test("the unlocked liveness walk: a tag landed mid-walk re-protects " +
      "a predicted-expired snapshot's files") {
    val t = "t_vdry_tagwin"
    KeyedTable.toSql(df((1L, "a"), (2L, "b"), (3L, "c")), wh, t,
      pk = Seq("id"), buckets = 2) // v0
    KeyedTable.toSql(df((2L, "B2")), wh, t, how = WriteMode.Upsert) // v1
    KeyedTable.toSql(df((3L, "C3")), wh, t, how = WriteMode.Upsert) // v2
    // the pre-walk predicts v0/v1 expired (zero age, untagged) and
    // marks their unique files candidates; the tag lands INSIDE the
    // window — the locked delta must re-protect v0's references
    KeyedTable.VacuumHooks.betweenPhases = () =>
      KeyedTable.tagSnapshot(spark, wh, t, "pin0", Some(0L)): Unit
    try KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L): Unit
    finally KeyedTable.VacuumHooks.betweenPhases = () => ()
    // the tagged snapshot still reads back whole
    val v0 = KeyedTable.readSql(spark, wh, t, asOfTag = Some("pin0"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("name"))
      .toMap
    assert(v0 == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      "the mid-walk tag must keep v0 fully readable")
    // and the head is untouched
    assert(KeyedTable.readSql(spark, wh, t).collect()
      .map(_.getAs[String]("name")).sorted.toSeq == Seq("B2", "C3", "a"))
  }

  test("the unlocked liveness walk: an optimistic append committed " +
      "mid-walk is untouched by the reap") {
    val t = "t_vdry_appwin"
    KeyedTable.toSql(df((1L, "a"), (2L, "b")), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.toSql(df((2L, "B")), wh, t, how = WriteMode.Upsert)
    KeyedTable.VacuumHooks.betweenPhases = () =>
      KeyedTable.appendConcurrent(df((50L, "mid")), wh, t)
    try KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L): Unit
    finally KeyedTable.VacuumHooks.betweenPhases = () => ()
    val got = KeyedTable.readSql(spark, wh, t).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 50L -> "mid"),
      "the mid-walk commit's rows survive the reap")
  }

  test("dry run through CALL graft.system.vacuum(dry_run => true)") {
    val t = "t_vdry_sql"
    KeyedTable.toSql(df((1L, "a")), wh, t, pk = Seq("id"), buckets = 2)
    KeyedTable.toSql(df((1L, "A")), wh, t, how = WriteMode.Upsert)
    val cat = "graft_vdry_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val before = tree(t)
      val n = spark.sql(
        s"CALL $cat.system.vacuum('$t', older_than_ms => 0, dry_run => true)")
        .head().getInt(0)
      assert(n > 0 && tree(t) == before)
      val real = spark.sql(
        s"CALL $cat.system.vacuum('$t', older_than_ms => 0)")
        .head().getInt(0)
      assert(real == n)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
