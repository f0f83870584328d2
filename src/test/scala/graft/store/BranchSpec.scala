package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.TempDirs

/** Branches + write-audit-publish (#11al): fork is one manifest copy,
  * branch writes are ordinary mutations addressed as `t@branch`
  * sharing the base's data files, audit is snapshot-isolated reads of
  * the ref, publish is a guarded fast-forward flip. */
class BranchSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-branch")
  private val catN = new java.util.concurrent.atomic.AtomicLong()

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "g", "v")
  }

  private def ids(table: String): Seq[Long] =
    KeyedTable.readSql(spark, wh, table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("fork, write on the branch, audit: base is snapshot-isolated") {
    val t = "br_t1"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 4)
    val forkV = Branches.create(spark, wh, t, "audit")
    assert(forkV == 0L)
    // branch writes: an append and an upsert through the ordinary API
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@audit",
      pk = Seq("id"), how = WriteMode.Append)
    KeyedTable.toSql(df((2L, "B", 20.0)), wh, s"$t@audit",
      pk = Seq("id"), how = WriteMode.Upsert)
    // audit the branch; the base is untouched
    assert(ids(s"$t@audit") == Seq(1L, 2L, 3L))
    assert(KeyedTable.readSql(spark, wh, s"$t@audit")
      .filter(org.apache.spark.sql.functions.col("id") === 2L)
      .head().getDouble(2) == 20.0)
    assert(ids(t) == Seq(1L, 2L))
    assert(KeyedTable.readSql(spark, wh, t)
      .filter(org.apache.spark.sql.functions.col("id") === 2L)
      .head().getDouble(2) == 2.0)
    // listing
    val ls = Branches.list(spark, wh, t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ls == Seq(("audit", 0L, 2L)), s"got $ls")
  }

  test("SQL reads a branch ref through the catalog") {
    val t = "br_sql"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "wip")
    KeyedTable.toSql(df((9L, "z", 9.0)), wh, s"$t@wip",
      pk = Seq("id"), how = WriteMode.Append)
    val cat = s"graft_br${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      assert(spark.sql(s"SELECT * FROM $cat.`$t@wip`").count() == 2L)
      assert(spark.sql(s"SELECT * FROM $cat.$t").count() == 1L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("t$branches metadata table lists refs through SQL") {
    val t = "br_meta"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "b1")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@b1",
      pk = Seq("id"), how = WriteMode.Append)
    Branches.create(spark, wh, t, "b2")
    val cat = s"graft_br${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      val rows = spark.sql(
        s"SELECT branch, fork_version, head_version FROM $cat.`$t" + "$branches`")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq(("b1", 0L, 1L), ("b2", 0L, 0L)), s"got $rows")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("publish fast-forwards the base; a second WAP cycle continues") {
    val t = "br_wap"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "stage")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    val v1 = Branches.fastForward(spark, wh, t, "stage")
    assert(v1 == 1L)
    assert(ids(t) == Seq(1L, 2L))
    // cycle 2 on the SAME branch: the fork point advanced with publish
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    val v2 = Branches.fastForward(spark, wh, t, "stage")
    assert(v2 == 2L)
    assert(ids(t) == Seq(1L, 2L, 3L))
    // time travel on the base still resolves the pre-publish snapshot
    assert(KeyedTable.readSql(spark, wh, t, asOfVersion = Some(0L))
      .count() == 1L)
  }

  test("repeated no-op fastForward commits nothing, even after multi-commit cycles") {
    val t = "br_noop"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "stage")
    // TWO branch commits before publishing: branch head (3) and the
    // post-publish base version (2) now diverge numerically — the
    // nothing-new check must compare within the branch chain, or the
    // repeats below would commit redundant identical base snapshots
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    val published = Branches.fastForward(spark, wh, t, "stage")
    val history = Manifest.versions(spark, KeyedTable.tableDir(wh, t))
    assert(Branches.fastForward(spark, wh, t, "stage") == published)
    assert(Branches.fastForward(spark, wh, t, "stage") == published)
    assert(Manifest.versions(spark, KeyedTable.tableDir(wh, t)) == history,
      "no-op fastForward must not append to the base history")
    // the branch is still usable for the next real cycle
    KeyedTable.toSql(df((4L, "d", 4.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    assert(Branches.fastForward(spark, wh, t, "stage") == published + 1)
    assert(ids(t) == Seq(1L, 2L, 3L, 4L))
  }

  test("publish is refused after the base diverges; re-fork rebases") {
    val t = "br_div"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "stage")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    // base moves past the fork point
    KeyedTable.toSql(df((5L, "e", 5.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    val e = intercept[StoreException](
      Branches.fastForward(spark, wh, t, "stage"))
    assert(e.getMessage.contains("re-fork"), e.getMessage)
    // base kept its own write; branch kept its own
    assert(ids(t) == Seq(1L, 5L))
    assert(ids(s"$t@stage") == Seq(1L, 2L))
    // schema drift alone (metadata-only addColumns) also blocks publish
    Branches.drop(spark, wh, t, "stage")
    Branches.create(spark, wh, t, "stage2")
    KeyedTable.toSql(df((7L, "g", 7.0)), wh, s"$t@stage2",
      pk = Seq("id"), how = WriteMode.Append)
    KeyedTable.addColumns(spark, wh, t, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.DoubleType)))
    val e2 = intercept[StoreException](
      Branches.fastForward(spark, wh, t, "stage2"))
    assert(e2.getMessage.contains("metadata changed"), e2.getMessage)
  }

  test("drop + vacuum reap branch-only files; shared files survive") {
    val t = "br_gc"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "tmp")
    KeyedTable.toSql(df((3L, "c", 3.0), (4L, "d", 4.0)), wh, s"$t@tmp",
      pk = Seq("id"), how = WriteMode.Append)
    val data = new Path(KeyedTable.tableDir(wh, t), "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles: Int = fs.listStatus(data)
      .filter(_.getPath.getName.startsWith("pb_bucket="))
      .map(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet"))).sum
    val withBranch = nFiles
    // while the branch lives, vacuum must NOT reap its files
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    assert(nFiles == withBranch, "vacuum reaped live branch files")
    assert(ids(s"$t@tmp") == Seq(1L, 2L, 3L, 4L))
    Branches.drop(spark, wh, t, "tmp")
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    assert(nFiles < withBranch, "dropped branch's files were not reaped")
    // the base is whole
    assert(ids(t) == Seq(1L, 2L))
    intercept[Exception](
      KeyedTable.readSql(spark, wh, s"$t@tmp").collect())
  }

  test("guards: create-on-branch-ref, vacuum-on-ref, CDC publish, bad refs") {
    val t = "br_guard"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    // a branch must fork, not be created like a table
    val e1 = intercept[StoreException](
      KeyedTable.toSql(df((1L, "a", 1.0)), wh, s"$t@nope", pk = Seq("id")))
    assert(e1.getMessage.contains("fork", 0) ||
      e1.getMessage.toLowerCase.contains("fork"), e1.getMessage)
    intercept[StoreException](
      KeyedTable.vacuum(spark, wh, s"$t@x", olderThanMs = 0L))
    intercept[StoreException](KeyedTable.splitRef(s"$t@"))
    intercept[StoreException](KeyedTable.splitRef(s"$t@a@b"))
    intercept[StoreException](
      Branches.create(spark, wh, t, "Bad Name!"))
    intercept[StoreException](Branches.drop(spark, wh, t, "missing"))
  }

  test("CDC publish across a branch SCHEMA CHANGE: images carry the evolved columns") {
    import org.apache.spark.sql.functions.{col, row_number}
    val t = "br_cdc_evolve"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    // a PRE-evolution batch in the base log (must merge as NULL images)
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    Branches.create(spark, wh, t, "cdc")
    KeyedTable.addColumns(spark, wh, s"$t@cdc", Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.DoubleType)))
    import spark.implicits._
    KeyedTable.toSql(Seq((2L, "B", 20.0, 0.5), (9L, "z", 9.0, 0.9))
      .toDF("id", "g", "v", "extra"), wh, s"$t@cdc",
      pk = Seq("id"), how = WriteMode.Upsert)
    Branches.fastForward(spark, wh, t, "cdc")
    // the base converged on the branch head under the evolved schema
    val base = KeyedTable.readSql(spark, wh, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1).toSeq
    assert(base == Seq((1L, "a", 1.0, -1.0), (2L, "B", 20.0, 0.5),
      (3L, "c", 3.0, -1.0), (9L, "z", 9.0, 0.9)), base.toString)
    // the publish batch carries the evolved column set; the batch
    // logged BEFORE the evolution reads NULL for it (mergeSchema)
    val log = KeyedTable.readChangelog(spark, wh, t)
    assert(log.columns.contains("old_extra") &&
      log.columns.contains("new_extra"), log.columns.mkString(","))
    val img = log
      .select("id", "op", "old_extra", "new_extra").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(img((2L, "update", -1.0, 0.5)), img.toString) // born at publish
    assert(img((9L, "insert", -1.0, 0.9)), img.toString)
    assert(img((3L, "insert", -1.0, -1.0)), img.toString) // pre-birth batch
    // FOLDING CONSUMER: last image per id over the merged log equals
    // the published state for every logged id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("batch").desc)
    val folded = log.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1 && col("op") =!= "delete")
      .select("id", "new_g", "new_v", "new_extra").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1).toSeq
    assert(folded == base.filter(_._1 != 1L), // id=1 predates the log
      s"folded=$folded base=$base")
  }

  test("WAP + CDC: a publish logs the exact image batch its flip represents") {
    val t = "br_wap_cdc"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)),
      wh, t, pk = Seq("id"), buckets = 2)
    KeyedTable.setChangelog(spark, wh, t, enabled = true)
    Branches.create(spark, wh, t, "stage")
    // mutate the BRANCH: update id=2, delete id=3, insert id=4 — three
    // commits on the branch become ONE image batch at publish
    KeyedTable.toSql(df((2L, "B", 20.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Upsert)
    KeyedTable.delete(spark, wh, s"$t@stage",
      org.apache.spark.sql.functions.col("id") === 3L)
    KeyedTable.toSql(df((4L, "d", 4.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    Branches.fastForward(spark, wh, t, "stage")
    // the base's state is the branch head
    assert(ids(t) == Seq(1L, 2L, 4L))
    // and the base's changelog carries exactly the publish's images —
    // the folding consumer lands on the published state
    val log = KeyedTable.readChangelog(spark, wh, t)
      .select("id", "op", "old_v", "new_v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1).toSeq
    assert(log == Seq(
      (2L, "update", 2.0, 20.0),
      (3L, "delete", 3.0, -1.0),
      (4L, "insert", -1.0, 4.0)), log.toString)
    // a second WAP cycle on the same branch keeps logging
    KeyedTable.delete(spark, wh, s"$t@stage",
      org.apache.spark.sql.functions.col("id") === 1L)
    Branches.fastForward(spark, wh, t, "stage")
    assert(ids(t) == Seq(2L, 4L))
    val ops = KeyedTable.readChangelog(spark, wh, t)
      .select("id", "op", "batch").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ops.contains((1L, "delete")))
  }

  test("SQL DML on a branch ref mutates the BRANCH, never the base") {
    val t = "br_dml"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "wip")
    val cat = s"graft_br${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"INSERT INTO $cat.`$t@wip` VALUES (3, 'c', 3.0, NULL)")
      spark.sql(s"UPDATE $cat.`$t@wip` SET v = v * 10 WHERE id = 1")
      spark.sql(s"DELETE FROM $cat.`$t@wip` WHERE id = 2")
      import spark.implicits._
      Seq((3L, "C", 30.0, false)).toDF("id", "g", "v", "is_del")
        .createOrReplaceTempView("br_dml_feed")
      spark.sql(s"""
        MERGE INTO $cat.`$t@wip` AS t USING br_dml_feed AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET g = s.g, v = s.v
        WHEN NOT MATCHED THEN INSERT (id, g, v) VALUES (s.id, s.g, s.v)
      """)
      val br = KeyedTable.readSql(spark, wh, s"$t@wip")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(br == Set((1L, "a", 10.0), (3L, "C", 30.0)), s"got $br")
      // the BASE saw none of it
      val base = KeyedTable.readSql(spark, wh, t)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(base == Set((1L, "a", 1.0), (2L, "b", 2.0)), s"got $base")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("streaming from a branch ref follows the BRANCH's commits") {
    val t = "br_stream"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "feed")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@feed",
      pk = Seq("id"), how = WriteMode.Append)
    // base moves too — its commit must NOT appear in the branch stream
    KeyedTable.toSql(df((9L, "z", 9.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    val out = java.nio.file.Files.createTempDirectory("br-stream-out").toString
    val q = spark.readStream.format(classOf[KeyedTableSource].getName)
      .option("warehouse", wh).option("table", s"$t@feed").load()
      .writeStream.format("memory").queryName("br_stream_mem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/ckpt")
      .start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT id FROM br_stream_mem")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"got $got")
  }

  test("incremental audit: readIncremental on a branch yields exactly its delta") {
    val t = "br_incr"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    val fork = Branches.create(spark, wh, t, "stage")
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    KeyedTable.toSql(df((4L, "d", 4.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Append)
    // base commits after the fork must NOT leak into the branch window
    KeyedTable.toSql(df((9L, "z", 9.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    val delta = KeyedTable.readIncremental(spark, wh, s"$t@stage", fork)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(delta == Seq(3L, 4L), s"got $delta")
  }

  test("vacuum expires old branch manifests but never current/fork/tagged") {
    val t = "br_expire"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "long") // fork at v0
    (2L to 5L).foreach(i =>
      KeyedTable.toSql(df((i, "x", i.toDouble)), wh, s"$t@long",
        pk = Seq("id"), how = WriteMode.Append)) // branch v1..v4
    KeyedTable.tagSnapshot(spark, wh, s"$t@long", "mid", version = Some(2L))
    val brDir = KeyedTable.tableDir(wh, s"$t@long")
    val mdir = Manifest.dir(brDir)
    val fs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def versions: Seq[String] = fs.listStatus(mdir)
      .map(_.getPath.getName).filter(Manifest.isVersionName).sorted.toSeq
    assert(versions.size == 5) // v0 (fork copy) .. v4
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    // kept: v0 (fork), v2 (tagged), v4 (current); expired: v1, v3
    assert(versions == Seq(0L, 2L, 4L).map(Manifest.versionName),
      s"got $versions")
    // the audit diff and the branch read both still resolve
    assert(KeyedTable.readSql(spark, wh, s"$t@long").count() == 5L)
    assert(KeyedTable.readIncremental(spark, wh, s"$t@long", 0L)
      .count() == 4L)
  }

  test("snapshotDiff on a branch against its fork is the WAP audit report") {
    val t = "br_diff"
    KeyedTable.toSql(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF,
      wh, t, pk = Seq("id"), buckets = 4)
    val fork = Branches.create(spark, wh, t, "stage")
    KeyedTable.toSql(df((2L, "B", 20.0), (9L, "z", 9.0)), wh, s"$t@stage",
      pk = Seq("id"), how = WriteMode.Upsert)
    KeyedTable.delete(spark, wh, s"$t@stage",
      org.apache.spark.sql.functions.col("id") === 3L)
    val diff = KeyedTable.snapshotDiff(spark, wh, s"$t@stage", fork)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(diff == Set((2L, "update"), (9L, "insert"), (3L, "delete")),
      s"got $diff")
    // unchanged row 1 never appears; the base's diff is empty
    assert(KeyedTable.snapshotDiff(spark, wh, t, fork).count() == 0L)
  }

  test("a torn fork (no meta marker) is invisible and the re-fork cleans it") {
    val t = "br_torn"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    // simulate a crash between the manifest copy and the meta marker:
    // fork record + manifest exist, _graft_meta does not
    val brDir = KeyedTable.tableDir(wh, s"$t@torn")
    val fs = new org.apache.hadoop.fs.Path(brDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(Manifest.dir(brDir))
    val out = fs.create(new org.apache.hadoop.fs.Path(brDir, "_fork"), true)
    out.write("""{"baseVersion":0,"baseMetaJson":"{}"}""".getBytes("UTF-8"))
    out.close()
    // invisible: not listed, vacuum unaffected
    assert(Branches.list(spark, wh, t).count() == 0L)
    KeyedTable.vacuum(spark, wh, t, olderThanMs = 0L)
    // the re-fork cleans the torn dir and succeeds
    assert(Branches.create(spark, wh, t, "torn") == 0L)
    assert(KeyedTable.readSql(spark, wh, s"$t@torn").count() == 1L)
  }

  test("restore on a branch ref rolls the BRANCH back; base untouched") {
    val t = "br_restore"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    val fork = Branches.create(spark, wh, t, "wip")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@wip",
      pk = Seq("id"), how = WriteMode.Append)
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@wip",
      pk = Seq("id"), how = WriteMode.Append)
    // metadata-only restore WITHIN the branch chain, back to the fork
    KeyedTable.restoreSnapshot(spark, wh, s"$t@wip", version = Some(fork))
    assert(ids(s"$t@wip") == Seq(1L))
    assert(ids(t) == Seq(1L))
    // the branch keeps working after the restore
    KeyedTable.toSql(df((9L, "z", 9.0)), wh, s"$t@wip",
      pk = Seq("id"), how = WriteMode.Append)
    assert(ids(s"$t@wip") == Seq(1L, 9L))
  }

  test("snapshotDiff across a rebucket falls back to the full diff") {
    val t = "br_diff_rebucket"
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    KeyedTable.toSql(df((2L, "B", 20.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Upsert)
    KeyedTable.rebucket(spark, wh, t, 4) // bucket ids incomparable now
    KeyedTable.toSql(df((5L, "e", 5.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append)
    val diff = KeyedTable.snapshotDiff(spark, wh, t, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(diff == Set((2L, "update"), (5L, "insert")), s"got $diff")
  }

  test("two publishers race: one wins the lock, the loser fails cleanly") {
    val t = "br_race"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "s1")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@s1",
      pk = Seq("id"), how = WriteMode.Append)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val racers = Seq(
        Future(scala.util.Try(Branches.fastForward(spark, wh, t, "s1"))),
        Future(scala.util.Try(Branches.fastForward(spark, wh, t, "s1"))))
      val results = Await.result(Future.sequence(racers), 2.minutes)
      // at least one publish succeeded; a loser (if any) failed on the
      // lock or on the advanced fork point — never a torn base
      assert(results.exists(_.isSuccess), results.toString)
    } finally pool.shutdown()
    assert(ids(t) == Seq(1L, 2L))
  }

  test("optimistic appendConcurrent lands on a branch ref") {
    val t = "br_capp"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "opt")
    KeyedTable.appendConcurrent(df((2L, "b", 2.0), (3L, "c", 3.0)),
      wh, s"$t@opt")
    assert(ids(s"$t@opt") == Seq(1L, 2L, 3L))
    assert(ids(t) == Seq(1L))
  }

  test("CHECK constraints travel with the fork and guard branch writes") {
    val t = "br_check"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    KeyedTable.addCheckConstraint(spark, wh, t, "v_pos", "v >= 0")
    Branches.create(spark, wh, t, "chk")
    val e = intercept[StoreException] {
      KeyedTable.toSql(df((2L, "b", -5.0)), wh, s"$t@chk",
        pk = Seq("id"), how = WriteMode.Append)
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(ids(s"$t@chk") == Seq(1L))
    // a passing write still lands
    KeyedTable.toSql(df((2L, "b", 5.0)), wh, s"$t@chk",
      pk = Seq("id"), how = WriteMode.Append)
    assert(ids(s"$t@chk") == Seq(1L, 2L))
  }

  test("a branch keeps its own CDC changelog; tags resolve via SQL on the ref") {
    val t = "br_cdc"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "log")
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, s"$t@log",
      pk = Seq("id"), how = WriteMode.Upsert, changelog = true)
    val log = KeyedTable.readChangelog(spark, wh, s"$t@log")
      .select("id", "op").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(log == Set((2L, "insert")), s"got $log")
    // the BASE has no changelog
    intercept[StoreException](KeyedTable.readChangelog(spark, wh, t))
    // tag the branch head; SQL time travel on the ref resolves it
    KeyedTable.tagSnapshot(spark, wh, s"$t@log", "cut")
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@log",
      pk = Seq("id"), how = WriteMode.Append)
    val cat = s"graft_br${catN.incrementAndGet()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      assert(spark.sql(
        s"SELECT * FROM $cat.`$t@log` VERSION AS OF 'cut'").count() == 2L)
      assert(spark.sql(s"SELECT * FROM $cat.`$t@log`").count() == 3L)
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("base and branch writers commit concurrently on different locks") {
    val t = "br_conc"
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2)
    Branches.create(spark, wh, t, "side")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val a = Future(KeyedTable.toSql(df((2L, "b", 2.0)), wh, t,
        pk = Seq("id"), how = WriteMode.Append))
      val b = Future(KeyedTable.toSql(df((3L, "c", 3.0)), wh, s"$t@side",
        pk = Seq("id"), how = WriteMode.Append))
      Await.result(Future.sequence(Seq(a, b)), 2.minutes)
    } finally pool.shutdown()
    assert(ids(t) == Seq(1L, 2L))
    assert(ids(s"$t@side") == Seq(1L, 3L))
  }
}
