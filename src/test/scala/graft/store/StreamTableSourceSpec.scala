package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.TempDirs

/** The keyed table as a Structured Streaming source (#11af): manifest
  * versions are the offsets, each micro-batch reads exactly the files
  * its commit window added, checkpoints resume incrementally, and
  * non-additive windows fail loudly toward the changelog. */
class StreamTableSourceSpec extends SparkSpec {

  private lazy val wh: String = TempDirs.tempDir("graft-streamsrc")

  private def df(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "name", "v")
  }

  private def drain(t: String, out: String, ck: String,
                    since: Option[Long] = None): Unit =
    KeyedTableStream.readStream(spark, wh, t, since)
      .drop(KeyedTable.BucketCol)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

  private def ids(path: String): Set[Long] = {
    val f = new java.io.File(path)
    if (!f.exists() || f.listFiles() == null) Set.empty
    else spark.read.parquet(path).select("id").collect()
      .map(_.getLong(0)).toSet
  }

  test("AvailableNow drains the snapshot; a restart reads only new commits") {
    val t = "t_stream_inc"
    val out = TempDirs.tempDir("graft-streamsrc-out")
    val ck = TempDirs.tempDir("graft-streamsrc-ck")
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 4) // v0
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v1
    drain(t, out, ck)
    assert(ids(out) == Set(1L, 2L, 3L))
    // append after the drain: the checkpointed cursor (v1) makes the
    // second run consume ONLY v2's files — no re-delivery
    KeyedTable.toSql(df((4L, "d", 4.0), (5L, "e", 5.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v2
    drain(t, out, ck)
    val all = spark.read.parquet(out).select("id").collect().map(_.getLong(0))
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // exactly once each
  }

  test("sinceVersion='latest'-style start: only commits after the cursor") {
    val t = "t_stream_since"
    val out = TempDirs.tempDir("graft-streamsrc-out2")
    val ck = TempDirs.tempDir("graft-streamsrc-ck2")
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2) // v0
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v1
    drain(t, out, ck, since = Some(1L)) // cursor at v1: nothing pending
    assert(ids(out) == Set.empty)
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v2
    drain(t, out, ck, since = Some(1L))
    assert(ids(out) == Set(3L))
  }

  test("maxVersionsPerTrigger drains in bounded steps, exactly once") {
    val t = "t_stream_rate"
    val out = TempDirs.tempDir("graft-streamsrc-out5")
    val ck = TempDirs.tempDir("graft-streamsrc-ck5")
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2) // v0
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v1
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v2
    val q = KeyedTableStream
      .readStream(spark, wh, t, maxVersionsPerTrigger = Some(1L))
      .drop(KeyedTable.BucketCol)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one version per micro-batch: (−1,0], (0,1], (1,2] = 3 data batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 3)
    val all = spark.read.parquet(out).select("id").collect().map(_.getLong(0))
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("maxFilesPerTrigger / maxBytesPerTrigger bound batches by ADDED volume") {
    val t = "t_stream_vol"
    // one bucket → each append adds exactly ONE file
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 1) // v0
    (2L to 4L).foreach(i => KeyedTable.toSql(df((i, s"r$i", i.toDouble)),
      wh, t, pk = Seq("id"), how = WriteMode.Append)) // v1..v3
    def drainWith(bytes: Option[Long], files: Option[Long]): (Int, Seq[Long]) = {
      val out = TempDirs.tempDir("graft-streamsrc-vout")
      val ck = TempDirs.tempDir("graft-streamsrc-vck")
      val q = KeyedTableStream.readStream(spark, wh, t,
          maxBytesPerTrigger = bytes, maxFilesPerTrigger = files)
        .drop(KeyedTable.BucketCol)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (q.recentProgress.count(_.numInputRows > 0),
        spark.read.parquet(out).select("id").collect()
          .map(_.getLong(0)).sorted.toSeq)
    }
    // 4 one-file versions under a 2-file budget: (−1,1], (1,3] — two
    // batches, every row exactly once
    val (nb2, rows2) = drainWith(None, Some(2L))
    assert(nb2 == 2, s"expected 2 batches, got $nb2")
    assert(rows2 == Seq(1L, 2L, 3L, 4L))
    // a 1-byte budget is smaller than ANY version: each trigger still
    // admits one version (bounded progress, never a stall) — 4 batches
    val (nb1, rows1) = drainWith(Some(1L), None)
    assert(nb1 == 4, s"expected 4 batches, got $nb1")
    assert(rows1 == Seq(1L, 2L, 3L, 4L))
  }

  test("filters apply ABOVE the stream scan (Spark pushes no filters into streaming scans)") {
    val t = "t_stream_skip"
    val out = TempDirs.tempDir("graft-streamsrc-out6")
    val ck = TempDirs.tempDir("graft-streamsrc-ck6")
    // one bucket → one file per commit, each with tight leading-PK stats
    KeyedTable.toSql(df((1L to 10L).map(i => (i, s"r$i", i.toDouble)): _*),
      wh, t, pk = Seq("id"), buckets = 1) // v0: ids 1..10
    KeyedTable.toSql(df((11L to 20L).map(i => (i, s"r$i", i.toDouble)): _*),
      wh, t, pk = Seq("id"), how = WriteMode.Append) // v1: ids 11..20
    val q = KeyedTableStream.readStream(spark, wh, t)
      .filter(org.apache.spark.sql.functions.col("id") >= 15L)
      .drop(KeyedTable.BucketCol)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(ids(out) == (15L to 20L).toSet)
    // pins Spark's CURRENT streaming contract: DSv2 filter pushdown is
    // a batch-optimizer rule, so streaming scans read every added file
    // and the filter runs above the source (numInputRows = all 20). If
    // a Spark upgrade starts pushing filters into streaming scans, the
    // source's manifest-stat file skipping activates and this becomes
    // 10 — update the claim in SURVEY #11af alongside this assert.
    assert(q.recentProgress.map(_.numInputRows).sum == 20L)
  }

  test("endingVersion bounds the replay window exactly, across drains") {
    val t = "t_stream_end"
    val out = TempDirs.tempDir("graft-streamsrc-out7")
    val ck = TempDirs.tempDir("graft-streamsrc-ck7")
    KeyedTable.toSql(df((1L, "a", 1.0)), wh, t, pk = Seq("id"), buckets = 2) // v0
    KeyedTable.toSql(df((2L, "b", 2.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v1
    KeyedTable.toSql(df((3L, "c", 3.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v2
    def drainTo(end: Long): Unit = KeyedTableStream
      .readStream(spark, wh, t, endingVersion = Some(end))
      .drop(KeyedTable.BucketCol)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    drainTo(1L) // (−1, 1]: v2's rows stay out
    assert(ids(out) == Set(1L, 2L))
    // a later commit doesn't leak past the bound either
    KeyedTable.toSql(df((4L, "d", 4.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Append) // v3
    drainTo(1L)
    assert(ids(out) == Set(1L, 2L))
    // raising the bound resumes from the checkpoint, exactly once
    drainTo(2L)
    assert(ids(out) == Set(1L, 2L, 3L))
  }

  test("a non-additive commit in the window fails loudly toward the changelog") {
    val t = "t_stream_nonadd"
    val out = TempDirs.tempDir("graft-streamsrc-out3")
    val ck = TempDirs.tempDir("graft-streamsrc-ck3")
    KeyedTable.toSql(df((1L, "a", 1.0), (2L, "b", 2.0)), wh, t,
      pk = Seq("id"), buckets = 2) // v0
    drain(t, out, ck)
    assert(ids(out) == Set(1L, 2L))
    KeyedTable.toSql(df((1L, "A", 10.0)), wh, t,
      pk = Seq("id"), how = WriteMode.Upsert) // v1 rewrites bucket files
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, out, ck)
    }
    def chain(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).toSeq
    assert(chain(e).exists(m =>
      m.contains("not append-only") && m.contains("readChangelog")))
  }

  test("streams through the SQL catalog handle too") {
    val t = "t_stream_cat"
    val out = TempDirs.tempDir("graft-streamsrc-out4")
    val ck = TempDirs.tempDir("graft-streamsrc-ck4")
    KeyedTable.toSql(df((7L, "g", 7.0), (8L, "h", 8.0)), wh, t,
      pk = Seq("id"), buckets = 2)
    val cat = "graft_streamspec"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.readStream.table(s"$cat.$t").drop(KeyedTable.BucketCol)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      assert(ids(out) == Set(7L, 8L))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }
}
