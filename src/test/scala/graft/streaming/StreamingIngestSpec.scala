package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.store.KeyedTable

/** SURVEY.md §2 #33: streaming ingest converges to the batch windowed
  * aggregation (#18), including an incremental second run that updates
  * already-written windows through the upsert sink. */
class StreamingIngestSpec extends SparkSpec {

  test("file-stream → windowed agg → foreachBatch upsert matches batch; late data updates windows") {
    val root = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$root/in"
    val wh = s"$root/wh"
    val ckpt = s"$root/ckpt"

    // Large watermark: this corpus spans a month and files arrive in
    // arbitrary ts order, so nothing may be state-evicted mid-test.
    val wm = "90 days"

    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "event_type", "value")
    val (first, second) = (events.filter(col("event_id") % 5 =!= 0),
                           events.filter(col("event_id") % 5 === 0))

    first.repartition(4).write.parquet(inDir)
    def stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)

    val q1 = StreamingIngest.start(stream, wh, "win_agg", ckpt, watermark = wm)
    q1.awaitTermination()

    def stored() = KeyedTable.readSql(spark, wh, "win_agg")
      .select("win_start", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    def batchExpected(df: org.apache.spark.sql.DataFrame) =
      StreamingIngest.windowedAgg(df, watermark = wm)
        .select("win_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet

    assert(stored() == batchExpected(first))

    // second wave lands in already-written windows → upsert must replace
    second.repartition(2).write.mode("append").parquet(inDir)
    val q2 = StreamingIngest.start(stream, wh, "win_agg", ckpt, watermark = wm)
    q2.awaitTermination()

    assert(stored() == batchExpected(events))
  }

  test("streaming session_window matches batch gap-based sessionization") {
    val root = Files.createTempDirectory("graft-sess").toString
    val inDir = s"$root/in"
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "value")
    events.repartition(4).write.parquet(inDir)

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = StreamingIngest.sessionizedAgg(stream, watermark = "90 days")
      .writeStream.format("memory").queryName("sess").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    // streaming sessions per user must equal the batch lag-based count,
    // and per-session event totals must agree
    val streamed = spark.table("sess")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.Analytics.eventsSessionized(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("stream-static enrichment joins each micro-batch against a keyed-table dim") {
    val root = Files.createTempDirectory("graft-enrich").toString
    val inDir = s"$root/in"
    val wh = s"$root/wh"
    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "value")
    events.repartition(4).write.parquet(inDir)
    // dimension: the customer table stored as a keyed table
    KeyedTable.toSql(Tables.customer(spark, sfDir), wh, "customer",
      pk = Seq("c_custkey"))
    val dim = KeyedTable.readSql(spark, wh, "customer")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = StreamingIngest.enrichStream(stream, dim,
        leftKey = "user_id", rightKey = "c_custkey",
        rightCols = Seq("c_mktsegment", "c_name"))
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("enriched")
    assert(got.count() == events.count()) // left-outer: no event dropped
    val want = events.join(dim.select("c_custkey", "c_mktsegment", "c_name"),
        col("user_id") === col("c_custkey"), "left_outer")
      .drop("c_custkey").collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet == want)
    // matched rows exist (user ids draw from the customer key space)
    assert(got.filter(col("c_mktsegment").isNotNull).count() > 0)
  }

  test("text-analysis functions run unchanged on a stream (stateless narrow ops)") {
    import graft.functions.TextFunctions._
    val root = Files.createTempDirectory("graft-stext").toString
    val inDir = s"$root/in"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.repartition(4).write.parquet(inDir)

    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"), langId(col("text")).as("lang_pred"),
      round(qualityScore(col("text")), 4).as("quality"))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val q = score(stream)
      .writeStream.format("memory").queryName("stext").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(spark.table("stext").collect().map(_.toSeq).toSet ==
      score(docs).collect().map(_.toSeq).toSet)
  }

  test("streaming exact dedup: first doc per content hash survives, state bounded by watermark") {
    val root = Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$root/in"
    // events table as a stand-in corpus stream: props is the "text";
    // duplicate texts exist across event_ids (same props string)
    val docs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type").as("text"))
    docs.repartition(4).write.parquet(inDir)

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)
    val deduped = StreamingIngest.dedupStream(stream, watermark = "90 days")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("sdedup").select("content_hash").collect().map(_.getString(0))
    // exactly one surviving row per distinct content hash
    assert(out.length == out.distinct.length)
    assert(out.toSet == docs.select(md5(col("text"))).distinct()
      .collect().map(_.getString(0)).toSet)
  }
}
