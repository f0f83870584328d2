package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.store.KeyedTable

/** SURVEY.md §2 #33g: the streaming per-window top-k emits, for every
  * watermark-finalized window, exactly the batch top-k of that window —
  * and windows are ranked only once finalized (append semantics), so a
  * stored ranking is never retracted. */
class StreamingTrendingSpec extends SparkSpec {

  import spark.implicits._

  test("finalized windows carry the batch top-3; unfinalized windows are absent") {
    val root = Files.createTempDirectory("graft-trend").toString
    val inDir = s"$root/in"
    val wh = s"$root/wh"
    val ckpt = s"$root/ckpt"
    val k = 3

    val events = Tables.events(spark, sfDir).select("ts", "event_type")
    events.repartition(4).write.parquet(inDir)
    def stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "2").parquet(inDir)

    // run 1: the corpus itself — the tail windows stay open (watermark
    // is max(ts) − 1h, so at least the final window cannot finalize)
    StreamingIngest.trendingTopK(stream, wh, "trend", ckpt,
      k = k, watermark = "1 hour").awaitTermination()
    val afterFirst = KeyedTable.readSql(spark, wh, "trend")
      .select("win_start").distinct().collect().length

    // run 2: one sentinel event far past the corpus pushes the
    // watermark beyond every original window end → all original
    // windows finalize and rank
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = new Timestamp(maxTs.getTime + 30L * 86400 * 1000)
    Seq((sentinel, "flush")).toDF("ts", "event_type")
      .write.mode("append").parquet(inDir)
    StreamingIngest.trendingTopK(stream, wh, "trend", ckpt,
      k = k, watermark = "1 hour").awaitTermination()

    val stored = KeyedTable.readSql(spark, wh, "trend")
      .select("win_start", "rank", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

    // batch twin over the original events: per hour-window counts,
    // rank by (count desc, type), top 3
    import org.apache.spark.sql.expressions.Window
    val expected = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("win_start"))
          .orderBy(col("n_events").desc, col("event_type"))))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getTimestamp(0), r.getInt(3), r.getString(1), r.getLong(2)))
      .toSet

    assert(stored == expected,
      s"missing=${(expected -- stored).take(5)} extra=${(stored -- expected).take(5)}")
    assert(afterFirst < expected.map(_._1).size || afterFirst < stored.size,
      "run 1 must not have finalized every window (append semantics)")
  }
}
