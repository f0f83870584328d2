package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2 #33e: watermarked stream-stream interval join pairs
  * anchors with in-window followers and converges to the batch
  * range-join semantics. */
class IntervalJoinStreamSpec extends SparkSpec {

  import spark.implicits._

  test("interval join pairs in-window same-key rows across micro-batches, bounded state") {
    implicit val sc = spark.sqlContext
    val anchors = MemoryStream[(Long, Long, Long)]   // (a_id, a_key, a_s)
    val followers = MemoryStream[(Long, Long, Long)] // (f_id, f_key, f_s)
    val joined = StreamingIngest.intervalJoinStream(
      anchors.toDF().toDF("a_id", "a_key", "a_s")
        .withColumn("a_ts", col("a_s").cast("timestamp")),
      followers.toDF().toDF("f_id", "f_key", "f_s")
        .withColumn("f_ts", col("f_s").cast("timestamp")),
      leftKey = "a_key", rightKey = "f_key",
      leftTime = "a_ts", rightTime = "f_ts",
      windowSeconds = 900L, watermark = "1 second")
      .select("a_id", "f_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      // batch 1: anchor at t=10000 for key 7; in-window follower at 10500,
      // boundary follower at 10900 (= t+900, included), same-instant
      // follower at 10000 (excluded: strictly after)
      anchors.addData((1L, 7L, 10000L))
      followers.addData((101L, 7L, 10500L), (102L, 7L, 10900L), (103L, 7L, 10000L))
      q.processAllAvailable()
      // batch 2: late-but-in-window follower arrives a micro-batch later;
      // out-of-window follower at 10901; wrong-key follower at 10500
      followers.addData((104L, 7L, 10600L), (105L, 7L, 10901L), (106L, 8L, 10500L))
      q.processAllAvailable()

      val got = spark.table("ivj").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 101L), (1L, 102L), (1L, 104L)))
    } finally q.stop()
  }

  test("the join plan carries watermarks on both sides (state is evictable)") {
    implicit val sc = spark.sqlContext
    val anchors = MemoryStream[(Long, Long)]
    val followers = MemoryStream[(Long, Long)]
    val joined = StreamingIngest.intervalJoinStream(
      anchors.toDF().toDF("a_key", "a_s").withColumn("a_ts", col("a_s").cast("timestamp")),
      followers.toDF().toDF("f_key", "f_s").withColumn("f_ts", col("f_s").cast("timestamp")),
      "a_key", "f_key", "a_ts", "f_ts", windowSeconds = 60L, watermark = "1 second")
    // both eventTimeWatermark nodes must survive into the analyzed plan —
    // without them Append-mode stream-stream join state grows forever
    val wmCount = joined.queryExecution.analyzed.collect {
      case p if p.nodeName == "EventTimeWatermark" => p
    }.size
    assert(wmCount == 2)
  }
}
