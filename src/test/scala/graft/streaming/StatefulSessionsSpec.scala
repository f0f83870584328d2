package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Sessionize

/** SURVEY.md §2 #33d: flatMapGroupsWithState sessionization emits each
  * closed session exactly once and converges to the batch operator. */
class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def startQuery(name: String, src: MemoryStream[(Long, Long)]) = {
    val df = src.toDF().toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    StatefulSessions.sessions(df, gapSeconds = 1800L, watermark = "1 second")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
  }

  test("closed sessions emit once; sessions spanning micro-batches merge; timeouts close idle keys") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Long)]
    val q = startQuery("stateful_sess", src)
    try {
      // timestamps start well above 0: the initial watermark is 0 and
      // rows at/below it would be dropped as late
      // batch 1: user 1 has an interior gap (closes one session in-batch)
      // and leaves (15000,15000) open
      src.addData((1L, 10000L), (1L, 10100L), (1L, 15000L))
      q.processAllAvailable()
      // batch 2: 15100 continues the open session across the batch edge
      src.addData((1L, 15100L))
      q.processAllAvailable()
      // batch 3: a far-future key pushes the watermark past 15100+gap
      src.addData((99L, 10000000L))
      q.processAllAvailable()
      // batch 4: any data triggers the timeout sweep for user 1
      src.addData((99L, 10000100L))
      q.processAllAvailable()

      val got = spark.table("stateful_sess")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 10000L, 10100L, 2L), (1L, 15000L, 15100L, 2L)))
    } finally q.stop()
  }

  test("streamed closed sessions match the batch operator on the events table") {
    implicit val sc = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("long").as("ts_s"))
      .as[(Long, Long)].collect()
    val src = MemoryStream[(Long, Long)]
    val q = startQuery("stateful_sess_eq", src)
    try {
      src.addData(ev.toSeq)
      q.processAllAvailable()
      // push the watermark far past the corpus, then tick the timeout sweep
      src.addData((-1L, 4102444800L))
      q.processAllAvailable()
      src.addData((-1L, 4102444900L))
      q.processAllAvailable()

      val streamed = spark.table("stateful_sess_eq")
        .filter(col("user_id") >= 0)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = Sessionize.gapSessions(
          Tables.events(spark, sfDir).select("event_id", "user_id", "ts"),
          "user_id", "ts", "event_id", 1800L)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
