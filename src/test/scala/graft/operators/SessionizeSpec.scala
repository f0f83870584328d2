package graft.operators

import graft.{SparkSpec, Tables}

/** Specs for #18c: the salted two-phase sessionization must be
  * indistinguishable from the one-window form. */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "session_no", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("salted == plain on the events table (1-day chunks, 30-min gap)") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val plain = Sessionize.gapSessions(ev, "user_id", "ts", "event_id", 1800L)
    val salted = Sessionize.gapSessionsSalted(ev, "user_id", "ts", "event_id", 1800L, 86400L)
    assert(rows(plain) == rows(salted))
    assert(rows(plain).nonEmpty)
  }

  test("salted == plain even with a pathological chunk barely wider than the gap") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val plain = Sessionize.gapSessions(ev, "user_id", "ts", "event_id", 1800L)
    val salted = Sessionize.gapSessionsSalted(ev, "user_id", "ts", "event_id", 1800L, 2000L)
    assert(rows(plain) == rows(salted))
  }

  test("a session straddling many chunk edges stitches back into one") {
    // one hot key, an event every 100 s for 10 chunks of 1000 s:
    // every chunk boundary splits locally, phase 2 must re-merge
    val ev = (0 until 100)
      .map(i => (i.toLong, 1L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(i * 100L))))
      .toDF("event_id", "user_id", "ts")
    val out = rows(Sessionize.gapSessionsSalted(ev, "user_id", "ts", "event_id",
      gapSeconds = 1800L, chunkSeconds = 1000L))
    assert(out == Set((1L, 1L, 0L, 9900L, 100L)))
  }

  test("gaps inside a chunk still split; numbering stays time-ordered") {
    val ts = Seq(0L, 100L, 5000L, 5100L, 86400L * 3, 86400L * 3 + 10)
    val ev = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, 7L, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(t))) }
      .toDF("event_id", "user_id", "ts")
    val out = rows(Sessionize.gapSessionsSalted(ev, "user_id", "ts", "event_id",
      gapSeconds = 1800L, chunkSeconds = 86400L))
    assert(out == Set(
      (7L, 1L, 0L, 100L, 2L),
      (7L, 2L, 5000L, 5100L, 2L),
      (7L, 3L, 86400L * 3, 86400L * 3 + 10, 2L)))
  }
}
