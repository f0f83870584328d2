package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The salted gap-repair family (AsOf.ffillSalted / shiftDiffSalted /
  * interpolateSalted) must equal its plain forms ROW FOR ROW — these
  * specs drive a pathological hot key (one key owning most of the
  * stream, many chunks, whole-chunk null runs) plus crafted boundary
  * cases the random data can't guarantee (a chunk ending on a NULL
  * value right before a chunk boundary, leading/trailing nulls). */
class GapRepairSaltedSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private val chunkSeconds = 3600L
  private val base = ts("2024-01-01 00:00:00").getTime / 1000
  private def at(s: Long) = new java.sql.Timestamp((base + s) * 1000)

  /** Hot-key frame: key 1 holds 2000 rows over ~110 one-hour chunks,
    * keys 2..5 are sparse (some chunks empty, some all-null). Values
    * are null on a ~1/4 stride so null runs cross chunk boundaries. */
  private lazy val hotFrame = {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { i =>
      val t = rnd.nextInt(400000).toLong
      (10000L + i, 1L, at(t),
        if (i % 4 == 0 || (i > 500 && i < 560)) None else Some(i * 1.5))
    } ++ (1 to 60).flatMap { i =>
      (2L to 5L).map { k =>
        (20000L + i * 10 + k, k, at(rnd.nextInt(400000).toLong),
          if ((i + k) % 3 == 0) None else Some(i * 2.0 + k))
      }
    }
    rows.toDF("id", "k", "t", "v")
  }

  private def byId(df: org.apache.spark.sql.DataFrame, cols: String*): Map[Long, Seq[Any]] =
    df.select("id", cols: _*).collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(i => r.get(i)).toSeq)
      .toMap

  test("salted ffill equals plain ffill on a hot key with cross-chunk null runs") {
    val plain = byId(
      AsOf.ffill(hotFrame, Seq("k"), "t", "id", Seq("v")), "v")
    val salted = byId(
      AsOf.ffillSalted(hotFrame, Seq("k"), "t", "id", Seq("v"), chunkSeconds), "v")
    assert(salted === plain)
  }

  test("salted shift/diff equals plain, including null-valued previous rows") {
    val plain = byId(
      AsOf.shiftDiff(hotFrame, Seq("k"), "t", "id", Seq("v")), "prev_v", "delta_v")
    val salted = byId(
      AsOf.shiftDiffSalted(hotFrame, Seq("k"), "t", "id", Seq("v"), chunkSeconds),
      "prev_v", "delta_v")
    assert(salted === plain)
  }

  test("shift carry-in preserves a genuinely-NULL last row at the chunk boundary") {
    // chunk 0 ends on a NULL value; chunk 1's first row must see
    // prev = NULL (pandas shift), NOT skip back to the older non-null —
    // the exact case a coalesce-based carry would get wrong
    val df = Seq(
      (1L, 1L, at(100L), Some(10.0)),
      (2L, 1L, at(3500L), None: Option[Double]), // last row of chunk 0
      (3L, 1L, at(3700L), Some(30.0)),           // first row of chunk 1
      (4L, 1L, at(3900L), Some(40.0)),
    ).toDF("id", "k", "t", "v")
    val out = byId(
      AsOf.shiftDiffSalted(df, Seq("k"), "t", "id", Seq("v"), chunkSeconds),
      "prev_v", "delta_v")
    assert(out(3L) == Seq(null, null))
    assert(out(4L) == Seq(30.0, 10.0))
    val plain = byId(AsOf.shiftDiff(df, Seq("k"), "t", "id", Seq("v")),
      "prev_v", "delta_v")
    assert(out === plain)
  }

  test("salted interpolate equals plain bit-for-bit on the hot key") {
    // numeric time contract: epoch seconds as LONG, day-less chunks
    val num = hotFrame.selectExpr("id", "k", "CAST(t AS LONG) AS ts_s", "v")
    val plain = byId(
      AsOf.interpolate(num, Seq("k"), "ts_s", "id", "v"), "v_interp")
    val salted = byId(
      AsOf.interpolateSalted(num, Seq("k"), "ts_s", "id", "v", chunkSeconds),
      "v_interp")
    assert(salted === plain)
  }

  test("interpolate carry spans all-null chunks: leading nulls stay null, gaps bridge chunks") {
    val df = Seq(
      (1L, 1L, 100L, None: Option[Double]),  // leading null → stays null
      (2L, 1L, 200L, Some(10.0)),            // chunk 0 obs
      (3L, 1L, 3650L, None: Option[Double]), // chunk 1: all null
      (4L, 1L, 7300L, Some(20.0)),           // chunk 2 obs
      (5L, 1L, 9000L, None: Option[Double]), // trailing null → carries 20.0
    ).toDF("id", "k", "ts_s", "v")
    val out = byId(
      AsOf.interpolateSalted(df, Seq("k"), "ts_s", "id", "v", chunkSeconds),
      "v_interp")
    assert(out(1L) == Seq(null))
    assert(out(2L) == Seq(10.0))
    // row 3 interpolates between (200, 10.0) and (7300, 20.0) across
    // an observation-free chunk on both sides of its own
    assert(out(3L) == Seq(10.0 + 10.0 * ((3650.0 - 200.0) / (7300.0 - 200.0))))
    assert(out(5L) == Seq(20.0))
    val plain = byId(AsOf.interpolate(df, Seq("k"), "ts_s", "id", "v"), "v_interp")
    assert(out === plain)
  }

  test("salted plans window by (key, chunk): no unpartitioned window, bounded task input") {
    // the point of the salt: every window partitions by at least
    // (k, _chunk) in phase 1 — assert the plan carries no window
    // partitioned by the bare key for the phase-1 carry
    val out = AsOf.ffillSalted(hotFrame, Seq("k"), "t", "id", Seq("v"), chunkSeconds)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("_chunk"), s"expected chunked windows in:\n$plan")
  }
}
