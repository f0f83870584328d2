package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** #37g sliding-window HLL: per-day register state equals the max-merge
  * of the trailing daily states, and the estimator tracks the exact
  * trailing-7-day distinct count. */
class SlidingHllSpec extends SparkSpec {

  import spark.implicits._

  test("sliding state = merge of trailing daily states; estimate tracks exact") {
    val e = Tables.events(spark, sfDir)
    val m = 256
    val sliding = Sketch.hllSliding(e, "ts", "user_id", 86400L, 7, m)
      .as[(Long, Long, Long)].collect()
    val byDay = sliding.groupBy(_._1)
    // exact trailing-7-day distinct users per day (small data: exact ok)
    val ud = e.select(col("user_id"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(86400L)))
          .as("day"))
      .distinct().as[(Long, Long)].collect()
    val days = byDay.keys.toSeq.sorted
    days.foreach { d =>
      val exact = ud.collect {
        case (u, day) if day <= d && day > d - 7L * 86400 => u
      }.toSet.size
      val est = Sketch.hllEstimate(byDay(d).map(t => t._2 -> t._3).toMap, m)
      assert(math.abs(est - exact) / math.max(exact, 1) < 0.2,
        s"day $d: estimate $est vs exact $exact")
    }
    // spot-check the merge law on the latest day: sliding state ==
    // element-wise max of that window's daily states
    val daily = e.select(col("user_id"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(86400L)))
          .as("day"))
      .groupBy(col("day"),
        Sketch.hllRegisterOf(col("user_id"), m).as("reg"))
      .agg(max(Sketch.hllRho(col("user_id"))).as("rho"))
      .as[(Long, Long, Long)].collect()
    val d = days.last
    val manual = daily.filter(t => t._1 <= d && t._1 > d - 7L * 86400)
      .groupBy(_._2).map { case (reg, ts) => reg -> ts.map(_._3).max }
    assert(byDay(d).map(t => t._2 -> t._3).toMap == manual)
  }
}
