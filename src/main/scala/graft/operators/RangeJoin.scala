package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval (range) join (SURVEY.md §2 #19b).
  *
  * "For each anchor row, aggregate the follower rows of the same key
  * whose time falls in (anchor.t, anchor.t + window]" — the classic
  * activity-after-trigger join (events after a purchase, readings
  * after an alarm, trades after a quote).
  *
  * Spark has no native interval-join operator for batch: the naive
  * formulation `f.t > a.t AND f.t <= a.t + w` with an equi key still
  * works, but a PURE range predicate (no equi key) plans a
  * BroadcastNestedLoopJoin — O(|A|·|F|) — and even with the equi key
  * every follower of a hot key meets every anchor of that key before
  * the filter. The binned form bounds the fan-out structurally:
  *
  *  - followers land in time bucket `floor(t / w)` — ONE row each;
  *  - anchors explode to buckets `{floor(t/w), floor(t/w)+1}` — the
  *    only two buckets an (anchor.t, anchor.t + w] window can touch —
  *    TWO rows each;
  *  - the join is a plain equi-join on (key, bucket) followed by the
  *    exact range filter, so Catalyst plans a shuffled hash /
  *    sort-merge join with AQE, codegen and skew handling, and each
  *    anchor meets only the ≤ 2 buckets of followers that can
  *    possibly match, not the key's whole history.
  *
  * At 100 TB: shuffle volume is 2·|A| + |F| rows keyed by
  * (key, bucket) — hot keys are further spread across their time
  * buckets, so a year-long hot key becomes ~35k independent join
  * cells instead of one degenerate partition.
  *
  * Times are whole-second epoch BIGINTs end to end: the range
  * predicate must evaluate identically in every engine (the parquet
  * carries ns timestamps, Spark reads µs — a raw-timestamp comparison
  * can flip boundary pairs), so callers pass epoch-second columns and
  * the window is in seconds.
  */
object RangeJoin {

  /** Per-anchor aggregates over followers in (t, t + windowSeconds].
    *
    * @param anchors     one row per anchor; must carry `keyCol`,
    *                    `anchorIdCol` (unique) and `anchorTimeCol`
    *                    (epoch seconds, BIGINT)
    * @param followers   rows to aggregate; must carry `keyCol`,
    *                    `followerTimeCol` (epoch seconds) and the
    *                    columns the `aggs` reference
    * @param aggs        aggregate columns over follower rows (already
    *                    aliased); zero-follower anchors keep the
    *                    aggregate NULL (SQL outer-join semantics) and
    *                    get `n_follow = 0`
    * @return anchors (all rows) + `n_follow` + the `aggs` columns
    */
  def intervalAgg(
      anchors: DataFrame,
      followers: DataFrame,
      keyCol: String,
      anchorIdCol: String,
      anchorTimeCol: String,
      followerTimeCol: String,
      windowSeconds: Long,
      aggs: Seq[Column]): DataFrame = {

    val w = lit(windowSeconds)
    // followers: one bucket each
    val f = followers
      .withColumnRenamed(keyCol, "_rj_k")
      .withColumn("_rj_ft", col(followerTimeCol).cast("long"))
      .withColumn("_rj_b", floor(col("_rj_ft") / w))
    // anchors: the two buckets the window can touch
    val a = anchors.select(
        col(keyCol).as("_rj_k"),
        col(anchorIdCol).as("_rj_id"),
        col(anchorTimeCol).cast("long").as("_rj_at"))
      .withColumn("_rj_b", explode(array(
        floor(col("_rj_at") / w), floor(col("_rj_at") / w) + 1)))

    val matched = a.join(f, Seq("_rj_k", "_rj_b"))
      .filter(col("_rj_ft") > col("_rj_at") &&
              col("_rj_ft") <= col("_rj_at") + w)
      .groupBy(col("_rj_id"))
      .agg(count(lit(1)).as("n_follow"), aggs: _*)

    anchors
      .join(matched, anchors(anchorIdCol) === matched("_rj_id"), "left")
      .drop("_rj_id")
      .withColumn("n_follow", coalesce(col("n_follow"), lit(0L)))
  }
}
