package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY.md §2 #18b/#18c): group a key's
  * events into sessions split by inactivity gaps longer than
  * `gapSeconds`. Two forms with IDENTICAL output:
  *
  *  - [[gapSessions]]: the one-window textbook form. Partitioning by
  *    key puts ALL of a key's rows in one task — and AQE does not
  *    split window skew, so a bot key with 10⁸ events is a straggler.
  *  - [[gapSessionsSalted]]: the skew-proof two-phase form. Phase 1
  *    salts the window with a time chunk — partition (key, chunk) —
  *    so each task sessionizes a bounded slice and collapses it to
  *    per-session summary rows. Phase 2 re-sessionizes the SUMMARIES
  *    per key with the same gap rule, which stitches sessions that
  *    straddle chunk edges (a session continues exactly when its
  *    start is within the gap of the previous session's end — the
  *    same predicate that split events in phase 1, now applied to
  *    session intervals, which are non-overlapping and time-ordered
  *    within a key by construction). The hot key's phase-2 input is
  *    its session count — for continuous bot traffic that is ~1 row
  *    per chunk, not 10⁸ events.
  *
  * Timestamps are floored to epoch seconds (`cast long`), matching
  * the batch sessionization gate query and keeping outputs
  * representation-stable across engines.
  */
object Sessionize {

  /** One-window form: (key, session_no, session_start, session_end,
    * n_events), session_no 1-based in time order per key. */
  def gapSessions(df: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_ts"), col(tieCol))
    df.withColumn("_ts", col(tsCol).cast("long"))
      .withColumn("_gap", col("_ts") - lag(col("_ts"), 1).over(w))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("_new")).over(w))
      .groupBy(col(keyCol), col("session_no"))
      .agg(min(col("_ts")).as("session_start"),
        max(col("_ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Two-phase salted form — same output as [[gapSessions]].
    * `chunkSeconds` is the salt width: pick it ≫ gapSeconds (e.g. a
    * day against a 30-min gap) so phase 1 merges almost everything
    * locally and phase 2 sees only per-session summaries. */
  def gapSessionsSalted(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, gapSeconds: Long,
                        chunkSeconds: Long): DataFrame = {
    val wc = Window.partitionBy(col(keyCol), col("_chunk"))
      .orderBy(col("_ts"), col(tieCol))
    val local = df.withColumn("_ts", col(tsCol).cast("long"))
      .withColumn("_chunk", floor(col("_ts") / chunkSeconds))
      .withColumn("_gap", col("_ts") - lag(col("_ts"), 1).over(wc))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("_lsess", sum(col("_new")).over(wc))
      .groupBy(col(keyCol), col("_chunk"), col("_lsess"))
      .agg(min(col("_ts")).as("_start"), max(col("_ts")).as("_end"),
        count(lit(1)).as("_n"))
    // phase 2: sessionize the session summaries (rows per key = session
    // count, bounded regardless of event skew)
    val wk = Window.partitionBy(col(keyCol))
      .orderBy(col("_start"), col("_chunk"), col("_lsess"))
    local
      .withColumn("_mgap", col("_start") - lag(col("_end"), 1).over(wk))
      .withColumn("_mnew",
        when(col("_mgap").isNull || col("_mgap") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("_mnew")).over(wk))
      .groupBy(col(keyCol), col("session_no"))
      .agg(min(col("_start")).as("session_start"),
        max(col("_end")).as("session_end"),
        sum(col("_n")).as("n_events"))
  }
}
