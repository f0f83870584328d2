package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY.md §2 #33d: custom keyed state via flatMapGroupsWithState —
  * streaming gap sessionization that emits each CLOSED session exactly
  * once (Append mode), the stateful complement of the native
  * `session_window` aggregation (#33b, which re-emits whole windows in
  * Update/Complete mode).
  *
  * State per key is ONE open session (start, end, count) — bytes, not
  * events — hash-partitioned across executors by the state store; the
  * event-time timeout closes idle sessions when the watermark passes
  * `session end + gap`, so state for dormant keys is evicted instead of
  * accumulating. Within a micro-batch, events sort per key (bounded by
  * the batch, not the stream) and the same gap rule as the batch
  * operator ([[graft.operators.Sessionize]]) closes interior sessions
  * immediately.
  */
object StatefulSessions {

  /** The open-session state: timestamps in floored epoch seconds
    * (matching the batch operator's representation). */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** One closed session, emitted exactly once. */
  case class Closed(user_id: Long, session_start: Long, session_end: Long,
                    n_events: Long)

  /** @param events frame with (user_id long, ts timestamp) — extra
    *               columns are ignored. Works on a streaming OR batch
    *               frame (Spark runs the same state function in batch
    *               mode with no state carry-over). */
  def sessions(events: DataFrame, gapSeconds: Long = 1800L,
               watermark: String = "2 hours"): Dataset[Closed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("ts").cast("long").as("ts_s"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Closed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap with no new events: close and evict
            val s = state.get
            state.remove()
            Iterator.single(Closed(user, s.start, s.end, s.n))
          } else {
            // per-key in-batch sort: bounded by the micro-batch's slice
            // of this key, never the stream's history
            val ts = it.map(_._3).toArray
            java.util.Arrays.sort(ts)
            val closed = List.newBuilder[Closed]
            var open = state.getOption
            for (t <- ts) {
              open match {
                case Some(s) if t - s.end <= gapSeconds =>
                  open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += Closed(user, s.start, s.end, s.n)
                  open = Some(OpenSession(t, t, 1L))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            val s = open.get
            state.update(s)
            // the timeout must sit at/after the current watermark; a
            // session already older than the watermark closes on the
            // next tick
            state.setTimeoutTimestamp(
              math.max((s.end + gapSeconds) * 1000L + 1000L,
                state.getCurrentWatermarkMs() + 1000L))
            closed.result().iterator
          }
      }
  }
}
