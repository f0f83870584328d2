package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.store.{KeyedTable, WriteMode}

/** Structured Streaming ingest (SURVEY.md §2 #33): event stream →
  * watermarked tumbling-window aggregation → foreachBatch upsert into a
  * keyed table.
  *
  * The batch-mode equivalent of the windowed agg is
  * `Analytics.eventsWindowed` (#18) — same plan, so correctness is
  * cross-checked there by the DuckDB oracle; the spec checks the
  * streaming path converges to the same rows.
  *
  * Scale notes: the window agg carries partial aggregates per
  * (window, type) key, so state is bounded by key cardinality, and the
  * watermark evicts closed windows. The upsert sink only rewrites the
  * hash buckets touched by each micro-batch (see KeyedTable.upsert).
  */
object StreamingIngest {

  /** Watermarked tumbling-window aggregation over a (possibly streaming)
    * events frame with columns (ts timestamp, event_type string,
    * value double). */
  def windowedAgg(events: DataFrame,
                  windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           // decimal sum: exact regardless of micro-batch arrival order,
           // so streaming converges bit-identically to the batch twin
           round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
             .as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("n_events"), col("sum_value"),
        // string PK dimension: KeyedTable PKs are scalar columns
        concat(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
               lit("|"), col("event_type")).as("win_key"))

  /** Streaming exact dedup (SURVEY.md §2 #34): emit only the FIRST
    * document seen per content hash — the streaming form of
    * Dedup.exact for continuous corpus ingestion. State is one tiny
    * row per distinct hash and is evicted once the event-time
    * watermark passes (`dropDuplicatesWithinWatermark`), so state
    * stays bounded on an unbounded stream; at 100 TB/day the state
    * store holds only the active horizon's hashes, hash-partitioned
    * across executors. */
  def dedupStream(docs: DataFrame,
                  tsCol: String = "ts",
                  textCol: String = "text",
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming gap-based sessionization (SURVEY.md §2 #33b): Structured
    * Streaming's native `session_window` merges events whose gaps stay
    * under `gap` — the same 30-min-inactivity rule as the batch
    * `Analytics.eventsSessionized`. Session state is per (user,
    * open-session) and merges/evicts as watermark advances. */
  def sessionizedAgg(events: DataFrame,
                     gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double")
          .as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment (SURVEY.md §2 #33c): join each
    * micro-batch of an event stream against a static dimension frame
    * (e.g. a keyed table read via `KeyedTable.readSql`), carrying
    * `rightCols` onto the stream. Left-outer so unmatched events pass
    * through with NULLs — an enrichment must never drop events.
    * The dim side is broadcast: stream-static joins re-plan the static
    * side per micro-batch, so a dimension that fits in memory costs no
    * stream-side shuffle at all; for a huge dimension drop the
    * broadcast hint and Spark shuffles the BATCH side only (the stream
    * partitioning is preserved by the micro-batch planner). */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   leftKey: String, rightKey: String,
                   rightCols: Seq[String]): DataFrame = {
    require(leftKey != rightKey,
      "leftKey and rightKey must differ (alias the dim key before joining)")
    events.join(
      broadcast(dim.select((rightKey +: rightCols).map(col): _*)),
      col(leftKey) === col(rightKey), "left_outer")
      .drop(rightKey)
  }

  /** Stream-stream interval join (SURVEY.md §2 #33e): the streaming twin
    * of [[graft.operators.RangeJoin]] — pair each anchor with the
    * follower rows of the same key whose event time falls in
    * (anchor.t, anchor.t + windowSeconds]. Spark's stream-stream join
    * machinery needs BOTH watermarks plus the time-range condition to
    * bound its state: each side buffers only rows inside
    * watermark + window, then evicts — state is O(rate × horizon), not
    * O(stream). Column names must differ across sides (rename before
    * calling); inner join, Append mode.
    *
    * At 100 TB/day this is the shape that works: the join state is
    * hash-partitioned by key across executors and the range condition
    * gives the planner the eviction bound. Without it (a bare equi
    * stream-stream join in Append) state grows forever. */
  def intervalJoinStream(anchors: DataFrame, followers: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         windowSeconds: Long,
                         watermark: String = "1 minute"): DataFrame = {
    require(Set(leftKey, leftTime).intersect(Set(rightKey, rightTime)).isEmpty,
      "anchor and follower column names must differ")
    anchors.withWatermark(leftTime, watermark)
      .join(followers.withWatermark(rightTime, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTime) > col(leftTime) &&
          col(rightTime) <= col(leftTime) + expr(s"INTERVAL $windowSeconds seconds"))
  }

  /** Streaming per-window top-k trending (SURVEY.md §2 #33g):
    * watermarked tumbling windows in APPEND mode — each window is
    * emitted exactly once, when the watermark passes its end — then
    * every micro-batch's finalized windows reduce to their k most
    * frequent event types through the bounded-heap top-k aggregate
    * ([[graft.operators.Knn.topKByScore]]) and upsert into a keyed
    * table keyed by (window, rank).
    *
    * Append (not Update) is what makes a streaming top-k well-defined:
    * pre-finalization counts can only grow, so any early ranking might
    * need retraction — by ranking only FINALIZED windows, the top-k is
    * a plain batch aggregate per micro-batch and never lies. State is
    * the window agg's partials (key cardinality × watermark horizon);
    * the ranking itself holds ≤k rows per window per task. Replay after
    * failure re-emits finalized windows; the PK upsert absorbs them. */
  def trendingTopK(events: DataFrame,
                   warehouse: String,
                   table: String,
                   checkpoint: String,
                   k: Int = 3,
                   windowLen: String = "1 hour",
                   watermark: String = "2 hours"): StreamingQuery =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // largest count first, event_type breaks ties ascending:
          // ascending heap over (-count, type)
          val ranked = graft.operators.Knn.topKByScore(
              batch.withColumn("neg_n", -col("n_events")),
              Seq("win_start"), "neg_n", "event_type", k, ascending = true)
            .select(col("win_start"), col("rank"), col("event_type"),
              col("n_events"),
              concat(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss"),
                lit("|"), col("rank")).as("win_key"))
          val exists = graft.store.Catalog.hasTable(
            ranked.sparkSession, warehouse, table)
          KeyedTable.toSql(ranked, warehouse, table, pk = Seq("win_key"),
            how = if (exists) WriteMode.Upsert else WriteMode.CreateOnly,
            buckets = 8)
        }
      }
      .start()

  /** Start the ingest: every micro-batch upserts its (re)computed windows
    * into `<warehouse>/<table>` keyed by win_key. Update mode + upsert is
    * idempotent per window — late data below the watermark re-emits the
    * window and the upsert replaces the old row. */
  def start(events: DataFrame,
            warehouse: String,
            table: String,
            checkpoint: String,
            windowLen: String = "1 hour",
            watermark: String = "2 hours"): StreamingQuery =
    windowedAgg(events, windowLen, watermark)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val exists = graft.store.Catalog.hasTable(batch.sparkSession, warehouse, table)
          KeyedTable.toSql(batch, warehouse, table, pk = Seq("win_key"),
            how = if (exists) WriteMode.Upsert else WriteMode.CreateOnly,
            buckets = 8)
        }
      }
      .start()
}
