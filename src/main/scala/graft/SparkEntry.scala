package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 has a `queries` entry here; oracle SQL
  * (DuckDB dialect, same parquet tables registered by bare name) is in
  * `oracleSql` for the SQL-expressible ones. Column names/aliases match
  * between the two on purpose: the driver sorts columns by name before
  * hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PbQueries.queries ++ LlmQueries.queries ++ Analytics.queries ++ Map(
      "q1_pricing_summary" -> (Queries.q1PricingSummary _),
      "multimodal_meta" -> ((s: SparkSession, d: String) =>
        graft.operators.Multimodal.pipeline(Tables.documents(s, d))),
      // per-frame explode of the sampled frames: row-fanout stage of the
      // media pipeline (frame extraction as rows, one deterministic
      // stub-feature hash per sampled frame)
      "multimodal_frames" -> ((s: SparkSession, d: String) =>
        graft.operators.Multimodal.pipeline(Tables.documents(s, d))
          .select(col("doc_id"), col("content_md5"),
            explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))).as("frame_idx"))
          .select(col("doc_id"), col("frame_idx"),
            md5(concat(col("content_md5"), lit(":"), col("frame_idx").cast("string")))
              .as("frame_md5"))),
      // ViT-style patch-grid fanout over the resized image dims (#28c)
      "multimodal_patches" -> ((s: SparkSession, d: String) =>
        graft.operators.Multimodal.patchGrid(
          graft.operators.Multimodal.pipeline(Tables.documents(s, d)), patch = 32)),
      // #28d audio analysis windows: per audio doc, 1024-sample windows
      // at stride 512 over the stub sample stream (16 samples/byte) —
      // the ASR/feature-extraction fanout, same narrow explode shape as
      // frames/patches; integer window math matches the oracle exactly
      // (the <= guard avoids trunc-vs-floor division divergence)
      "multimodal_audio_windows" -> ((s: SparkSession, d: String) => {
        val p = graft.operators.Multimodal.pipeline(Tables.documents(s, d))
          .filter(col("media_type") === "audio")
          .select(col("doc_id"),
            (col("byte_len") * 16).cast("long").as("n_samples"))
          .withColumn("_nw1",
            when(col("n_samples") <= 1024L, lit(0L))
              .otherwise(floor((col("n_samples") - lit(1024L)) / lit(512L))
                .cast("long")))
        p.select(col("doc_id"), col("n_samples"),
            explode(sequence(lit(0L), col("_nw1"), lit(1L))).as("win_idx"))
          .select(col("doc_id"), col("n_samples"), col("win_idx"),
            (col("win_idx") * 512L).as("start_sample"),
            md5(concat(col("doc_id").cast("string"), lit(":aw:"),
              col("win_idx").cast("string"))).as("window_md5"))
      }),
    )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = PbQueries.oracles ++ LlmQueries.oracles ++ Analytics.oracles ++ Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2)::DOUBLE           AS sum_qty,
             round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)::DOUBLE      AS sum_base_price,
             round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)::DOUBLE AS sum_disc_price,
             round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2)::DOUBLE AS sum_charge,
             round(avg(CAST(l_quantity AS DECIMAL(18,6))), 4)::DOUBLE           AS avg_qty,
             round(avg(CAST(l_extendedprice AS DECIMAL(18,6))), 4)::DOUBLE      AS avg_price,
             round(avg(CAST(l_discount AS DECIMAL(18,6))), 4)::DOUBLE           AS avg_disc,
             count(*)                                                           AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim,
    // Mirrors Multimodal.StubDecoder: features derived from payload MD5,
    // aspect-preserving resize into 256x256, every-10th frame sampling.
    "multimodal_meta" -> """
      WITH p AS (
        SELECT doc_id,
               (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS h
        FROM documents),
      f AS (
        SELECT doc_id, media_type, byte_len, h AS content_md5,
               ('0x' || substr(h, 1, 4))::BIGINT % 1280 + 1 AS width,
               ('0x' || substr(h, 5, 4))::BIGINT % 720 + 1 AS height,
               CASE WHEN media_type = 'video'
                    THEN ('0x' || substr(h, 9, 2))::BIGINT % 60 + 1
                    ELSE 1 END AS n_frames
        FROM p),
      r AS (
        SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale
        FROM f)
      SELECT doc_id, media_type, byte_len, content_md5, width, height, n_frames,
             CAST(greatest(floor(width * scale), 1) AS BIGINT) AS resized_w,
             CAST(greatest(floor(height * scale), 1) AS BIGINT) AS resized_h,
             CAST(floor((n_frames - 1) / 10) + 1 AS BIGINT) AS n_sampled,
             CAST((floor((n_frames - 1) / 10)) * 10 AS BIGINT) AS last_frame
      FROM r""".trim,
    "multimodal_frames" -> """
      WITH p AS (SELECT doc_id, md5(text) h,
                   (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] mt
                 FROM documents),
      f AS (SELECT doc_id, h,
              CASE WHEN mt = 'video' THEN ('0x' || substr(h, 9, 2))::BIGINT % 60 + 1
                   ELSE 1 END nf
            FROM p)
      SELECT doc_id, fr.frame_idx, md5(h || ':' || fr.frame_idx) AS frame_md5
      FROM f, LATERAL (SELECT unnest(range(0, nf, 10)) frame_idx) fr""".trim,
    // audio docs are doc_id % 3 == 1 (multimodal_meta's media map);
    // same integer window math, floor division on positives only
    "multimodal_audio_windows" -> """
      WITH a AS (SELECT doc_id,
                   (octet_length(encode(text)) * 16)::BIGINT AS n_samples
                 FROM documents WHERE CAST(doc_id % 3 AS INT) = 1),
      nw AS (SELECT doc_id, n_samples,
               CASE WHEN n_samples <= 1024 THEN 0
                    ELSE (n_samples - 1024) // 512 END AS nw1
             FROM a)
      SELECT doc_id, n_samples, t.w AS win_idx,
             (t.w * 512)::BIGINT AS start_sample,
             md5(doc_id::VARCHAR || ':aw:' || t.w::VARCHAR) AS window_md5
      FROM nw, LATERAL (SELECT unnest(range(nw1 + 1)) AS w) t""".trim,
    // resize replay as in multimodal_meta, then the ceil-div patch grid
    "multimodal_patches" -> """
      WITH p AS (SELECT doc_id, md5(text) AS h,
                   (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS mt
                 FROM documents),
      f AS (SELECT doc_id, h,
              ('0x' || substr(h, 1, 4))::BIGINT % 1280 + 1 AS width,
              ('0x' || substr(h, 5, 4))::BIGINT % 720 + 1 AS height
            FROM p WHERE mt = 'image'),
      r AS (SELECT doc_id, h,
              CAST(greatest(floor(width * least(256.0 / width, 256.0 / height, 1.0)), 1) AS BIGINT) AS rw,
              CAST(greatest(floor(height * least(256.0 / width, 256.0 / height, 1.0)), 1) AS BIGINT) AS rh
            FROM f),
      g AS (SELECT doc_id, h, (rw + 31) // 32 AS nx, (rh + 31) // 32 AS ny FROM r)
      SELECT doc_id, gx.px, gy.py,
             md5(h || ':' || gx.px || ':' || gy.py) AS patch_md5
      FROM g,
           LATERAL (SELECT unnest(range(nx)) AS px) gx,
           LATERAL (SELECT unnest(range(ny)) AS py) gy""".trim,
  )
}

/** Analytics headline queries (SURVEY.md §2 #14-20). */
object Queries {

  /** TPC-H Q1 pricing summary (agg pipeline; map-side partial agg).
    * Sums/avgs go through DECIMAL(18,6) — order-exact, see
    * [[Analytics.moneySum]]. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import Analytics.{moneyAvg, moneySum}
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(moneySum(col("l_quantity")), 2).cast("double").as("sum_qty"),
        round(moneySum(col("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).cast("double").as("sum_disc_price"),
        round(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).cast("double").as("sum_charge"),
        round(moneyAvg(col("l_quantity")), 4).cast("double").as("avg_qty"),
        round(moneyAvg(col("l_extendedprice")), 4).cast("double").as("avg_price"),
        round(moneyAvg(col("l_discount")), 4).cast("double").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
}
