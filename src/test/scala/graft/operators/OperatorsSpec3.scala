package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contract specs for the round-4 late additions: binned range join,
  * HyperLogLog sketch, salted skew join, linear interpolation. */
class OperatorsSpec3 extends SparkSpec {

  import spark.implicits._

  // ---------------------------------------------------------------- RangeJoin

  test("range join: window boundaries, zero-follower anchors, key isolation") {
    val anchors = Seq(
      (1L, "a", 100L),   // followers at 101..1000 qualify
      (2L, "b", 100L),   // no same-key followers -> n_follow = 0
    ).toDF("id", "k", "t")
    val followers = Seq(
      ("a", 100L, 1.0),  // == anchor t: excluded (strictly after)
      ("a", 101L, 2.0),  // in
      ("a", 1000L, 3.0), // == t + 900: included (inclusive right edge)
      ("a", 1001L, 4.0), // out
      ("c", 500L, 5.0),  // other key: never joins
    ).toDF("k", "t", "v")
    val out = RangeJoin.intervalAgg(anchors, followers,
        keyCol = "k", anchorIdCol = "id", anchorTimeCol = "t",
        followerTimeCol = "t", windowSeconds = 900L,
        aggs = Seq(sum(col("v")).as("sv")))
      .select("id", "n_follow", "sv")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) == ((2L, Some(5.0))))
    assert(out(2L) == ((0L, None)))
  }

  test("range join: binned form equals the naive range-predicate join on events") {
    val e = Tables.events(spark, sfDir)
    val anchors = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("a_s"))
    val followers = e.select(col("user_id").as("f_user"),
      col("ts").cast("long").as("f_s"))
    val binned = RangeJoin.intervalAgg(anchors, followers.withColumnRenamed("f_user", "user_id"),
        keyCol = "user_id", anchorIdCol = "event_id", anchorTimeCol = "a_s",
        followerTimeCol = "f_s", windowSeconds = 900L, aggs = Seq())
      .select(col("event_id"), col("n_follow"))
    val naive = anchors.join(followers,
        anchors("user_id") === followers("f_user") &&
          col("f_s") > col("a_s") && col("f_s") <= col("a_s") + 900L, "left")
      .groupBy(col("event_id"))
      .agg(sum(when(col("f_user").isNotNull, 1L).otherwise(0L)).as("n_follow"))
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // the corpus must actually exercise both sides of the contract
    assert(binned.filter(col("n_follow") === 0).count() > 0 ||
           binned.filter(col("n_follow") > 0).count() > 0)
  }

  // -------------------------------------------------------------------- HLL

  test("hll: register state is partitioning-invariant and bounded by m") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val a = Sketch.hllSketch(df, Seq("g"), "v", m = 128)
      .as[(String, Long, Long)].collect().toSet
    val b = Sketch.hllSketch(df.repartition(17), Seq("g"), "v", m = 128)
      .as[(String, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size <= 128))
    assert(a.forall { case (_, reg, rho) => reg >= 0 && reg < 128 && rho >= 1 && rho <= 53 })
  }

  test("hll: estimate within tolerance above and below m") {
    // n >> m: the HLL estimator proper (standard error 1.04/sqrt(m) ~ 6.5%)
    val big = (1 to 20000).map(i => ("g", s"item$i")).toDF("g", "v")
    val bigState = Sketch.hllSketch(big, Seq("g"), "v", m = 256)
      .as[(String, Long, Long)].collect()
      .map { case (_, reg, rho) => reg -> rho }.toMap
    val bigEst = Sketch.hllEstimate(bigState, 256)
    assert(math.abs(bigEst - 20000) / 20000.0 < 0.2, s"estimate $bigEst vs 20000")
    // n << m: the small-range linear-counting correction
    val small = (1 to 30).map(i => ("g", s"item$i")).toDF("g", "v")
    val smallState = Sketch.hllSketch(small, Seq("g"), "v", m = 256)
      .as[(String, Long, Long)].collect()
      .map { case (_, reg, rho) => reg -> rho }.toMap
    val smallEst = Sketch.hllEstimate(smallState, 256)
    assert(math.abs(smallEst - 30) / 30.0 < 0.15, s"estimate $smallEst vs 30")
  }

  // ------------------------------------------------------------- SaltedJoin

  test("salted join equals the plain join on a hot-key dataset") {
    val big = ((1 to 1000).map(i => (1L, i.toLong)) ++   // hot key
        (1 to 50).map(i => (2L, 10000L + i))).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("sk", "name")
    val salted = SaltedJoin.saltedEquiJoin(big, small,
        bigKey = "k", smallKey = "sk", disambig = Seq("row_id"), salts = 8)
      .select("k", "row_id", "name")
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "row_id", "name")
    assert(salted.count() == 1050)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join: salts = 1 degenerates to the plain join") {
    val big = Seq((1L, 1L), (1L, 2L)).toDF("k", "row_id")
    val small = Seq((1L, "x")).toDF("sk", "name")
    val out = SaltedJoin.saltedEquiJoin(big, small, "k", "sk", Seq("row_id"), 1)
    assert(out.count() == 2)
  }

  // ------------------------------------------------------------------ ewm

  test("ewm mean: closed form, key reset inside one partition, time order") {
    // alpha = 0.5 over [1, 2, 3]: 1, 5/3, 17/7 (pandas adjust=true)
    val df = Seq(
      (1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 3.0),
      // second key forces a state reset when it lands in the same partition
      (2L, 10L, 4L, 100.0),
      // out-of-order input: the sort must run it at its time position
      (3L, 20L, 6L, 4.0), (3L, 10L, 5L, 8.0),
    ).toDF("k", "t", "id", "v").repartition(1)
    val out = AsOf.ewmMean(df, "k", "t", "id", "v", alpha = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(out(1L) == 1.0)
    assert(math.abs(out(2L) - 5.0 / 3.0) < 1e-12)
    assert(math.abs(out(3L) - 17.0 / 7.0) < 1e-12)
    assert(out(4L) == 100.0)       // fresh state for key 2
    assert(out(5L) == 8.0)         // time-ordered: id 5 (t=10) runs first
    assert(math.abs(out(6L) - (4.0 + 0.5 * 8.0) / 1.5) < 1e-12)
  }

  // ---------------------------------------------------------------- funnel

  test("funnel stages: full chain, stale click, stale view, missing steps") {
    // Build a tiny events frame shaped like the corpus and run the real
    // operator end to end via a temp parquet dir.
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val rows = Seq(
      // user 1: view @0s, click @100s, buy @200s -> stage 3
      (1L, 0L, 1L, "view"), (2L, 100L, 1L, "click"), (3L, 200L, 1L, "purchase"),
      // user 2: click 2h before buy -> stale click -> stage 1
      (4L, 0L, 2L, "click"), (5L, 7200L, 2L, "purchase"),
      // user 3: view 2h before click -> stage 2
      (6L, 0L, 3L, "view"), (7L, 7300L, 3L, "click"), (8L, 7400L, 3L, "purchase"),
      // user 4: purchase only -> stage 1
      (9L, 500L, 4L, "purchase"),
    )
    rows.toDF("event_id", "t_s", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(t_s * 1000000)").as("micro_ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .select(col("event_id"), expr("CAST(unix_micros(micro_ts) * 1000 AS LONG)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.Analytics.eventsFunnel(spark, dir)
      .select("buy_id", "funnel_stage")
      .as[(Long, Int)].collect().toMap
    assert(out == Map(3L -> 3, 5L -> 1, 8L -> 2, 9L -> 1))
  }

  // ------------------------------------------------------------- patchGrid

  test("patch grid: ceil-div fanout per image, unique patch keys, zero shuffle") {
    val pipe = Multimodal.pipeline(graft.Tables.documents(spark, sfDir))
    val patches = Multimodal.patchGrid(pipe, patch = 32)
    val expected = pipe.filter(col("media_type") === "image")
      .select((ceil(col("resized_w") / 32.0) * ceil(col("resized_h") / 32.0)).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(patches.count() == expected)
    assert(patches.select("patch_md5").distinct().count() == expected)
    // narrow plan: no Exchange anywhere
    val hasExchange = patches.queryExecution.executedPlan.toString.contains("Exchange")
    assert(!hasExchange)
  }

  // ------------------------------------------------------- asofJoinDirected

  test("directed as-of: forward inclusive, nearest prefers backward on ties, no-match NULLs") {
    val left = Seq(
      (1L, "k", 100L),  // right row at exactly 100 -> gap 0 in every direction
      (2L, "k", 95L),   // equidistant: back @90 gap 5, fwd @100 gap 5 -> tie
      (3L, "k", 300L),  // nothing after -> forward NULL, nearest backward
      (4L, "z", 50L),   // keyless -> all NULL
      (5L, "k", 103L),  // back @100 gap 3, fwd @105 gap 2 -> nearest forward
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k", 90L, 900L),
      ("k", 100L, 901L),
      ("k", 105L, 902L),
    ).toDF("rk", "rt", "rid")
    def run(dir: String) = AsOf.asofJoinDirected(left, right,
        "k", "rk", "t", "rt", Seq("rid"), "rid", dir)
      .select("id", "rid", "asof_t")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val fwd = run("forward")
    assert(fwd(1L) == ((Some(901L), Some(100L)))) // inclusive at equal time
    assert(fwd(2L) == ((Some(901L), Some(100L))))
    assert(fwd(3L) == ((None, None)))
    assert(fwd(4L) == ((None, None)))
    assert(fwd(5L) == ((Some(902L), Some(105L))))
    val near = run("nearest")
    assert(near(1L) == ((Some(901L), Some(100L)))) // gap 0
    // id 2: back @90 gap 5, fwd @100 gap 5 -> tie prefers backward
    assert(near(2L) == ((Some(900L), Some(90L))))
    assert(near(3L) == ((Some(902L), Some(105L)))) // only backward exists
    assert(near(4L) == ((None, None)))
    assert(near(5L) == ((Some(902L), Some(105L)))) // gap 2 fwd beats 3 back
    val back = run("backward")
    assert(back(1L) == ((Some(901L), Some(100L))))
    assert(back(5L) == ((Some(901L), Some(100L))))
  }

  // ---------------------------------------------------------- hllCumulative

  test("hll cumulative: register state merges monotonically and estimates the running distinct") {
    val e = Tables.events(spark, sfDir)
    val cum = Sketch.hllCumulative(e, "ts", "user_id", 86400L, m = 256)
      .as[(Long, Long, Long)].collect()
    val byDay = cum.groupBy(_._1)
    val days = byDay.keys.toSeq.sorted
    // registers never decrease day over day (merge = max)
    for ((d1, d2) <- days.zip(days.tail)) {
      val r1 = byDay(d1).map(t => t._2 -> t._3).toMap
      val r2 = byDay(d2).map(t => t._2 -> t._3).toMap
      assert(r1.forall { case (reg, rho) => r2.getOrElse(reg, 0L) >= rho },
        s"register state shrank between $d1 and $d2")
    }
    // the last day's state estimates the whole corpus' distinct users
    val exact = e.select("user_id").distinct().count()
    val est = Sketch.hllEstimate(
      byDay(days.last).map(t => t._2 -> t._3).toMap, 256)
    assert(math.abs(est - exact) / exact < 0.2, s"estimate $est vs exact $exact")
  }

  // ------------------------------------------------------------ eventsTwa

  test("time-weighted average: holds dominate blips; single-event keys are NULL") {
    val df = Seq(
      // key a: v=10 held 100s, then v=1000 for the final instant -> twa = 10
      ("a", 0L, 1L, 10.0),
      ("a", 100L, 2L, 1000.0),
      // key b: one event -> no interval -> NULL
      ("b", 0L, 3L, 50.0),
    ).toDF("user", "t", "id", "v")
    // mirror of Analytics.eventsTwa over a synthetic frame
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user")).orderBy(col("t"), col("id"))
    val out = df.select(col("user"), col("t"), col("id"),
        col("v").cast("decimal(9,2)").as("vd"))
      .withColumn("dt", lead(col("t"), 1).over(byKey) - col("t"))
      .groupBy("user")
      .agg(min("t").as("t0"), max("t").as("t1"),
        sum(col("vd") * col("dt")).as("ws"))
      .select(col("user"),
        when(col("t1") > col("t0"),
          col("ws").cast("double") / (col("t1") - col("t0")).cast("double")).as("twa"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(10.0))
    assert(out("b").isEmpty)
  }

  // ------------------------------------------------------------ quantizeInt8

  test("int8 quantization: exact codes on a known range, full int8 span") {
    val embs = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(5.0f, 20.0f)),
      (3L, Seq(10.0f, 30.0f)),
    ).toDF("vec_id", "embedding")
    val got = Knn.quantizeInt8(embs, "vec_id", "embedding")
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got((1L, 0L)) == -128 && got((1L, 1L)) == -128) // at min
    assert(got((2L, 0L)) == 0 && got((2L, 1L)) == 0)       // midpoint
    assert(got((3L, 0L)) == 127 && got((3L, 1L)) == 127)   // at max clamps
  }

  test("int8 quantization: reconstruction error bounded by the bucket width") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val long = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"), col("v").cast("double").as("v"))
    val stats = long.groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
    val q = Knn.quantizeInt8(e, "vec_id", "embedding")
    val bad = q.join(long, Seq("vec_id", "dim")).join(stats, "dim")
      .withColumn("vhat", col("mn") + (col("q") + lit(128.5)) * (col("mx") - col("mn")) / 256.0)
      .filter(abs(col("v") - col("vhat")) > (col("mx") - col("mn")) / 256.0)
      .count()
    assert(bad == 0)
    // codes stay in int8 range
    assert(q.filter(col("q") < -128 || col("q") > 127).count() == 0)
  }

  // ---------------------------------------------------------- NormalizeText

  test("normalize_text: accents, case, controls, whitespace runs, NFC/NFD input parity") {
    val composed = "Caf\u00e9  D\u00c9J\u00c0\tVu"          // precomposed e-acute etc.
    val decomposed = "Cafe\u0301  DE\u0301JA\u0300\tVu"     // same text, NFD
    val out = Seq(
      composed,
      decomposed,
      "hello\u0007world",        // control char becomes a separator
      "  already normal  ",
    ).toDF("text")
      .select(graft.functions.TextFunctions.normalizeText(col("text")))
      .as[String].collect()
    assert(out(0) == "cafe deja vu")
    assert(out(1) == out(0)) // composed and decomposed inputs converge
    assert(out(2) == "hello world")
    assert(out(3) == "already normal")
    // SQL registration plans the same expression
    val viaSql = spark.sql("SELECT graft_normalize_text('Caf\u00e9  D\u00c9J\u00c0')")
      .head().getString(0)
    assert(viaSql == "cafe deja")
    // null-safe
    assert(Seq(Option.empty[String]).toDF("text")
      .select(graft.functions.TextFunctions.normalizeText(col("text")))
      .head().isNullAt(0))
  }

  // ------------------------------------------------------------ interpolate

  test("interpolate: interior gaps linear, leading nulls stay, trailing carry") {
    val df = Seq(
      // key a: leading null, interior gap, uneven spacing, trailing null
      ("a", 0L, 1L, None),             // leading -> stays null
      ("a", 10L, 2L, Some(10.0)),
      ("a", 15L, 3L, None),            // midpoint of 10..20 -> 15.0
      ("a", 20L, 4L, Some(20.0)),
      ("a", 21L, 5L, None),            // uneven: 20 + 80*(1/10)
      ("a", 30L, 6L, Some(100.0)),
      ("a", 40L, 7L, None),            // trailing -> carries 100.0
      // key b: all null -> all stay null
      ("b", 0L, 8L, None),
    ).toDF("k", "t", "id", "v")
    val out = AsOf.interpolate(df, Seq("k"), "t", "id", "v")
      .select("id", "v_interp")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty)
    assert(out(3L).contains(15.0))
    assert(out(5L).contains(20.0 + 80.0 * (1.0 / 10.0)))
    assert(out(7L).contains(100.0))
    assert(out(8L).isEmpty)
    // observed rows pass through untouched
    assert(out(2L).contains(10.0) && out(6L).contains(100.0))
  }
}
