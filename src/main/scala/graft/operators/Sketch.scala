package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory distinct-count sketching (SURVEY.md §2 #37): linear
  * counting with md5-derived bit positions. Where an exact
  * `count_distinct(value)` must shuffle every distinct value per group
  * (unbounded — think distinct user ids per hour over a year of
  * events), the sketch maps each value to one of `m` positions and
  * counts OCCUPIED positions: per-group state is capped at `m`
  * everywhere — map-side partial aggregation, the shuffle, and the
  * final merge all carry ≤ m positions per group, whatever the true
  * cardinality. The estimator `-m·ln(1 − occupied/m)` recovers the
  * cardinality (linear counting; standard error ~ √m⁻¹·(e^(n/m)−n/m−1)
  * — pick m ≳ 8× the expected cardinality for low-% error).
  *
  * Positions are md5-derived, so the sketch is deterministic across
  * engines, runs, and partitionings — the gate compares the occupied
  * counts exactly against DuckDB; the (float) estimator itself is
  * spec-verified instead, keeping libm `ln` differences out of the
  * oracle hash.
  */
object Sketch {

  /** The value's position in [0, m): first 8 md5 hex digits, mod m. */
  def lcPosition(value: Column, m: Int): Column =
    conv(substring(md5(concat(lit("lc:"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long") % m

  /** Per-group distinct sketch: (keys..., n_exact, sketch_m,
    * sketch_occupied). `n_exact` rides along for gate/verification
    * use; a production pipeline at unbounded cardinality would drop
    * it — the sketch columns are the bounded-memory product. */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     m: Int = 4096): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("n_exact"),
        lit(m).as("sketch_m"),
        count_distinct(lcPosition(col(valueCol), m)).as("sketch_occupied"))

  /** Linear-counting estimate from an occupied-position count. */
  def estimate(occupied: Long, m: Int): Double =
    -m.toDouble * math.log(1.0 - occupied.toDouble / m)

  /** The value's column in count-min row `j`: md5 of (row, value),
    * mod the sketch width. */
  def cmColumn(j: Column, value: Column, w: Int): Column =
    conv(substring(md5(concat(lit("cm:"), j.cast("string"), lit(":"),
      value.cast("string"))), 1, 8), 16, 10).cast("long") % w

  /** #37b count-min frequency sketch over an item stream: `d` hash
    * rows × `w` columns of occurrence counts. Where an exact per-item
    * frequency table shuffles one row PER DISTINCT ITEM (unbounded —
    * think token counts over a 100 TB corpus), the sketch state is
    * capped at d·w cells end to end: map-side partial aggregation,
    * the shuffle, and the merge all carry ≤ d·w rows, whatever the
    * true vocabulary size. A point estimate reads one cell per row
    * and takes the min ([[cmEstimate]]) — an overestimate by at most
    * the collision mass (ε = e/w of total count w.h.p.), NEVER an
    * underestimate. md5-derived columns keep the state deterministic
    * across engines — the gate compares cells exactly; the estimator
    * contract is spec-gated. Returns (sketch_row, sketch_col, cnt). */
  def countMin(items: DataFrame, valueCol: String,
               w: Int = 1024, d: Int = 4): DataFrame =
    items.select(col(valueCol).as("v"),
        explode(sequence(lit(0L), lit(d - 1L))).as("sketch_row"))
      .select(col("sketch_row"), cmColumn(col("sketch_row"), col("v"), w).as("sketch_col"))
      .groupBy(col("sketch_row"), col("sketch_col"))
      .agg(count(lit(1)).as("cnt"))

  /** #37c HyperLogLog distinct sketch: where linear counting saturates
    * once the load factor climbs (m must track the cardinality), HLL's
    * m registers estimate cardinalities FAR beyond m — the standard
    * 1.04/√m relative error is cardinality-independent — so one
    * m=2^p-register sketch (a few KB) covers anything from thousands
    * to billions of distinct values. Per-group state is capped at m
    * registers through partial agg, shuffle and merge (`max` is the
    * merge, trivially associative).
    *
    * Register geometry is md5-derived and integer-exact, so the state
    * is deterministic across engines/partitionings: the value's first
    * 8 md5 hex digits pick the register (mod m), the next 13 hex
    * digits (52 bits) give ρ = leading-zero count + 1, computed as
    * 53 − length(bin(x)) — both engines print bin() without leading
    * zeros, so no float log anywhere. The gate compares registers
    * exactly; the (float) estimator is spec-verified.
    */
  def hllRegisterOf(value: Column, m: Int): Column =
    conv(substring(md5(concat(lit("hll:"), value.cast("string"))), 1, 8), 16, 10)
      .cast("long") % m

  /** ρ of the value's 52-bit tail: leading zeros + 1 ∈ [1, 53]. */
  def hllRho(value: Column): Column = {
    val x = conv(substring(md5(concat(lit("hll:"), value.cast("string"))), 9, 13), 16, 10)
      .cast("long")
    when(x === 0L, lit(53L)).otherwise(lit(53L) - length(bin(x)).cast("long"))
  }

  /** Per-group HLL sketch state: (keys..., register, rho_max) — one row
    * per OCCUPIED register (empty registers are implicit zeros, so the
    * state never exceeds m rows per group however many values flow
    * through). */
  def hllSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                m: Int = 256): DataFrame =
    df.groupBy(keys.map(col) :+
        hllRegisterOf(col(valueCol), m).as("register"): _*)
      .agg(max(hllRho(col(valueCol))).as("rho_max"))

  /** HLL estimate from collected (register → ρmax) state (≤ m rows by
    * construction). Small-range correction falls back to linear
    * counting over the empty-register count, the standard recipe. */
  def hllEstimate(registers: Map[Long, Long], m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val z = (0 until m).map(b => math.pow(2.0, -registers.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / z
    val zeros = m - registers.count(_._2 > 0L)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** #37d cumulative HLL rollup — the MERGEABILITY story, which is the
    * whole point of sketching at 100 TB: per-bucket (e.g. daily) HLL
    * states merge into any larger window by `max` per register, with
    * NO rescan of history. "Distinct users to date, per day" as an
    * exact count needs the full history under each day; as a sketch
    * it's a running `max` over ≤ m rows per bucket. Output is the
    * running register state per bucket — integer-exact, oracle-gated;
    * feed any bucket's slice to [[hllEstimate]] for the cumulative
    * cardinality (spec-gated).
    *
    * The dense bucket×register frame costs buckets·m rows — bounded by
    * the sketch geometry, not the data. */
  def hllCumulative(df: DataFrame, timeCol: String, valueCol: String,
                    bucketSeconds: Long = 86400L, m: Int = 256): DataFrame = {
    val ts = col(timeCol).cast("long")
    val daily = df
      .withColumn("bucket_s", ts - pmod(ts, lit(bucketSeconds)))
      .groupBy(col("bucket_s"), hllRegisterOf(col(valueCol), m).as("register"))
      .agg(max(hllRho(col(valueCol))).as("rho_day"))
    val dense = daily.select("bucket_s").distinct()
      .select(col("bucket_s"), explode(sequence(lit(0L), lit(m - 1L))).as("register"))
      .join(daily, Seq("bucket_s", "register"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("register")).orderBy(col("bucket_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dense.withColumn("rho_max", max(col("rho_day")).over(w))
      .filter(col("rho_max").isNotNull)
      .select("bucket_s", "register", "rho_max")
  }

  /** #37g sliding-window HLL distinct (the rolling-DAU/WAU rollup at
    * sketch cost): per day bucket, the distinct-value register state
    * over the trailing `windowBuckets` days, by MERGING daily states —
    * HLL merge is max-per-register, so the sliding pass is one bounded
    * ×windowBuckets explode (each daily state votes into every window
    * it can reach — the exact-WAU #18j explode shape, but over m
    * register rows per day instead of user-day rows) + one
    * (day, register) max aggregate. Votes land only on days that exist
    * in the data (sparse day sets stay sparse). State per output day is
    * m registers whatever the cardinality; registers are md5-geometry
    * oracle-exact, the estimator is spec-gated against the exact
    * sliding-distinct operator. At 100 TB this replaces a 7× user-day
    * dedup carry with 7·m integer rows per day. */
  def hllSliding(df: DataFrame, timeCol: String, valueCol: String,
                 bucketSeconds: Long = 86400L, windowBuckets: Int = 7,
                 m: Int = 256): DataFrame = {
    val ts = col(timeCol).cast("long")
    val daily = df
      .withColumn("bucket_s", ts - pmod(ts, lit(bucketSeconds)))
      .groupBy(col("bucket_s"), hllRegisterOf(col(valueCol), m).as("register"))
      .agg(max(hllRho(col(valueCol))).as("rho_day"))
    val days = daily.select(col("bucket_s").as("target_s")).distinct()
    daily
      .select(col("bucket_s"), col("register"), col("rho_day"),
        explode(sequence(lit(0L), lit(windowBuckets - 1L))).as("off"))
      .select((col("bucket_s") + col("off") * bucketSeconds).as("target_s"),
        col("register"), col("rho_day"))
      .join(days, "target_s")
      .groupBy(col("target_s"), col("register"))
      .agg(max(col("rho_day")).as("rho_max"))
  }

  /** Point estimate for one value from collected sketch state (driver
    * side — the state is ≤ d·w rows by construction). */
  def cmEstimate(state: Map[(Long, Long), Long], value: String,
                 w: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until d).map { j =>
      val hex = md.digest(s"cm:$j:$value".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val colIdx = java.lang.Long.parseLong(hex, 16) % w
      state.getOrElse((j.toLong, colIdx), 0L)
    }.min
  }

  /** #37f theta/KMV set-operation sketch across groups: per group, keep
    * the k smallest 52-bit md5-derived hashes of the distinct n-gram
    * shingle set (a KMV "theta sketch"); every pair's union /
    * intersection / Jaccard is then estimated from the union of two
    * k-bounded samples — the sketch twin of [[Dedup.sourceOverlap]],
    * which joins the RAW per-group shingle sets and so carries
    * O(distinct shingles) per group through its shuffle. Here the
    * exchange carries exactly k rows per group, whatever the corpus
    * size; hashes are pure functions of content, so every engine, run,
    * and partitioning computes the identical sketch AND the identical
    * estimate (oracle-exact, no tolerance in the gate — the accuracy
    * tolerance lives in the spec against the exact operator).
    *
    * Estimator (Beyer et al. 2007 / theta-sketch form): rank the union
    * of the two samples ascending; bottom-k(bottom-k(A) ∪ bottom-k(B))
    * = bottom-k(A∪B), so θ = the k-th smallest is a valid KMV threshold
    * for A∪B and est|A∪B| = (k−1)·M/θ with M = 2^52 the hash domain.
    * The k−1 values strictly below θ are a uniform θ/M-rate sample of
    * A∪B, so est|A∩B| = (# of them present in BOTH samples)·M/θ and
    * ĵ = common/(k−1). A union sample smaller than k means both input
    * sketches were complete (θ pinned to M): all three estimates are
    * then exact counts.
    *
    * Scale shape: the distinct (group, hash) projection is the only
    * full-data pass; the bottom-k runs as a bounded-heap AGGREGATE
    * ([[Knn.topKByScore]] — ≤k rows per group leave every map task).
    * Pair enumeration and the union ranking operate on groups² × 2k
    * rows — driver-free, broadcast-sized, independent of corpus size. */
  def thetaOverlap(df: DataFrame, groupCol: String, textCol: String,
                   n: Int = 5, k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Rounding.portableRound
    val M = 1L << 52
    val sh = df.select(col(groupCol).as("grp"),
        explode(graft.functions.TextFunctions.wordShingles(col(textCol), n)).as("sg"))
      .select(col("grp"),
        conv(substring(md5(concat(lit("theta:"), col("sg"))), 1, 13), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val samp = Knn.topKByScore(sh, Seq("grp"), "h", "h", k, ascending = true)
      .select(col("grp"), col("h"))
    val grps = samp.select(col("grp")).distinct()
    val pairs = grps.select(col("grp").as("ga"))
      .join(broadcast(grps.select(col("grp").as("gb"))), col("ga") < col("gb"))
    val sa = pairs.join(samp.select(col("grp").as("ga"), col("h")), "ga")
      .select(col("ga"), col("gb"), col("h"))
    val sb = pairs.join(samp.select(col("grp").as("gb"), col("h")), "gb")
      .select(col("ga"), col("gb"), col("h"))
    val u = sa.union(sb).groupBy(col("ga"), col("gb"), col("h"))
      .agg(count(lit(1)).as("n_side")) // 1 or 2: h is distinct per side
    // ≤2k rows per pair by construction — the window is bounded, never raw data
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val ranked = u.withColumn("rn", row_number().over(w))
    ranked.groupBy(col("ga"), col("gb")).agg(
        count(lit(1)).as("n_samp"),
        max(when(col("rn") === k, col("h"))).as("_theta"),
        sum(when(col("rn") < k && col("n_side") === 2, 1L).otherwise(0L)).as("_c_below"),
        sum(when(col("n_side") === 2, 1L).otherwise(0L)).as("_c_all"))
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("n_samp"),
        coalesce(col("_theta"), lit(M)).as("theta"),
        when(col("_theta").isNull, col("n_samp").cast("double"))
          .otherwise(portableRound(
            (lit((k - 1).toLong) * lit(M)).cast("double") / col("_theta").cast("double"), 4))
          .as("est_union"),
        when(col("_theta").isNull, col("_c_all").cast("double"))
          .otherwise(portableRound(
            (col("_c_below") * lit(M)).cast("double") / col("_theta").cast("double"), 4))
          .as("est_intersection"),
        when(col("_theta").isNull,
            portableRound(col("_c_all").cast("double") / col("n_samp").cast("double"), 4))
          .otherwise(portableRound(
            col("_c_below").cast("double") / lit((k - 1).toDouble), 4))
          .as("est_jaccard"))
  }

  /** #37e KMV (bottom-k) quantile sketch: per group, the sample is the
    * k rows whose md5 rank over a unique row key is smallest — a
    * uniform, DETERMINISTIC sample that is a pure function of the ids
    * (every engine, run, and backfill draws the same one), and a
    * mergeable sketch: bottom-k of a union = bottom-k of each side's
    * bottom-k, so per-group state is capped at k everywhere. Quantile
    * estimates then read exact ranks off the sample.
    *
    * Scale shape (the point of a sketch): the hash rank is computed in
    * the scan, a window over (group, input partition) prunes each task
    * to its LOCAL bottom-k — the map-side partial this sketch family
    * always has — and only groups × partitions × k pruned rows ever
    * shuffle. Every post-shuffle window runs over ≤ k·partitions rows
    * per group (bounded, never raw data). The local prune is safe
    * under any partitioning: a globally-bottom-k row is bottom-k in
    * whichever partition it lands in.
    *
    * Returns long format (group, p, n_sample, est): est = the sample
    * value at exact rank ceil(p·n_sample) in (value, key) order —
    * integer rank math, no interpolation, engine-exact. Estimation
    * error follows sampling theory (~1/√k quantile deviation); k=256
    * holds p50/p90 to a few percent, raise k for tails. */
  def kmvQuantiles(df: DataFrame, groupCol: String, keyCol: String,
                   valueCol: String, k: Int = 256,
                   ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(groupCol).as("grp"),
      col(keyCol).as("key"), col(valueCol).as("v"),
      md5(concat(lit("kmv:"), col(keyCol).cast("string"))).as("hr"))
    val wLocal = Window.partitionBy(col("grp"), spark_partition_id())
      .orderBy(col("hr"), col("key"))
    val pruned = hashed.withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= k).drop("_lr")
    val wGlobal = Window.partitionBy(col("grp")).orderBy(col("hr"), col("key"))
    val sample = pruned.withColumn("r", row_number().over(wGlobal))
      .filter(col("r") <= k)
    val wGrp = Window.partitionBy(col("grp"))
    val ranked = sample
      .withColumn("n_sample", max(col("r")).over(wGrp))
      .withColumn("vrank",
        row_number().over(wGrp.orderBy(col("v"), col("key"))).cast("long"))
    val picks = explode(array(ps.map(lit): _*)).as("p")
    ranked.select(col("grp"), col("v"), col("n_sample"), col("vrank"), picks)
      .filter(col("vrank") ===
        greatest(lit(1L), ceil(col("p") * col("n_sample"))))
      .select(col("grp").as(groupCol), col("p"), col("n_sample"),
        col("v").as("est"))
  }
}
