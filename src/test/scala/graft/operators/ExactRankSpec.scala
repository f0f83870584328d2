package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-pass exact-rank utility must equal a global row_number
  * window bit-for-bit while keeping every plan stage parallel — no
  * Exchange SinglePartition anywhere in the consumers' plans. */
class ExactRankSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.collect() // force AQE-final plan
    df.queryExecution.executedPlan.toString
  }

  test("withGlobalRowNumber equals a global row_number window, including heavy ties") {
    import spark.implicits._
    // values with heavy ties (i % 7) — keyCol must break them
    val df = (1 to 5000).map(i => (i.toLong, (i % 7) * 1.0)).toDF("k", "v")
    val (got, n) = ExactRank.withGlobalRowNumber(df, "v", "k", "rn", shards = 16)
    assert(n === 5000L)
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
    assert(got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ===
      want.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("all-equal values degenerate to one shard but stay correct") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("k", "v")
    val (got, n) = ExactRank.withGlobalRowNumber(df, "v", "k", "rn")
    assert(n === 100L)
    assert(got.orderBy("rn").collect().map(_.getLong(0)).toSeq === (1L to 100L))
  }

  test("withGroupedRowNumber equals a per-group row_number window, skewed groups") {
    import spark.implicits._
    // group 'a' holds 90% of rows — the shape that serializes a plain
    // per-group window into one task
    val df = ((1 to 4500).map(i => ("a", (i % 11) * 1.0, i.toLong)) ++
      (1 to 500).map(i => ("b", (i % 7) * 1.0, 10000L + i)))
      .toDF("g", "v", "k")
    val got = ExactRank.withGroupedRowNumber(df, "g", "v", "k", "rn", "cnt", shards = 8)
    val want = df
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("g")).orderBy(col("v"), col("k"))).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
    assert(got.select("k", "rn", "cnt").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      want.select("k", "rn", "cnt").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the ranking window is partitioned by (group, shard), not the
    // group alone — the shard column must reach the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_rank_shard"), s"no shard in window partitioning:\n$plan")
  }

  test("groupedRankSelect returns exactly the per-group target-rank rows") {
    import spark.implicits._
    val df = ((1 to 4501).map(i => ("a", (i % 11) * 1.0, i.toLong)) ++
      (1 to 500).map(i => ("b", (i % 7) * 1.0, 10000L + i)))
      .toDF("g", "v", "k")
    // lower/upper median targets (odd group 'a': both coincide)
    val got = ExactRank.groupedRankSelect(df, "g", "v", "k", "rn", "cnt",
      targets = Seq(c => floor((c + 1) / 2), c => floor((c + 2) / 2)), shards = 8)
    val want = df
      .withColumn("rn", row_number()
        .over(Window.partitionBy(col("g")).orderBy(col("v"), col("k"))).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") === floor((col("cnt") + 1) / 2) ||
              col("rn") === floor((col("cnt") + 2) / 2))
    assert(got.select("g", "k", "rn", "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet ===
      want.select("g", "k", "rn", "cnt").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("globalRankSelect returns exactly the target-rank rows") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, (i % 13) * 1.0)).toDF("k", "v")
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val (got, n) = ExactRank.globalRankSelect(df, "v", "k", "rn",
      targetsOf = n => qs.map(q => math.ceil(q * n).toLong), shards = 16)
    assert(n === 5000L)
    val targets = qs.map(q => math.ceil(q * 5000).toLong).distinct.toSet
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .filter(col("rn").isin(targets.toSeq: _*))
    assert(got.select("k", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      want.select("k", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("qcut and length_percentiles plan with no single-partition stage") {
    val qcut = graft.Analytics.qcutOrderValue(spark, sfDir)
    val qPlan = planOf(qcut)
    assert(!qPlan.contains("SinglePartition"), s"serial stage in qcut plan:\n$qPlan")
    val lp = graft.LlmQueries.lengthPercentiles(spark, sfDir)
    val lPlan = planOf(lp)
    assert(!lPlan.contains("SinglePartition"), s"serial stage in percentile plan:\n$lPlan")
  }
}
