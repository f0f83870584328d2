package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The window→aggregate rewrites (Knn.topKByScore, AsOf.latestPerKey)
  * must be indistinguishable from the row_number forms they replaced —
  * including at the edges the corpus-shaped oracle data never stresses:
  * heavy score ties, k larger than the group, single-row groups, and
  * partial-aggregate merges across many input partitions (the map-side
  * pruning is exactly the code path a single-partition test would
  * skip). Randomized under fixed seeds so failures reproduce. */
class TopKAggregateSpec extends SparkSpec {

  private def rows(seed: Long, n: Int): Seq[(Int, Double, Long)] = {
    // few groups + a tiny score alphabet → dense (group, score) ties;
    // ids unique so every ordering is still total
    val gen = for {
      g <- Gen.choose(1, 4)
      s <- Gen.oneOf(0.1, 0.2, 0.3, 0.4)
    } yield (g, s)
    (0 until n).map { i =>
      val (g, s) = gen.apply(Gen.Parameters.default, Seed(seed * 1000 + i))
        .getOrElse((1, 0.1))
      (g, s, i.toLong)
    }
  }

  test("topKByScore equals the row_number window form, both directions") {
    import spark.implicits._
    for (seed <- 1L to 3L; k <- Seq(1, 3, 100); parts <- Seq(1, 7)) {
      val df = rows(seed, 200).toDF("q", "score", "id").repartition(parts)
      for (asc <- Seq(false, true)) {
        val w = Window.partitionBy(col("q"))
          .orderBy(if (asc) col("score").asc else col("score").desc, col("id"))
        val windowForm = df.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select("q", "id", "rank", "score")
          .as[(Int, Long, Int, Double)].collect().sorted
        val aggForm = Knn
          .topKByScore(df, Seq("q"), "score", "id", k, ascending = asc)
          .select("q", "id", "rank", "score")
          .as[(Int, Long, Int, Double)].collect().sorted
        assert(aggForm.toSeq == windowForm.toSeq,
          s"mismatch at seed=$seed k=$k parts=$parts asc=$asc")
      }
    }
  }

  test("latestPerKey equals the row_number window form under ties") {
    import spark.implicits._
    for (seed <- 1L to 3L; parts <- Seq(1, 7)) {
      val df = rows(seed, 200)
        .map { case (g, s, id) => (g.toLong, (s * 10).toLong, id, s"p$id") }
        .toDF("k", "t", "id", "payload").repartition(parts)
      val w = Window.partitionBy(col("k")).orderBy(col("t").desc, col("id").desc)
      val windowForm = df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
        .as[(Long, Long, Long, String)].collect().sorted
      val aggForm = AsOf.latestPerKey(df, Seq("k"), "t", "id")
        .as[(Long, Long, Long, String)].collect().sorted
      assert(aggForm.toSeq == windowForm.toSeq, s"seed=$seed parts=$parts")
    }
  }
}
