package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contract specs for the theta/KMV set-operation sketch (#37f). The
  * correctness gate pins the estimator's VALUE (deterministic hash
  * math, oracle-exact); these specs pin what the gate can't — that the
  * estimates are close to the exact operator, and that the sketch
  * degrades to exact counts when the inputs fit.
  */
class ThetaSketchSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("theta estimates track the exact overlap operator (k=128)") {
    val exact = Dedup.sourceOverlap(docs, "source", "text", n = 5)
      .select(col("source_a"), col("source_b"),
        (col("n_a") + col("n_b") - col("n_common")).cast("double").as("true_union"),
        col("n_common").cast("double").as("true_inter"),
        col("jaccard").as("true_j"))
    val est = Sketch.thetaOverlap(docs, "source", "text", n = 5, k = 128)
    val joined = est.join(exact, Seq("source_a", "source_b"), "inner")
      .select(col("est_union"), col("true_union"),
        col("est_intersection"), col("true_inter"),
        col("est_jaccard"), col("true_j"))
      .as[(Double, Double, Double, Double, Double, Double)].collect()
    assert(joined.length > 10, "enough pairs to make the bound meaningful")
    // KMV with k=128: σ(jaccard) ≈ 1/√(k−1) ≈ 0.089 — 0.2 is >2σ slack
    val jErr = joined.map { case (_, _, _, _, ej, tj) => math.abs(ej - tj) }
    assert(jErr.max < 0.2, s"max jaccard error ${jErr.max}")
    // union cardinality: relative error ~1/√(k−2) ≈ 9% at 1σ; allow 35%
    val uErr = joined.map { case (eu, tu, _, _, _, _) => math.abs(eu - tu) / tu }
    assert(uErr.max < 0.35, s"max union rel-error ${uErr.max}")
    // intersection in absolute terms of the union scale (the additive
    // estimator bound): within 20% of the union size
    val iErr = joined.map { case (_, tu, ei, ti, _, _) => math.abs(ei - ti) / tu }
    assert(iErr.max < 0.2, s"max intersection error (rel to union) ${iErr.max}")
  }

  test("sketch degrades to exact counts when both sides fit in k") {
    // 3 tokens per doc -> every doc contributes exactly ONE <5-token
    // shingle (the whole text); 6 distinct values per group << k
    val df = Seq(
      ("a", "x1 y1 z1"), ("a", "x2 y2 z2"), ("a", "c1 c2 c3"), ("a", "c4 c5 c6"),
      ("b", "w1 v1 u1"), ("b", "w2 v2 u2"), ("b", "c1 c2 c3"), ("b", "c4 c5 c6"),
    ).toDF("source", "text")
    val out = Sketch.thetaOverlap(df, "source", "text", n = 5, k = 128)
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    assert(out.length == 1)
    val (sa, sb, nSamp, theta, eu, ei, ej) = out.head
    assert((sa, sb) == (("a", "b")))
    assert(nSamp == 6L, "union of 4+4 with 2 common = 6 distinct")
    assert(theta == (1L << 52), "complete sketches pin theta to the hash-domain max")
    assert(eu == 6.0 && ei == 2.0, "exact counts in the small regime")
    assert(math.abs(ej - 0.3333) < 1e-9, "2/6 portable-rounded to 4")
  }
}
