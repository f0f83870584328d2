package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contract specs for the round-4 operators: incremental LSH dedup and
  * embedding centroids. */
class OperatorsSpec2 extends SparkSpec {

  import spark.implicits._

  test("incremental minhash-lsh: exact copies flag at jaccard 1.0 with the right match") {
    val seen = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "one two three four five six seven eight nine ten eleven"),
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // copy of 10
      (21L, "completely unrelated content about storage partitioned joins"),
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhashLsh(incoming, seen, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(20L) == ((true, Some(10L), Some(1.0))))
    assert(out(21L) == ((false, None, None)))
  }

  test("incremental minhash-lsh: one row per incoming doc even with multiple seen matches") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val seen = Seq((10L, text), (11L, text)).toDF("doc_id", "text")
    val incoming = Seq((20L, text)).toDF("doc_id", "text")
    val out = Dedup.incrementalMinhashLsh(incoming, seen, "doc_id", "text").collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 10L) // ties pick the lowest seen id
  }

  test("centroids: per-label element-wise mean in long format") {
    val embs = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, 6.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Knn.centroids(embs, "label", "embedding")
      .select("label", "dim", "n_vectors", "centroid")
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(out == Set((0, 0L, 2L, 2.0), (0, 1L, 2L, 4.0),
      (1, 0L, 1L, 10.0), (1, 1L, 1L, 20.0)))
  }

  test("distinct sketch: estimator within 5% of exact at low load factor") {
    val out = Sketch.distinctSketch(
        graft.Tables.events(spark, sfDir), Seq("event_type"), "user_id", m = 4096)
      .as[(String, Long, Int, Long)].collect()
    assert(out.nonEmpty)
    for ((et, exact, m, occ) <- out) {
      val est = Sketch.estimate(occ, m)
      assert(math.abs(est - exact) / exact < 0.05,
        s"$et: estimate $est vs exact $exact")
      assert(occ <= exact) // positions can only collide, never split
    }
  }

  test("distinct sketch: occupied count is partitioning-invariant") {
    val ev = graft.Tables.events(spark, sfDir)
    val a = Sketch.distinctSketch(ev, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val b = Sketch.distinctSketch(ev.repartition(17), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == b)
  }

  test("ffill: fills from the last non-null per key, leading nulls stay null, multi-column") {
    val df = Seq(
      (1L, 1L, Some(10.0), None: Option[String]),
      (1L, 2L, None, Some("x")),
      (1L, 3L, None, None),
      (1L, 4L, Some(40.0), Some("y")),
      (2L, 1L, None, None), // leading nulls: no predecessor to fill from
      (2L, 2L, Some(5.0), Some("z")),
    ).toDF("k", "t", "v", "s")
    val out = AsOf.ffill(df, key = Seq("k"), time = "t", tieBreak = "t",
        cols = Seq("v", "s"))
      .orderBy("k", "t")
      .as[(Long, Long, Option[Double], Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, 1L, Some(10.0), None),
      (1L, 2L, Some(10.0), Some("x")),
      (1L, 3L, Some(10.0), Some("x")),
      (1L, 4L, Some(40.0), Some("y")),
      (2L, 1L, None, None),
      (2L, 2L, Some(5.0), Some("z"))))
  }

  test("centroids on the embeddings table: labels x 64 dims, counts match label sizes") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Knn.centroids(e, "label", "embedding")
    val labels = e.select("label").distinct().count()
    assert(out.count() == labels * 64)
    val sizes = e.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nv = out.select("label", "n_vectors").distinct()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nv == sizes)
  }
}
