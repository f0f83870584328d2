package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Contract specs for the SemDeDup + k-means-refinement additions. */
class OperatorsSpec4 extends SparkSpec {

  import spark.implicits._

  private def embs = Tables.embeddings(spark, sfDir)

  // ------------------------------------------------------------ Dedup.semantic

  test("semantic dedup: keep-first rule within cells on a crafted corpus") {
    // cells = 2 -> seeds are ids 0 ([1,0]) and 1 ([0,1]); 2 and 3 land
    // in 0's cell, 4 in 1's. Threshold .9: 2 dups against 0; 3 is near
    // ONLY 2 (not 0) and still flags — earlier-similar, kept or not;
    // 4 is alone with seed 1 and similar to it.
    val df = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f)),
      (2L, Array(0.995f, 0.1f)),
      (3L, Array(0.97f, 0.243f)),
      (4L, Array(0.1f, 0.995f)),
    ).toDF("vec_id", "embedding")
    val out = Dedup.semantic(df, "vec_id", "embedding", cells = 2, threshold = 0.9)
      .select("id", "cell", "is_dup")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(0L) == ((0L, false)), "first of its cell is never a dup")
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((0L, true)), "near seed 0")
    assert(out(3L) == ((0L, true)), "near an earlier non-seed row")
    assert(out(4L) == ((1L, true)), "near seed 1 in the other cell")
  }

  test("semantic dedup flags = within-cell exact pairs (independent recompute)") {
    val cents = Knn.seedCentroids(embs, "vec_id", "embedding", cells = 16)
    val assigned = embs.select(col("vec_id"),
      element_at(Knn.nearestCells(cents, col("embedding"), 1), 1).as("cell"))
    // reference: all exact pairs >= threshold, kept only when same-cell
    val pairs = Dedup.embeddingPairs(embs, "vec_id", "embedding",
        threshold = 0.35, exact = true)
      .join(assigned.select(col("vec_id").as("id_a"), col("cell").as("cell_a")), "id_a")
      .join(assigned.select(col("vec_id").as("id_b"), col("cell").as("cell_b")), "id_b")
      .filter(col("cell_a") === col("cell_b"))
    val expect = pairs.select(col("id_b").as("id")).distinct()
      .as[Long].collect().toSet
    val got = Dedup.semantic(embs, "vec_id", "embedding", cells = 16, threshold = 0.35)
      .filter(col("is_dup")).select("id").as[Long].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty, "corpus must exercise the dup path")
  }

  test("semantic dedup plan: bucketed self-join, no all-pairs product") {
    val plan = Dedup.semantic(embs, "vec_id", "embedding")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "within-cell pass must join on the cell key, not the all-pairs product")
  }

  // ------------------------------------------------------------ kmeansRefine

  test("kmeans refine: per-cell movement invariants on the corpus") {
    val out = Knn.kmeansRefine(embs, "vec_id", "embedding", cells = 16)
      .select("cell", "n_seed", "n_refined", "n_stay")
      .as[(Long, Long, Long, Long)].collect()
    val n = embs.count()
    assert(out.length == 16, "one row per seed cell")
    assert(out.map(_._2).sum == n, "seed assignment partitions the corpus")
    assert(out.map(_._3).sum == n, "refined assignment partitions the corpus")
    out.foreach { case (cell, seed, refined, stay) =>
      assert(stay <= seed && stay <= refined,
        s"cell $cell: stayers are a subset of both assignments")
      assert(seed >= 1, s"cell $cell holds at least its seed vector")
    }
    assert(out.map(_._4).sum < n, "one Lloyd step moves at least one vector " +
      "on this corpus (fixed synthetic data; exercises the refinement)")
  }

  test("kmeans refine is deterministic (merge-order-pinned means)") {
    def run() = Knn.kmeansRefine(embs, "vec_id", "embedding", cells = 16)
      .orderBy("cell").as[(Long, Long, Long, Long)].collect().toSeq
    assert(run() == run())
  }

  test("kmeans refine: further iterations keep the partition invariants") {
    val out = Knn.kmeansRefine(embs, "vec_id", "embedding", cells = 16, iters = 3)
      .as[(Long, Long, Long, Long)].collect()
    val n = embs.count()
    assert(out.map(_._2).sum == n && out.map(_._3).sum == n)
    out.foreach { case (_, seed, refined, stay) =>
      assert(stay <= seed && stay <= refined)
    }
    // iterating must not be a no-op relative to one step on this corpus
    val one = Knn.kmeansRefine(embs, "vec_id", "embedding", cells = 16)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._4).sum != one.map(_._4).sum ||
           out.sortBy(_._1).toSeq != one.sortBy(_._1).toSeq,
      "three Lloyd steps should differ from one on the synthetic corpus")
  }

  // --------------------------------------------------------------- bpePairs

  test("bpe pairs: word-frequency weighting, overlap, tie-break, topK") {
    // "abab" contributes pairs ab, ba, ab (overlapping); word freq 2
    // doubles every pair; single-char words drop before pairing
    val df = Seq("abab abab x cd", "cd").toDF("text")
    val out = Curation.bpePairs(df, "text", topK = 2)
      .select("pair", "n_pairs", "rank")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("ab", 4L), ("ba", 2L)).zipWithIndex.map {
      case ((p, n), i) => (p, n, i + 1L)
    }, s"got ${out.toSeq}; cd (n=2) loses the tie to ba by pair order " +
       "and then falls outside topK=2")
  }

  // --------------------------------------------------------- chunkWindows

  test("chunk windows: counts, offsets, partial tail, exact-fit boundary") {
    // 10 tokens, win=4, stride=3: n_win = 1+ceil(6/3) = 3 — starts
    // 0,3,6 and the last window ends exactly at token 10 (no tail)
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    // 8 tokens: 1+ceil(4/3) = 3 — last window is the 2-token tail
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val three = "a b c" // short doc: one partial window
    val df = Seq((1L, ten), (2L, eight), (3L, three)).toDF("doc_id", "text")
    val out = Curation.chunkWindows(df, "doc_id", "text", win = 4, stride = 3)
      .select("doc_id", "win_id", "start_tok", "win_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    assert(out(1L) == Seq((0L, 4L), (3L, 4L), (6L, 4L)),
      "every token covered, no empty tail window past the end")
    assert(out(2L) == Seq((0L, 4L), (3L, 4L), (6L, 2L)))
    assert(out(3L) == Seq((0L, 3L)))
  }

  // ------------------------------------------------------- centroidOutliers

  test("centroid outliers: far-from-every-cluster flags, near points pass") {
    // seeds: [1,0] and [0,1]; id 2 hugs seed 0; id 3 is ~diagonal-far
    // from both (cos ~= .707 to each) — outlier at threshold .9
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.99f, 0.05f)), (3L, Array(0.72f, 0.69f)),
    ).toDF("vec_id", "embedding")
    val out = Knn.centroidOutliers(df, "vec_id", "embedding",
        cells = 2, threshold = 0.9)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(!out(0L) && !out(1L) && !out(2L), "seeds and hug are inliers")
    assert(out(3L), "equidistant-far point flags")
  }

  // -------------------------------------------------------- ann_ivf_refined

  test("ivf over Lloyd-refined centroids: recall holds vs brute force") {
    val e = embs
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    val truth = pairs(Knn.bruteForce(e, q, "vec_id", "embedding", k = 5))
    val seed = pairs(Knn.ivf(e, q, "vec_id", "embedding", k = 5))
    val refined = pairs(Knn.ivf(e, q, "vec_id", "embedding", k = 5,
      centroids = Some(Knn.kmeansCentroids(e, "vec_id", "embedding"))))
    def recall(s: Set[(Long, Long)]) = s.intersect(truth).size.toDouble / truth.size
    assert(recall(refined) >= 0.5,
      s"refined-centroid recall ${recall(refined)} below floor")
    assert(recall(refined) >= recall(seed) - 0.1,
      s"refinement collapsed recall: seed ${recall(seed)} -> refined ${recall(refined)}")
  }

  // -------------------------------------------------------------- ann_ivfadc

  test("ivfadc: composed cells+residual-PQ geometry keeps recall vs brute force") {
    val e = embs
    val q = e.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = pairs(Knn.bruteForce(e, q, "vec_id", "embedding", k = 5))
    val adc = pairs(Knn.ivfAdcSearch(e, q, "vec_id", "embedding", k = 5))
    val recall = adc.intersect(truth).size.toDouble / truth.size
    // the ORACLE gate proves ivfadc returns its own declared result
    // exactly; this proves the declared result is a decent ANN answer.
    // Floor reflects double quantization (coarse cells + untrained
    // 32x128 residual codes) at test scale — measured 0.49 at the
    // defaults; the dial is (nprobe, m, kcb), not the bar.
    assert(recall >= 0.4, s"ivfadc recall@5 = $recall below 0.4 floor")
  }

  test("ivfadc: past the dtab broadcast bound the un-hinted join is identical") {
    val e = embs
    val q = e.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "adc_dist")
        .as[(Long, Long, Long, Double)].collect().toSet
    val hinted = Knn.ivfAdcSearch(e, q, "vec_id", "embedding", k = 5)
    // bound 0 models a query batch too large to broadcast: the hint is
    // dropped and the (cell, subspace, code) join shuffles both sides
    val unhinted = Knn.ivfAdcSearch(e, q, "vec_id", "embedding", k = 5,
      dtabBroadcastMaxRows = 0L)
    assert(rows(unhinted) == rows(hinted),
      "shuffle-join dtab path diverged from the broadcast path")
  }

  // ----------------------------------------------------------- kmvQuantiles

  test("kmv quantile sketch: estimates track true quantiles on events") {
    val e = Tables.events(spark, sfDir)
    val est = Sketch.kmvQuantiles(e, "event_type", "event_id", "value", k = 256)
      .select("event_type", "p", "est")
      .as[(String, Double, Double)].collect()
      .map { case (g, p, v) => (g, p) -> v }.toMap
    // exact per-group quantiles via sort (test-side only)
    val truth = e.select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted
        g -> ((p: Double) => sorted(((p * sorted.length).ceil.toInt - 1)
          .max(0).min(sorted.length - 1)))
      }
    est.foreach { case ((g, p), v) =>
      val t = truth(g)(p)
      val spread = truth(g)(0.99) - truth(g)(0.01)
      assert(math.abs(v - t) <= spread * 0.15,
        s"$g p=$p: est $v too far from true $t (spread $spread)")
    }
    assert(est.size == truth.size * 3, "3 quantiles per group")
  }

  test("kmv quantile sketch: sample is capped at k and merge-stable") {
    val e = Tables.events(spark, sfDir)
    val n = Sketch.kmvQuantiles(e, "event_type", "event_id", "value", k = 64)
      .select("n_sample").as[Long].collect()
    assert(n.forall(_ <= 64))
    // repartitioning the input must not change the sample (the local
    // prune keeps every globally-bottom-k row under ANY partitioning)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketch.kmvQuantiles(df, "event_type", "event_id", "value", k = 64)
        .orderBy("event_type", "p")
        .as[(String, Double, Long, Double)].collect().toSeq
    assert(run(e) == run(e.repartition(17)))
  }

  test("embedding LSH caps: duplicate skew stays linear and connected") {
    import spark.implicits._
    // a crawl-duplicate clique: 120 near-identical vectors (one base
    // direction, id-scaled magnitude so cosine = 1.0 across the clique)
    // plus a handful of distinct directions
    val dim = 8
    val clique = (1L to 120L).map { i =>
      (i, Array.tabulate(dim)(j => ((j + 1) * (1.0f + i * 1e-6f))))
    }
    val distinct = (200L to 205L).map { i =>
      (i, Array.tabulate(dim)(j => if (j == (i % dim).toInt) 1.0f else 0.01f))
    }
    val df = (clique ++ distinct).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding",
      threshold = 0.9, exact = false, planes = 4, tables = 2,
      maxBucket = 8, maxPairsPerId = 6)
    val rows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // output budget: at most 6 pairs per id_a
    val perId = rows.groupBy(_._1).view.mapValues(_.size)
    assert(perId.values.forall(_ <= 6), s"budget violated: $perId")
    // linear, not quadratic: 120 clique members × budget bounds the
    // output far below the 7140-pair uncapped clique
    assert(rows.length <= 126 * 6)
    // star edges keep the clique ONE connected component
    val comp = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")))
      .filter(col("id") <= 120L)
      .select("cluster_id").distinct().count()
    assert(comp == 1L, "duplicate-skew clique must stay one component")
    // and the capped form agrees with exact on a NON-skewed corpus
    val small = distinct.toDF("vec_id", "embedding")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(norm(Dedup.embeddingPairs(small, "vec_id", "embedding",
        threshold = 0.35, exact = false, planes = 4, tables = 2,
        maxBucket = 8, maxPairsPerId = 6)).subsetOf(
      norm(Dedup.embeddingPairs(small, "vec_id", "embedding",
        threshold = 0.35, exact = true))))
  }
}
