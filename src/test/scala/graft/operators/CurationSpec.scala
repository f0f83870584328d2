package graft.operators

import graft.SparkSpec

/** Specs for segment-level dedup (#21d/#21e) and corpus curation
  * (#30l budget sampling, #30m novelty). */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private val eight = "w1 w2 w3 w4 w5 w6 w7 w8"

  test("segment corpus dedup: shared segments drop, unique segments survive in order") {
    val docs = Seq(
      (1L, s"$eight a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"$eight b1 b2 b3 b4 b5 b6 b7 b8"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedupCorpus(docs, "doc_id", "text", segTokens = 8, maxDf = 1)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 1L)))
    assert(out(0)._4 == "a1 a2 a3 a4 a5 a6 a7 a8")
    assert(out(1)._4 == "b1 b2 b3 b4 b5 b6 b7 b8")
    assert(out(2)._4 == "c1 c2 c3 c4 c5 c6 c7 c8")
  }

  test("segment corpus dedup: an all-boilerplate doc comes back empty, not missing") {
    val docs = Seq((1L, eight), (2L, eight), (3L, s"$eight x1 x2"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedupCorpus(docs, "doc_id", "text", segTokens = 8, maxDf = 1)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == ((1L, 1L, 0L, "")))
    assert(out(1) == ((2L, 1L, 0L, "")))
    assert(out(2) == ((3L, 2L, 1L, "x1 x2"))) // the partial tail segment is its own unit
  }

  test("segment corpus dedup: repeats WITHIN one doc are not boilerplate (df counts docs)") {
    val docs = Seq((1L, s"$eight $eight"), (2L, "y1 y2 y3 y4 y5 y6 y7 y8"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedupCorpus(docs, "doc_id", "text", segTokens = 8, maxDf = 1)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 2L, s"$eight $eight"))) // df=1: kept, both copies
  }

  test("intra-doc segment dedup keeps first occurrences in order, fully narrow") {
    val docs = Seq(
      (1L, "a b c d a b e f"), // segs: [a b][c d][a b][e f] → [a b][c d][e f]
      (2L, "x y"),
    ).toDF("doc_id", "text")
    val op = Dedup.segmentDedupIntra(docs, "doc_id", "text", segTokens = 2)
    val out = op.as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 4L, 3L, "a b c d e f")))
    assert(out(1) == ((2L, 1L, 1L, "x y")))
    // scale contract: no shuffle anywhere in the plan
    assert(!op.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("budget sample: per-source running total respects the budget, rank is deterministic") {
    // src A: quality orders 11 > 12 > 13 (longer = higher quality here);
    // 40-token budget admits exactly the top two (17+16=33, +15 > 40)
    val docs = Seq(
      (11L, "A", Seq.fill(17)("the").mkString(" ")),
      (12L, "A", Seq.fill(16)("the").mkString(" ")),
      (13L, "A", Seq.fill(15)("the").mkString(" ")),
      (21L, "B", Seq.fill(40)("the").mkString(" ")),
    ).toDF("doc_id", "source", "text")
    val out = Curation.budgetSample(docs, "doc_id", "text", "source", budgetTokens = 40L)
    val kept = out.select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(11L, 12L, 21L))
    assert(kept(11L) == 17L && kept(12L) == 33L)
    assert(kept(21L) == 40L) // cum == budget is kept: the boundary is inclusive
  }

  test("budget sample ties break by id: equal-quality docs admit lowest ids first") {
    val text = Seq.fill(10)("the").mkString(" ")
    val docs = Seq((3L, "S", text), (1L, "S", text), (2L, "S", text))
      .toDF("doc_id", "source", "text")
    val kept = Curation.budgetSample(docs, "doc_id", "text", "source", budgetTokens = 20L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("balanced sample: smallest source keeps everything, larger sources flatten toward it") {
    // src S: 4 docs (the floor), src L: 40 docs → L's acceptance rate is 4/40
    val docs = ((1L to 4L).map(i => (i, "S")) ++ (101L to 140L).map(i => (i, "L")))
      .toDF("doc_id", "source")
    val out = Curation.balancedSample(docs, "doc_id", "source")
      .as[(Long, String)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("S") == Set(1L, 2L, 3L, 4L)) // rate 1.0: all kept
    // L keeps ~10% — md5 buckets are deterministic, so the exact set is
    // stable; bound it loosely and re-run to pin reproducibility
    assert(byGrp("L").size < 20 && byGrp("L").subsetOf((101L to 140L).toSet))
    val again = Curation.balancedSample(docs, "doc_id", "source")
      .as[(Long, String)].collect().toSet
    assert(again == out.toSet)
  }

  test("balanced sample on an already-balanced corpus is the identity") {
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val out = Curation.balancedSample(docs, "doc_id", "source")
    assert(out.count() == 30L) // every rate is min/cnt = 1 → nothing drops
  }

  test("group sample: exactly k per group, short groups return whole, ranks contiguous") {
    val docs = ((1L to 20L).map(i => (i, "big")) ++ Seq((31L, "tiny"), (32L, "tiny")))
      .toDF("doc_id", "source")
    val out = Curation.groupSample(docs, "doc_id", "source", k = 5)
      .as[(Long, String, Long)].collect()
    val byGrp = out.groupBy(_._2)
    assert(byGrp("big").length == 5 && byGrp("tiny").length == 2)
    assert(byGrp("big").map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val again = Curation.groupSample(docs, "doc_id", "source", k = 5)
      .as[(Long, String, Long)].collect().toSet
    assert(again == out.toSet) // pure function of the ids
  }

  test("group sample: two-phase prune is partitioning-independent") {
    val docs = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.groupSample(df, "doc_id", "source", k = 7)
        .as[(Long, String, Long)].collect().sortBy(t => (t._2, t._3)).toSeq
    assert(run(docs) == run(docs.repartition(13)),
      "the local bottom-k prune must keep every globally-bottom-k row " +
      "under any partitioning")
  }

  test("novelty: a doc cloned elsewhere scores 0, unique content scores 1") {
    val clone = "p q r s t u v w x y z p2 q2 r2 s2"
    val docs = Seq(
      (1L, clone), (2L, clone),
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
    ).toDF("doc_id", "text")
    val out = Curation.noveltyScores(docs, "doc_id", "text", n = 5)
      .select("id", "novelty").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0)
    assert(out(3L) == 1.0)
  }
}
