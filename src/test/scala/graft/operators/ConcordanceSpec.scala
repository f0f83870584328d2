package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** tokenLift / sourceOverlap / phraseSearch / eventsMad on tiny
  * hand-computed corpora. */
class ConcordanceSpec extends SparkSpec {
  import spark.implicits._

  test("tokenLift: lift matches hand computation, minCount prunes") {
    // corpus: "a b" x3, "a c" x1, single-token doc must add no bigram
    val docs = Seq("a b", "a b", "a b", "a c", "z").toDF("text")
    val out = Curation.tokenLift(docs, "text", minCount = 3, topK = 10)
      .select("tok_a", "tok_b", "n_ab", "lift", "rank")
      .as[(String, String, Long, Double, Long)].collect()
    // unigrams: a=4 b=3 c=1 z=1, N=9; only (a,b) has support >= 3
    assert(out.toSeq == Seq(("a", "b", 3L, math.floor(3.0 * 9 / (4 * 3) * 10000 + 0.5) / 10000, 1L)))
  }

  test("sourceOverlap: jaccard over per-source distinct shingles") {
    // 2-gram shingles; s1 = {a b, b c}, s2 = {b c, c d}; common = {b c}
    val docs = Seq(("s1", "a b c"), ("s1", "a b"), ("s2", "b c d"))
      .toDF("source", "text")
    val out = Dedup.sourceOverlap(docs, "source", "text", n = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("s1", "s2", 2L, 2L, 1L, math.floor(1.0 / 3 * 10000 + 0.5) / 10000)))
  }

  test("phraseSearch: counts overlapping matches positionally") {
    val docs = Seq(
      (1L, "x a b a b y"), // "a b" at 1 and 3
      (2L, "a b"),         // at 0
      (3L, "b a"),         // none
      (4L, "a a b")        // at 1
    ).toDF("doc_id", "text")
    val out = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1L), (2L, 1L, 0L), (4L, 1L, 1L)))
    // 3-token phrase takes the fold path (m-1 joins)
    val tri = InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("a", "a", "b"))
      .as[(Long, Long, Long)].collect()
    assert(tri.toSeq == Seq((4L, 1L, 0L)))
  }

  test("containmentPairs: short doc quoted inside long doc scores 1.0") {
    // doc 2 mostly overlaps the tail of doc 1; containment scores it
    // by the SMALLER set (2/3) where jaccard would give 2/8
    val docs = Seq(
      (1L, "p q r s t u v w"), (2L, "u v w x"), (3L, "m n o")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 5, threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    // 5-shingles: doc1 {p..t, q..u, r..v, s..w}, doc2 {"u v w x"}, no overlap
    assert(out.isEmpty)
    val out2 = Dedup.containmentPairs(docs, "doc_id", "text", n = 2, threshold = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    // 2-shingles: doc2 {u v, v w, w x}; common with doc1 = {u v, v w} -> 2/3
    // below 0.9; doc 4 absent. Lower threshold finds the asymmetric pair
    assert(out2.isEmpty)
    val out3 = Dedup.containmentPairs(docs, "doc_id", "text", n = 2, threshold = 0.6)
      .as[(Long, Long, Long, Double)].collect()
    assert(out3.toSeq == Seq((1L, 2L, 2L, math.floor(2.0 / 3 * 10000 + 0.5) / 10000)))
  }

  test("containmentPairs: maxPairsPerId keeps each id_a's strongest pairs") {
    // doc 1 contains doc 2 fully (containment 1.0 by the smaller set)
    // and docs 3..5 partially (2/3 each): with budget 2, id_a=1 keeps
    // the 1.0 pair plus the lowest-id 2/3 pair (score desc, id_b asc)
    val base = "a b c d e f"
    val docs = Seq(
      (1L, base),            // shingles(2): {ab, bc, cd, de, ef}
      (2L, "a b c d"),       // {ab, bc, cd} ⊂ doc1 -> 1.0
      (3L, "b c d x"),       // {bc, cd, dx} -> 2/3
      (4L, "c d e y"),       // {cd, de, ey} -> 2/3
      (5L, "d e f z")        // {de, ef, fz} -> 2/3
    ).toDF("doc_id", "text")
    val all = Dedup.containmentPairs(docs, "doc_id", "text", n = 2,
        threshold = 0.6).as[(Long, Long, Long, Double)].collect().toSet
    // (2,3) also pairs: {bc,cd} of doc3's 3 shingles -> 2/3
    assert(all.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L)))
    // budget is per id_a: id_a=1 keeps 2 of its 4 pairs, id_a=2 keeps
    // its only pair
    val capped = Dedup.containmentPairs(docs, "doc_id", "text", n = 2,
        threshold = 0.6, maxPairsPerId = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(capped.map(p => (p._1, p._2)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // capped output rows are identical to the uncapped rows they keep
    assert(capped.subsetOf(all))
  }

  test("winnowPairs: shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // k=5, w=4: docs 1 and 2 embed the same 8-token run (= w+k-1) in
    // different contexts -> the guarantee applies; doc 3 is disjoint
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = Seq(
      (1L, s"x1 x2 x3 $run y1 y2"),
      (2L, s"z1 $run w1 w2 w3 w4"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", n = 5, window = 4,
      minShared = 1).as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    // a doc shorter than k tokens still fingerprints (whole-text gram)
    val short = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val sp = Dedup.winnowPairs(short, "doc_id", "text", n = 5, window = 4,
      minShared = 1).as[(Long, Long, Long)].collect()
    assert(sp.toSeq == Seq((1L, 2L, 1L)))
  }

  test("textSurprisal: integer bit-unit surprise, rare tokens score high") {
    // corpus: "a" x8 + "b" x1 -> N=9; surprise(a)=len(bin(9/8=1))=1,
    // surprise(b)=len(bin(9))=4
    val docs = Seq((1L, "a a a a"), (2L, "a a a a b")).toDF("doc_id", "text")
    val out = graft.LlmQueries.surprisalOf(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 4L, 4L, 1.0), (2L, 5L, 8L, 1.6)))
  }

  test("eventsMad: exact median/MAD and outlier flags per group") {
    // group g: values 1,2,3,4,100 -> med 3, |dev| = 2,1,0,1,97 -> mad 1
    // outlier: 97 > 4.4478*1 -> 1 outlier; mean/std would have flagged none
    // group h (even n): 1,2,3,4 -> med 2.5, devs 1.5,.5,.5,1.5 -> mad 1.0
    val ev = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)) ++
        Seq(1.0, 2.0, 3.0, 4.0).map(("h", _)))
      .zipWithIndex.map { case ((t, v), i) => (t, v, i.toLong) }
      .toDF("event_type", "value", "event_id")
    val byType = graft.Analytics.eventsMadOf(ev)
      .orderBy("event_type")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(byType.toSeq == Seq(("g", 5L, 3.0, 1.0, 1L), ("h", 4L, 2.5, 1.0, 0L)))
  }
}
