package graft.operators

import graft.SparkSpec

/** Contract specs for exact repeated-substring span detection (#21i). */
class DuplicateSpansSpec extends SparkSpec {

  import spark.implicits._

  private def spans(rows: (Long, String)*) =
    Dedup.duplicateSpans(rows.toDF("doc_id", "text"), "doc_id", "text", w = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3)).sorted.toSeq

  test("a shared substring yields one maximal span in each doc, at its own offset") {
    // 20-char shared payload inside unique noise; w=10 → duplicated
    // window positions are exactly the 11 starts fully inside the
    // payload, merging into ONE span covering the whole payload
    val shared = "ABCDEFGHIJKLMNOPQRST"
    val out = spans(
      1L -> s"xxxxx${shared}yyyyyyy",
      2L -> s"qqqqqqqqqq${shared}rr")
    assert(out == Seq((1L, 5L, 25L), (2L, 10L, 30L)),
      s"span = the shared 20 chars at each doc's own offset; got $out")
  }

  test("intra-document repetition is flagged; disjoint repeats stay separate spans") {
    val rep = "0123456789" // w-sized, repeated twice in one doc, apart
    // filler must not self-repeat at w=10 (an 'aaaa…' run would itself
    // contain duplicated windows — correctly flagged)
    val out = spans(7L -> s"${rep}env-filler12${rep}")
    assert(out == Seq((7L, 0L, 10L), (7L, 22L, 32L)),
      s"two disjoint islands, not one; got $out")
  }

  test("cut keeps the first occurrence: canonical doc loses nothing, copies lose the payload") {
    val shared = "ABCDEFGHIJKLMNOPQRST" // 20 chars, w=10
    val out = Dedup.duplicateSpansCut(Seq(
        1L -> s"xxxxx${shared}yyyyyyy",        // first occurrence (lowest id)
        2L -> s"qqqqqqqqqq${shared}rr",
        3L -> "totally-unique-text-here-ok")
        .toDF("doc_id", "text"), "doc_id", "text", w = 10)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._3, t._4, t._5))).toMap
    assert(out(1L) == ((0L, 0L, 1.0)), "canonical occurrence is never cut")
    // doc 2 is 10 + 20 + 2 = 32 chars; kept = 1 − 20/32 = 0.375
    assert(out(2L) == ((20L, 1L, 0.375)),
      s"copy loses the 20 shared chars; got ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1.0)), "unique doc untouched")
  }

  test("randomized cross-check against a brute-force reference (100 corpora, k = 2 and 3)") {
    val rnd = new scala.util.Random(421)
    val w = 8
    (1 to 100).foreach { trial =>
      // random docs over a tiny alphabet so repeats genuinely occur
      val docs = (1L to 5L).map { id =>
        id -> (0 until (10 + rnd.nextInt(30))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      // brute force: every w-window string, count occurrences, mark
      // positions duplicated at each threshold, merge consecutive runs
      val wins = docs.flatMap { case (id, t) =>
        (0 to t.length - w).map(p => (id, p, t.substring(p, p + w)))
      }
      val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
      // the streaming lag/lead occurrence test must agree with the
      // counting reference for the default k = 2 AND a general k — 3
      // exercises the middle-row case (a row with one neighbor on each
      // side) that a naive "rank > k-1 OR lead(k-1) exists" form misses
      Seq(2, 3).foreach { k =>
        val expected = docs.flatMap { case (id, t) =>
          val dup = (0 to t.length - w).filter(p => counts(t.substring(p, p + w)) >= k)
          // islands of consecutive positions
          dup.foldLeft(List.empty[(Int, Int)]) {
            case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
            case (acc, p) => (p, p) :: acc
          }.map { case (s0, e0) => (id, s0.toLong, (e0 + w).toLong) }
        }.toSet
        val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
            "doc_id", "text", w = w, minOccurrences = k)
          .as[(Long, Long, Long, Long)].collect()
          .map(t => (t._1, t._2, t._3)).toSet
        assert(got == expected,
          s"trial $trial k=$k: missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)} docs=$docs")
      }
    }
  }

  test("duplicates shorter than w are invisible") {
    val out = spans(
      1L -> "shortdupAB-unique-tail-one",
      2L -> "shortdupAB different tail2")
    // common prefix is 10 chars ("shortdupAB") → exactly one w-window
    // each, duplicated; anything shorter would produce zero
    assert(out == Seq((1L, 0L, 10L), (2L, 0L, 10L)))
    val none = spans(
      1L -> "tinydup--unique-tail-onexx",
      2L -> "tinydup+ different tail2yy")
    assert(none.isEmpty, "9-char overlap < w never flags")
  }
}
