package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.store.Names

/** Property-based invariants for the deterministic building blocks the
  * oracle gate can't stress (it only sees corpus-shaped inputs):
  * identifier cleaning, the native-vs-composed hashing equivalences,
  * and the bucket function's frame-independence. Samples are drawn
  * from scalacheck generators under FIXED seeds so failures reproduce
  * exactly. */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val legalName: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '(', ')', '+', '-', '/', '*', '=',
        '&', '|', '#', '>', '<', '^', '%', '{', '}', '.', ',', '_')))
  } yield (head :: tail).mkString

  test("cleanName is idempotent and emits only legal identifier chars") {
    samples(legalName, 200).foreach { name =>
      val once = Names.cleanName(name)
      if (once.nonEmpty) {
        assert(Names.cleanName(once) == once, s"not idempotent for: $name")
        assert(once.forall(c => (c.isLetterOrDigit && !c.isUpper) || c == '_'),
          s"illegal output char in: $once")
      }
    }
  }

  test("normalize_text is idempotent and emits no uppercase/controls/runs") {
    import org.apache.spark.unsafe.types.UTF8String
    val unicodeish: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', '\u0007'),
      Gen.oneOf('\u00e9', '\u00c0', '\u00fc', '\u00f1', '\u00df',
        '\u4e2d', '\u6587', '\u0301', '\u0300')))
      .map(_.mkString)
    samples(unicodeish, 300).foreach { s =>
      val once = graft.functions.expr.NormalizeText
        .compute(UTF8String.fromString(s)).toString
      val twice = graft.functions.expr.NormalizeText
        .compute(UTF8String.fromString(once)).toString
      assert(twice == once, s"not idempotent for: ${s.getBytes("UTF-8").toList}")
      assert(!once.exists(_.isUpper), s"uppercase survived in: $once")
      assert(!once.exists(_.isControl), s"control char survived in: $once")
      assert(!once.contains("  "), s"whitespace run survived in: $once")
      assert(once == once.trim, s"untrimmed: '$once'")
    }
  }

  test("minhash native == composed fold on arbitrary ASCII token lists") {
    import graft.functions.TextFunctions._
    import spark.implicits._
    val textGen = Gen.listOfN(8,
      Gen.listOf(Gen.asciiPrintableChar).map(_.mkString.replace(" ", "_")))
      .map(_.mkString(" "))
    val docs = samples(textGen, 60)
    val rows = docs.map(Tuple1(_)).toDF("text").select(
      minhashSignature(wordShingles(col("text"), 3), 8).as("native"),
      minhashFromBase(shingleBaseHashes(wordShingles(col("text"), 3)), 8)
        .as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("segment kernels: join reconstructs text; distinct == first-occurrence reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val textGen = Gen.listOfN(11,
      // tiny vocabulary so repeated segments actually occur; empty
      // tokens exercise split's keep-empties contract (double spaces)
      Gen.oneOf("a", "b", "c", "ab", "")).map(_.mkString(" "))
    for ((text, k) <- samples(textGen, 80).zipWithIndex.map { case (t, i) => (t, i % 3 + 1) }) {
      val segs = graft.functions.expr.Segments
        .compute(UTF8String.fromString(text), k)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      // non-overlapping cover: joining the segments restores the text
      assert(segs.mkString(" ") == text, s"k=$k text='$text'")
      // reference first-occurrence distinct
      val distinct = graft.functions.expr.SegmentsDistinct
        .compute(UTF8String.fromString(text), k)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      assert(distinct.toSeq == segs.toSeq.distinct, s"k=$k text='$text'")
    }
  }

  test("pq_codes native == composed argmin of rounded squared distances") {
    import spark.implicits._
    val vecGen: Gen[Seq[Double]] =
      Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).map(_.toSeq)
    val cb = samples(vecGen, 6)
    val vecs = samples(vecGen, 40)
    val m = 4
    val sub = 4
    val df = vecs.map(Tuple1(_)).toDF("v")
    val native = org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.PqCodes(
        org.apache.spark.sql.GraftBridge.expression(col("v")), m, cb))
    val composed = array((0 until m).map { j =>
      val vslice = transform(slice(col("v"), j * sub + 1, sub), _.cast("double"))
      val dists = array((0 until cb.length).map { c =>
        round(aggregate(
          zip_with(vslice, typedlit(cb(c).slice(j * sub, (j + 1) * sub)),
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x), 6)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
    val rows = df.select(native.as("n"), composed.as("c")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("bucket function: same key same bucket regardless of frame shape") {
    import spark.implicits._
    val keys = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 200).distinct
    val b1 = keys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(32L)).as("b"))
      .as[(Long, Long)].collect().toMap
    val b2 = keys.reverse.toDF("k").repartition(5)
      .select(col("k"), pmod(xxhash64(col("k")), lit(32L)).as("b"))
      .as[(Long, Long)].collect().toMap
    keys.foreach(k => assert(b1(k) == b2(k) && b1(k) >= 0 && b1(k) < 32))
  }

  test("winnowing: planted shared run of w+k-1 tokens is always found") {
    import spark.implicits._
    val k = 5; val w = 4
    // random background vocab disjoint per doc; a shared run of exactly
    // w+k-1 tokens planted at random offsets on both sides
    val cases = samples(for {
      runLen <- Gen.const(w + k - 1)
      run <- Gen.listOfN(runLen, Gen.chooseNum(0, 50)).map(_.map(x => s"r$x"))
      pre1 <- Gen.chooseNum(0, 12); post1 <- Gen.chooseNum(0, 12)
      pre2 <- Gen.chooseNum(0, 12); post2 <- Gen.chooseNum(0, 12)
    } yield (
      ((1 to pre1).map(i => s"a$i") ++ run ++ (1 to post1).map(i => s"b$i")).mkString(" "),
      ((1 to pre2).map(i => s"c$i") ++ run ++ (1 to post2).map(i => s"d$i")).mkString(" ")
    ), 6)
    cases.foreach { case (t1, t2) =>
      val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val pairs = graft.operators.Dedup
        .winnowPairs(docs, "doc_id", "text", n = k, window = w, minShared = 1)
        .as[(Long, Long, Long)].collect()
      assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)),
        s"guarantee violated for:\n  $t1\n  $t2")
    }
  }

  test("tokenLift matches brute-force lift on random corpora") {
    import spark.implicits._
    val corpusGen = Gen.listOfN(8,
      Gen.listOfN(12, Gen.chooseNum(0, 5).map(x => s"w$x")).map(_.mkString(" ")))
    samples(corpusGen, 4).foreach { texts =>
      val out = graft.operators.Curation
        .tokenLift(texts.toDF("text"), "text", minCount = 2, topK = 100)
        .select("tok_a", "tok_b", "n_ab", "lift")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      // brute force on the driver
      val docs = texts.map(_.split(" ").toSeq)
      val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = docs.map(_.size).sum.toLong
      val bigrams = docs.flatMap(t => t.zip(t.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= 2)
      val expect = bigrams.map { case ((a, b), nab) =>
        (a, b) -> (nab,
          math.floor((nab.toDouble * n) / (uni(a).toDouble * uni(b)) * 10000 + 0.5) / 10000)
      }
      assert(out == expect, s"lift mismatch for corpus: ${texts.take(2)}...")
    }
  }

  test("chunk windows: tile every doc exactly, for random win/stride") {
    import spark.implicits._
    val cases = samples(for {
      win <- Gen.chooseNum(1, 64)
      stride <- Gen.chooseNum(1, win)
    } yield (win, stride), 8).distinct
    val lens = samples(Gen.chooseNum(1, 300), 5).distinct
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(t => s"t$t").mkString(" ")) }
      .toDF("doc_id", "text")
    cases.foreach { case (win, stride) =>
      val wins = graft.operators.Curation
        .chunkWindows(docs, "doc_id", "text", win, stride)
        .select("doc_id", "n_tokens", "win_id", "start_tok", "win_tokens")
        .as[(Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap
      wins.foreach { case (_, ws) =>
        val n = ws.head._2
        assert(ws.head._4 == 0L, s"first window starts at 0 (win=$win stride=$stride)")
        ws.sliding(2).foreach {
          case Seq(a, b) => assert(b._4 - a._4 == stride, "starts step by stride")
          case _ =>
        }
        ws.foreach { case (_, _, _, start, toks) =>
          assert(toks >= 1 && toks <= win && start + toks <= n, "window in bounds")
        }
        assert(ws.last._4 + ws.last._5 == n, "last window ends at the last token")
        assert(ws.init.forall(_._5 == win), "only the tail window may be partial")
      }
    }
  }
}
