package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Specs for the rows-only operators (SURVEY.md §2 #23 simhash, #27
  * ann_lsh) plus the as-of join / latest-per-key / multimodal pipeline. */
class OperatorsSpec extends SparkSpec {

  import spark.implicits._

  test("simhash: near-identical docs pair up, disjoint docs don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different content about distributed query engines at scale"),
    ).toDF("doc_id", "text")
    // md5-portable signatures put this near-dup pair at hamming 4; with
    // 8 bands the pigeonhole guarantee covers hamming ≤ 7
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", bands = 8, maxHamming = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash on corpus: only verified low-hamming pairs, no self/dup pairs") {
    val out = Dedup.simhashPairs(Tables.documents(spark, sfDir), "doc_id", "text")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(_.getInt(2) <= 3))
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("ngram jaccard df-cut: ubiquitous boilerplate doesn't explode the pair count") {
    // every doc carries the same 8-word footer (4 shared internal
    // 5-shingles, df = 30); bodies are unique except docs 1/2 which are
    // near-dups sharing one rare shingle
    val boiler = "all rights reserved contact support for terms today"
    val docs = (1 to 30).map { i =>
      val body =
        if (i <= 2) s"alpha beta gamma delta epsilon zeta$i"
        else s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
      (i.toLong, s"$body $boiler")
    }.toDF("doc_id", "text")
    // without the cut the boilerplate shingles pair EVERY doc with every
    // other doc: the inverted-index self-join goes quadratic (435 pairs)
    val noCut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5,
      threshold = 0.01).count()
    assert(noCut == 30L * 29 / 2)
    // with df ≤ 10 the boilerplate leaves the index before the join:
    // only the genuinely-similar pair survives
    val cut = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5,
      threshold = 0.01, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cut == Set((1L, 2L)))
  }

  test("embedding LSH near-dup: subset of exact pairs, recall from table/probe union") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingPairs(e, "vec_id", "embedding", threshold = 0.35,
        exact = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairs(e, "vec_id", "embedding", threshold = 0.35,
        exact = false, planes = 8, tables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every LSH pair is a true above-threshold pair (verify step is exact)
    assert(lsh.subsetOf(exact))
    // corpus pairs here are wide-angle (cos 0.35-0.51), the hardest LSH
    // regime — 4 tables × hamming-1 probes must still recover a chunk
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.2, s"recall = $recall (${lsh.size}/${exact.size})")
  }

  test("connectedComponents: chains, triangles and singletons get min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("ann_ivf: exact scores, decent recall@5, fewer candidates than brute force") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 20)
    val exact = Knn.bruteForce(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Knn.ivf(e, q, "vec_id", "embedding", k = 5, cells = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("ann_lsh: subset of brute-force candidates with decent recall@5") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 20)
    val exact = Knn.bruteForce(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Knn.lsh(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // every approx hit is a real (query, corpus) pair scored identically,
    // and multi-probe LSH should recover a good share of the true top-5
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 = $recall")
  }

  test("ArrayDotProduct codegen expression matches the interpreted fold bit-for-bit") {
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val interp = aggregate(
      zip_with(transform(col("embedding"), x => x.cast("double")),
               transform(col("embedding"), x => x.cast("double")),
               (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = e.select(
      VectorFunctions.dot(col("embedding"), col("embedding")).as("native"),
      interp.as("interp")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("WordShingles native expression matches the composed HOF form exactly") {
    val composed = {
      val toks = split(col("text"), " ")
      when(size(toks) >= 5,
        array_distinct(transform(
          sequence(lit(1), size(toks) - lit(4)),
          i => concat_ws(" ", slice(toks, i, lit(5))))))
        .otherwise(array(concat_ws(" ", toks)))
    }
    val rows = Tables.documents(spark, sfDir).limit(200).select(
      graft.functions.TextFunctions.wordShingles(col("text"), 5).as("native"),
      composed.as("composed")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("MinHashSignature native expression matches the composed HOF fold exactly") {
    import graft.functions.TextFunctions
    val sh = TextFunctions.wordShingles(col("text"), 5)
    val rows = Tables.documents(spark, sfDir).limit(200).select(
      TextFunctions.minhashSignature(sh, 16).as("native"),
      TextFunctions.minhashFromBase(TextFunctions.shingleBaseHashes(sh), 16)
        .as("composed")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // empty set → seed array, matching the fold's identity
    val empty = spark.sql(
      "SELECT graft_minhash(cast(array() AS array<string>), 4)").head().getSeq[Long](0)
    assert(empty == Seq.fill(4)(1000000007L))
    // null elements are skipped (least() ignores nulls in the fold):
    // array('a', null) must hash like array('a'), not NPE
    val withNull = spark.sql(
      "SELECT graft_minhash(array('a', cast(null AS string)), 4)," +
        "       graft_minhash(array('a'), 4)").head()
    assert(withNull.getSeq[Long](0) == withNull.getSeq[Long](1))
    // all-null input → seed array, like the empty set
    val allNull = spark.sql(
      "SELECT graft_minhash(array(cast(null AS string)), 4)").head().getSeq[Long](0)
    assert(allNull == Seq.fill(4)(1000000007L))
  }

  test("HyperplaneLsh native expression matches the composed HOF form exactly") {
    import graft.functions.VectorFunctions
    for (seed <- Seq(0, 3)) {
      val rows = Tables.embeddings(spark, sfDir).limit(200).select(
        VectorFunctions.hyperplaneLshSignature(col("embedding"), 6, seed).as("native"),
        VectorFunctions.hyperplaneLshSignatureComposed(col("embedding"), 6, seed).as("composed"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("LangMarkerCounts native langId matches the composed HOF form exactly") {
    import graft.functions.TextFunctions
    val rows = Tables.documents(spark, sfDir).select(
      TextFunctions.langId(col("text")).as("native"),
      TextFunctions.langIdComposed(col("text")).as("composed")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    // edge cases: CJK wins, empty → und, multi-lang markers tally per language
    val edge = Seq("金 学 据", "", "xyz qqq", "the la the le und la de de")
      .toDF("text").select(
        TextFunctions.langId(col("text")).as("native"),
        TextFunctions.langIdComposed(col("text")).as("composed")).collect()
    edge.foreach(r => assert(r.getString(0) == r.getString(1)))
    // "la"×2 + "de"×2 give es 4 vs en 2 / fr 3 / de 1
    assert(edge.map(_.getString(0)).toSeq == Seq("zh", "und", "und", "es"))
  }

  test("RepetitionStats edge cases: empty text, single token, repeated bigrams") {
    import graft.functions.TextFunctions.repetitionStats
    val rows = Seq("", "one", "a a a", "x y x y x").toDF("text")
      .select(repetitionStats(col("text"))).collect().map(_.getSeq[Long](0))
    // [n_tokens, n_distinct, top_token, n_bigrams, n_distinct_bigrams, top_bigram]
    assert(rows(0) == Seq(1L, 1L, 1L, 0L, 0L, 0L)) // "" -> one empty token
    assert(rows(1) == Seq(1L, 1L, 1L, 0L, 0L, 0L))
    assert(rows(2) == Seq(3L, 1L, 3L, 2L, 1L, 2L))
    assert(rows(3) == Seq(5L, 2L, 3L, 4L, 2L, 2L)) // "x y" x2, "y x" x2
  }

  test("native expressions are null-element safe from SQL") {
    // dot: null element nulls the result (composed-fold semantics)
    val dotNull = spark.sql(
      "SELECT graft_array_dot(array(1.0D, cast(null AS double)), array(1.0D, 2.0D))").head()
    assert(dotNull.isNullAt(0))
    // simhash: null hashes contribute no votes
    val sh = spark.sql(
      "SELECT graft_simhash64(array(7L, cast(null AS bigint))), graft_simhash64(array(7L))").head()
    assert(sh.getLong(0) == sh.getLong(1))
  }

  test("GraftExtensions: native expressions callable from SQL") {
    val dot = spark.sql(
      "SELECT graft_array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sig = spark.sql(
      "SELECT graft_simhash64(transform(split('a b c', ' '), t -> xxhash64(t)))")
      .head().getLong(0)
    val viaColumn = Tables.documents(spark, sfDir).sparkSession
      .createDataFrame(Seq(Tuple1("a b c"))).toDF("text")
      .select(graft.functions.TextFunctions.simhash64(col("text")))
      .head().getLong(0)
    assert(sig == viaColumn)
    val segs = spark.sql("SELECT graft_segments('a b c d e', 2)")
      .head().getSeq[String](0)
    assert(segs == Seq("a b", "c d", "e"))
    val segsD = spark.sql("SELECT graft_segments_distinct('a b a b c', 2)")
      .head().getSeq[String](0)
    assert(segsD == Seq("a b", "c"))
    // graft_winnow == hand-winnowed md5-prefix gram hashes (n=2, w=2)
    val wf = spark.sql("SELECT graft_winnow('a b c d', 2, 2)")
      .head().getSeq[Long](0)
    val hs = Seq("a b", "b c", "c d").map(g =>
      spark.sql(s"SELECT cast(conv(substring(md5('$g'), 1, 8), 16, 10) AS bigint)")
        .head().getLong(0))
    assert(wf == hs.sliding(2).map(_.min).toSeq.distinct)
  }

  test("asof join: picks latest right row at or before left time, per key") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 10.0),
      (1L, ts("2024-01-01 12:00:00"), 101L, 20.0),
      (2L, ts("2024-01-01 11:00:00"), 200L, 30.0),
    ).toDF("k", "t", "ord", "amt")
    val left = Seq(
      (1000L, 1L, ts("2024-01-01 09:00:00")), // before any order → null
      (1001L, 1L, ts("2024-01-01 10:00:00")), // exactly at → inclusive
      (1002L, 1L, ts("2024-01-01 13:00:00")), // after both → latest
      (1003L, 2L, ts("2024-01-01 11:30:00")),
      (1004L, 3L, ts("2024-01-01 11:30:00")), // key with no right rows
    ).toDF("event_id", "k", "t")
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "t",
        rightCols = Seq("ord", "amt"), rightTieBreak = "ord")
      .select("event_id", "ord").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1000L -> -1L, 1001L -> 100L, 1002L -> 101L,
                      1003L -> 200L, 1004L -> -1L))
  }

  test("salted asof join equals the plain form, including one pathological hot key") {
    import scala.util.Random
    val rnd = new Random(7)
    // key 1 is the bot: 2000 events over many chunks; keys 2..5 normal.
    // chunkSeconds=3600 against a multi-day span → many chunks per key,
    // chunks with no right rows, chunks with no left rows.
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    def at(s: Long) = new java.sql.Timestamp((base + s) * 1000)
    val left = ((1 to 2000).map(i => (10000L + i, 1L, at(rnd.nextInt(400000).toLong))) ++
      (1 to 50).flatMap(i => (2L to 5L).map(k =>
        (20000L + i * 10 + k, k, at(rnd.nextInt(400000).toLong)))))
      .toDF("event_id", "k", "t")
    val right = ((1 to 40).map(i => (1L, at(i * 9000L), 100L + i, i * 1.0)) ++
      (1 to 5).flatMap(i => (2L to 5L).map(k =>
        (k, at(i * 50000L + k * 7L), 500L + i * 10 + k, i * 2.0))))
      .toDF("k", "t", "ord", "amt")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    val plain = AsOf.asofJoin(left, right, "k", "k", "t", "t",
        rightCols = Seq("ord", "amt"), rightTieBreak = "ord")
      .select("event_id", "ord").collect().map(key).toMap
    val salted = AsOf.asofJoinSalted(left, right, "k", "k", "t", "t",
        rightCols = Seq("ord", "amt"), rightTieBreak = "ord",
        chunkSeconds = 3600L)
      .select("event_id", "ord").collect().map(key).toMap
    assert(salted === plain)
  }

  test("doc stitch: finds tail-head pairs via digest join, no nested loop") {
    val q = graft.LlmQueries.docStitch(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    // every fabricated continuation (src+100000) is found against its source
    val fabricated = rows.filter(r => r.getLong(1) == r.getLong(0) + 100000L)
    assert(fabricated.nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"stitch join must be a digest equi-join:\n$plan")
  }

  test("latest per key: recency winner with deterministic tie-break") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L),
      (1L, ts("2024-01-01 11:00:00"), 11L),
      (1L, ts("2024-01-01 11:00:00"), 12L), // tie on ts → higher id wins
      (2L, ts("2024-01-01 09:00:00"), 20L),
    ).toDF("k", "t", "id")
    val out = AsOf.latestPerKey(df, Seq("k"), "t", "id")
      .select("k", "id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 12L, 2L -> 20L))
  }

  test("multimodal: stub decode features are deterministic md5 math") {
    val docs = Seq((0L, "hello world"), (1L, "abc"), (2L, "video payload bytes"))
      .toDF("doc_id", "text")
    val out = Multimodal.pipeline(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0 → image, 1 → audio, 2 → video
    assert(out(0L).getString(1) == "image")
    assert(out(1L).getString(1) == "audio")
    assert(out(2L).getString(1) == "video")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L).getAs[String]("content_md5") == hex)
    assert(out(0L).getAs[Long]("width") ==
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 1280 + 1)
    // non-video assets have exactly one frame, one sample
    assert(out(0L).getAs[Long]("n_frames") == 1L)
    assert(out(0L).getAs[Long]("n_sampled") == 1L)
    // resize stays inside the box and preserves >0 dims
    out.values.foreach { r =>
      assert(r.getAs[Long]("resized_w") <= 256 && r.getAs[Long]("resized_w") >= 1)
      assert(r.getAs[Long]("resized_h") <= 256 && r.getAs[Long]("resized_h") >= 1)
    }
  }

  test("multimodal decode is a narrow transform (partitioning preserved)") {
    val docs = Tables.documents(spark, sfDir).repartition(7)
    val decoded = Multimodal.decodeFeatures(
      Multimodal.withPayload(docs, "doc_id", "text"))
    assert(decoded.rdd.getNumPartitions == 7)
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
