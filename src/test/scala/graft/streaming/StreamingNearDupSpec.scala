package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions.{lshBandKeys, minhashSignature, wordShingles}

/** SURVEY.md §2 #34b: the streaming LSH candidate generator emits, per
  * shared band, exactly the candidate set the BATCH band self-join
  * produces on the same documents, with the same signature-agreement
  * estimate — across micro-batch boundaries (state carries earlier
  * docs) and under replay (idempotent per bucket). */
class StreamingNearDupSpec extends SparkSpec {

  import spark.implicits._

  /** The batch twin: band keys via the same helpers, per-band self-join,
    * signature-agreement estimate — what the streaming state must
    * converge to once every doc has arrived. */
  private def batchCandidates(docs: DataFrame): Set[(Long, Long, Int, Double)] = {
    val banded = docs
      .select(col("doc_id").cast("long").as("id"),
        minhashSignature(wordShingles(col("text"), 5), 16).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(lshBandKeys(col("sig"), 4, 4)).as(Seq("band", "key")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), col("a.band"),
        graft.functions.Rounding.portableRound(
          aggregate(zip_with(col("a.sig"), col("b.sig"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / lit(16.0), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
  }

  test("streaming candidates equal the batch band self-join across micro-batches") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // force near-dup collisions: clone some docs under new ids
    val clones = docs.take(8).map { case (id, t) => (id + 100000L, t) }
    val all = docs ++ clones
    val expected = batchCandidates(
      all.toSeq.toDF("doc_id", "text"))
    assert(expected.nonEmpty, "test corpus produced no candidate pairs")

    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = StreamingNearDup.candidates(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("near_dup_cand")
      .outputMode("append").start()
    try {
      // three micro-batches: clones arrive LAST so every expected edge
      // crosses a batch boundary through state
      val (b1, rest) = all.splitAt(25)
      val (b2, b3) = rest.splitAt(all.length - 25 - clones.length)
      src.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      src.addData(b2.toIndexedSeq)
      q.processAllAvailable()
      src.addData(b3.toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("near_dup_cand")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
      assert(got == expected,
        s"streaming != batch: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    } finally q.stop()
  }

  test("replayed docs do not re-emit (idempotent buckets)") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = StreamingNearDup.candidates(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("near_dup_replay")
      .outputMode("append").start()
    try {
      val t = "the quick brown fox jumps over the lazy dog again and again"
      src.addData((1L, t), (2L, t))
      q.processAllAvailable()
      src.addData((1L, t)) // replay of doc 1
      q.processAllAvailable()
      val rows = spark.table("near_dup_replay").collect()
      // identical docs collide in all 4 bands, once each — replay adds 0
      assert(rows.length == 4 && rows.forall(r =>
        r.getLong(0) == 1L && r.getLong(1) == 2L && r.getDouble(3) == 1.0))
    } finally q.stop()
  }
}
