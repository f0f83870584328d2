package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.{minhashSignature, wordShingles}

/** SURVEY.md §2 #34b: streaming MinHash-LSH near-dup candidate
  * generation — the streaming twin of the batch LSH stage
  * ([[graft.operators.Dedup.minhashLshPairs]], reference pandabase has
  * no streaming surface; this extends the engine's ingest story).
  *
  * Documents arrive as a stream; each is shingled and minhashed with
  * EXACTLY the batch hash family (same md5-prefix base hash, same
  * (a·x+b) mod p functions — [[TextFunctions.minhashSignature]]), then
  * exploded to its `bands` LSH band keys. State lives per (band, key)
  * bucket via flatMapGroupsWithState: the ids+signatures of documents
  * seen in that bucket. A new arrival emits one candidate edge per
  * stored bucket member, scored by SIGNATURE AGREEMENT (matching
  * entries / numHashes — the standard streaming estimate; the exact
  * shingle-Jaccard verify stays a batch job over the emitted edges,
  * exactly like the batch operator's verify stage runs over its
  * candidate join).
  *
  * Scale/state contract:
  *  - state per bucket is ≤ `maxBucket` (id, 16-long signature) pairs —
  *    bytes per doc, never shingle sets (the batch operator keeps those
  *    out of its exchange for the same reason). Buckets at the cap stop
  *    ACCUMULATING but keep emitting edges against stored members, and
  *    a capped bucket is by definition a pathological near-dup cluster —
  *    every member already has an edge to the first `maxBucket` docs, so
  *    connected-component clustering downstream is unaffected.
  *  - a pair sharing several bands emits once per shared band
  *    (different state buckets can't see each other); downstream
  *    dedups by (id_a, id_b) — at-least-once edges, the usual
  *    streaming-sink contract (the batch twin's dropDuplicates).
  *  - this demo keys state on content buckets with NoTimeout (the
  *    documents table carries no event time); a production deployment
  *    stamps ingest time and evicts idle buckets with an
  *    EventTimeTimeout exactly as [[StatefulSessions]] does — near-dups
  *    beyond the eviction horizon then fall to the nightly incremental
  *    batch pass ([[graft.operators.Dedup.incrementalMinhashLsh]]).
  */
object StreamingNearDup {

  /** One candidate edge: ids ordered (a < b), per shared band. */
  case class Candidate(id_a: Long, id_b: Long, band: Int, est_jaccard: Double)

  /** Bucket state: parallel id/signature lists, insertion-ordered. */
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** @param docs streaming (or batch — Spark runs the same state
    *             function statelessly) frame with (idCol long,
    *             textCol string). */
  def candidates(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 5, numHashes: Int = 16,
                 bands: Int = 4, maxBucket: Int = 64): Dataset[Candidate] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._
    // packed numeric band keys (same banding as the batch family since
    // r20 — injective, so buckets are identical to the string form):
    // the shuffle to state and the state-store keys carry two longs
    // instead of a "v1|v2|v3|v4" string, and no per-row string assembly
    // runs in the banding projection. NOTE: this changes the typed
    // state KEY schema — a checkpoint written by the string-keyed form
    // cannot resume into this one (start a fresh checkpoint; the graft
    // specs and gate always do).
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        minhashSignature(wordShingles(col(textCol), n), numHashes).as("sig"))
      .select(col("id"), col("sig"),
        posexplode(graft.functions.TextFunctions.lshBandKeysPacked(
          col("sig"), bands, rowsPerBand)).as(Seq("band", "key")))
      .select(col("id"), col("sig"), col("band"),
        col("key.k1").as("k1"), col("key.k2").as("k2"))
      .as[(Long, Seq[Long], Int, Long, Long)]
    banded
      .groupByKey(r => (r._3, r._4, r._5))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bk: (Int, Long, Long), it: Iterator[(Long, Seq[Long], Int, Long, Long)],
         state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Vector.empty, Vector.empty))
          var ids = st.ids
          var sigs = st.sigs
          val out = List.newBuilder[Candidate]
          def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
            val m = a.iterator.zip(b.iterator).count { case (x, y) => x == y }
            graft.functions.Rounding.portableRoundDouble(
              m.toDouble / a.size.toDouble, 4)
          }
          // in-batch id order: emission is deterministic however the
          // micro-batch sliced the stream
          for ((id, sig, _, _, _) <- it.toArray.sortBy(_._1)) {
            if (!ids.contains(id)) { // idempotent under source replay
              ids.iterator.zip(sigs.iterator).foreach { case (sid, ssig) =>
                out += Candidate(math.min(id, sid), math.max(id, sid),
                  bk._1, estJaccard(sig, ssig))
              }
              if (ids.size < maxBucket) {
                ids = ids :+ id
                sigs = sigs :+ sig
              }
            }
          }
          state.update(BucketState(ids, sigs))
          out.result().iterator
      }
  }
}
