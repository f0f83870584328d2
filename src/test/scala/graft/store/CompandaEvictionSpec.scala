package graft.store

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Companda's positional (ignoreIndex) path pins the sorted frame with
  * persist() before numbering, documenting that even an EVICTED cached
  * partition recomputes under the original range partitioning (the
  * sampled boundaries live in the cached RDD's lineage, fixed at cache
  * time — Companda.sortAndNumber). This spec proves that claim the hard
  * way: materialize the position ids, then drop EVERY cached block
  * (unpersist — strictly worse than any real eviction) and renumber off
  * the same frame. If recomputation re-sampled boundaries, rows near
  * partition edges would land in different partitions and take
  * different ids; the assertion is bit-for-bit id stability.
  */
class CompandaEvictionSpec extends SparkSpec {

  test("positional ids survive full cache eviction (recompute is deterministic)") {
    // events at spec SF: 10k rows, plenty of range-partition boundaries
    // on a 32-thread local master; value ties across boundaries included
    val df = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val (numbered, cached) = Companda.sortAndNumber(df, Seq("event_id"))
    def snapshot() = numbered.collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
                 r.getLong(r.fieldIndex("__companda_pos"))))
      .sortBy(_._2).toSeq
    val before = snapshot()
    assert(before.map(_._2) == before.indices.map(_.toLong),
      "position ids must be contiguous from 0")
    // evict everything: all partitions must now recompute from lineage
    cached.unpersist(blocking = true)
    val after = snapshot()
    assert(after == before,
      "renumbering after eviction diverged — recompute is not pinned")
  }
}
