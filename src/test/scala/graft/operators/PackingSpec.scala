package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #30ah global concat-and-chunk packing: the shard-edge distributed
  * prefix sum must agree exactly with the naive sequential layout. */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("pack assignment equals the sequential concatenation layout") {
    val docs = (1L to 500L).map(i => (i, (i % 37 + 1).toInt))
    val df = docs.toDF("id", "toks").repartition(8)
    val budget = 100L
    // naive single-stream layout
    val expected = docs.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, t)) =>
        (id, acc / budget, acc + t)
      }.tail.map { case (id, pack, _) => id -> pack }.toMap
    val got = Packing.withPackId(df, "id", col("toks"), budget, shards = 4)
      .select("id", "pack").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diverges at ${got.collect { case (k, v) if expected(k) != v =>
        (k, v, expected(k)) }.take(5)}")
    // pack summary is consistent with the assignment
    val packs = Packing.packShards(df, "id", col("toks"), budget, shards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byPack = docs.groupBy(d => expected(d._1))
    assert(packs.keySet == byPack.keySet)
    byPack.foreach { case (p, ds) =>
      assert(packs(p) == ((ds.size.toLong, ds.map(_._2.toLong).sum)))
    }
  }

  test("a document larger than the budget owns the pack where it starts") {
    val df = Seq((1L, 10), (2L, 500), (3L, 10)).toDF("id", "toks")
    val out = Packing.withPackId(df, "id", col("toks"), budget = 100L,
        shards = 2)
      .select("id", "pack").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 2 starts in pack 0 (offset 10), doc 3 starts at offset 510 → pack 5
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 5L), s"got $out")
  }

  test("empty input and non-numeric ids degrade to a single shard, no NPE") {
    // percentile_approx yields NULL (not []) over zero rows or an
    // all-null numeric cast — both must mean "one shard", not an NPE
    val empty = Seq.empty[(Long, Int)].toDF("id", "toks")
    assert(Packing.withPackId(empty, "id", col("toks"), 100L).count() == 0L)
    val strIds = Seq(("doc-a", 60), ("doc-b", 60), ("doc-c", 60))
      .toDF("id", "toks")
    val out = Packing.withPackId(strIds, "id", col("toks"), budget = 100L)
      .select("id", "pack").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // single stream in id order: offsets 0,60,120 → packs 0,0,1
    assert(out == Map("doc-a" -> 0L, "doc-b" -> 0L, "doc-c" -> 1L),
      s"got $out")
  }
}
