package graft.store

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #11q predicate delete: only buckets containing matches rewrite; a
  * fully-matching bucket loses its directory; NULL-predicate rows are
  * never deleted; no match → metadata-only no-op. */
class DeleteSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String =
    java.nio.file.Files.createTempDirectory("graft-spec-del-").toString

  private def bucketFiles(w: String, b: Int): Set[String] = {
    val d = new File(s"$w/t/data/pb_bucket=$b")
    if (!d.isDirectory) Set.empty
    else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("deletes matching rows; untouched buckets keep their exact files") {
    val w = wh()
    KeyedTable.toSql((1L to 1000L).map(i => (i, i % 10, i * 1.0))
        .toDF("k", "cat", "v"),
      w, "t", pk = Seq("k"), buckets = 8)
    val before = (0 until 8).map(b => b -> bucketFiles(w, b)).toMap
    // delete a narrow PK range: only its hash buckets should rewrite
    val n = KeyedTable.delete(spark, w, "t",
      col("k") >= 100L && col("k") <= 104L)
    assert(n == 5)
    val back = KeyedTable.readSql(spark, w, "t")
    assert(back.count() == 995)
    assert(back.filter(col("k").between(100, 104)).count() == 0)
    val touched = Seq(100L, 101L, 102L, 103L, 104L).map { k =>
      Seq(Tuple1(k)).toDF("k")
        .select(pmod(xxhash64(col("k")), lit(8)).cast("int")).head().getInt(0)
    }.toSet
    (0 until 8).filterNot(touched).foreach { b =>
      assert(bucketFiles(w, b) == before(b), s"quiet bucket $b was touched")
    }
  }

  test("a bucket whose rows all match loses its directory; reads survive") {
    val w = wh()
    KeyedTable.toSql((1L to 200L).map(i => (i, i * 1.0)).toDF("k", "v"),
      w, "t", pk = Seq("k"), buckets = 4)
    val n = KeyedTable.delete(spark, w, "t", lit(true))
    assert(n == 200)
    assert(KeyedTable.readSql(spark, w, "t").count() == 0)
  }

  test("NULL predicate rows are kept; no-match delete is a no-op") {
    val w = wh()
    KeyedTable.toSql(
      Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))).toDF("k", "v"),
      w, "t", pk = Seq("k"))
    // v > 2.0 is NULL for k=2 — not a match, must survive
    assert(KeyedTable.delete(spark, w, "t", col("v") > 2.0) == 1)
    assert(KeyedTable.readSql(spark, w, "t").select("k").as[Long]
      .collect().toSet == Set(1L, 2L))
    assert(KeyedTable.delete(spark, w, "t", col("v") > 99.0) == 0)
    assert(KeyedTable.readSql(spark, w, "t").count() == 2)
  }
}
