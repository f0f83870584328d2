package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Footer-only bucket layout report (#11n): exact per-bucket rows from
  * metadata, file counts that track append small-files, and agreement
  * with what a real scan reads. */
class BucketStatsSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-spec-bs-").toString

  test("footer stats agree with a real scan; appends grow file counts; compact shrinks them") {
    val w = wh()
    KeyedTable.toSql((1L to 400L).map(i => (i, s"v$i")).toDF("k", "v"),
      w, "t", pk = Seq("k"))
    val s1 = KeyedTable.bucketStats(spark, w, "t").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(s1.size == 32, "one row per bucket, present or not")
    assert(s1.values.map(_._2).sum == 400L, "footer rows equal table rows")
    // cross-check against an actual scan's per-bucket counts
    val scanned = KeyedTableSource.read(spark, w, "t")
      .groupBy(col(KeyedTable.BucketCol)).agg(count(lit(1)))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    scanned.foreach { case (b, n) => assert(s1(b)._2 == n, s"bucket $b") }

    // two appends → touched buckets gain one file each
    KeyedTable.toSql((401L to 500L).map(i => (i, s"v$i")).toDF("k", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Append)
    KeyedTable.toSql((501L to 600L).map(i => (i, s"v$i")).toDF("k", "v"),
      w, "t", pk = Seq("k"), how = WriteMode.Append)
    val s2 = KeyedTable.bucketStats(spark, w, "t").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(s2.values.max >= 3L, "append-heavy buckets show the small files")

    // compact flattens exactly the crowded buckets the report flagged
    val crowded = s2.count(_._2 >= 3)
    assert(KeyedTable.compact(spark, w, "t", minFiles = 3) == crowded)
    val s3 = KeyedTable.bucketStats(spark, w, "t").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(s3.map(_._2).max <= 2L, "compacted buckets are single-file")
    assert(s3.map(_._3).sum == 600L, "rows preserved through compact")
  }
}
