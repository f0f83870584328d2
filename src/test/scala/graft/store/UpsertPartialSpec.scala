package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Reference tests/test_sql.py:478-564: upsert overwrites only the
  * columns PRESENT in the incoming frame (including with NULLs);
  * absent columns keep their stored values. */
class UpsertPartialSpec extends SparkSpec {

  import spark.implicits._

  test("partial-column upsert updates present columns, preserves absent ones") {
    val wh = Files.createTempDirectory("graft-partial").toString
    val base = Seq(
      (1L, "a", 10.0, 100L),
      (2L, "b", 20.0, 200L),
      (3L, "c", 30.0, 300L),
    ).toDF("id", "s", "f", "n")
    KeyedTable.toSql(base, wh, "t", pk = Seq("id"))

    // single-column upsert: update f for id=2, insert id=4
    val delta = Seq((2L, 99.9), (4L, 44.4)).toDF("id", "f")
    KeyedTable.toSql(delta, wh, "t", pk = Seq("id"), how = WriteMode.Upsert)

    val back = KeyedTable.readSql(spark, wh, "t")
      .orderBy("id").collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)), Option(r.get(3))))
    assert(back(1) == ((2L, Some("b"), Some(99.9), Some(200L)))) // s,n preserved
    assert(back(0) == ((1L, Some("a"), Some(10.0), Some(100L)))) // untouched
    assert(back(3) == ((4L, None, Some(44.4), None)))            // insert: absent → NULL

    // incoming NULL in a PRESENT column overwrites (full-NULL wins rule)
    val nullDelta = Seq((1L, Option.empty[Double])).toDF("id", "f")
    KeyedTable.toSql(nullDelta, wh, "t", pk = Seq("id"), how = WriteMode.Upsert)
    val r1 = KeyedTable.readSql(spark, wh, "t").filter(col("id") === 1L).head()
    assert(r1.isNullAt(2) && r1.getString(1) == "a" && r1.getLong(3) == 100L)
  }

  test("range read with incomparable bound type fails (reference sql.py:443)") {
    val wh = Files.createTempDirectory("graft-range-type").toString
    KeyedTable.toSql(Seq((1L, "a")).toDF("id", "s"), wh, "t", pk = Seq("id"))
    intercept[StoreException] {
      KeyedTable.readSql(spark, wh, "t", lowest = Seq("not-a-number"), highest = Seq(null))
    }
    // comparable numeric bound works and can be empty without error
    assert(KeyedTable.readSql(spark, wh, "t", lowest = Seq(100L), highest = Seq(200L)).isEmpty)
  }
}
