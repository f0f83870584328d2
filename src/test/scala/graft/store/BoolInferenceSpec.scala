package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

import graft.SparkSpec

/** Reference helpers.py:35 series_is_boolean semantics. */
class BoolInferenceSpec extends SparkSpec {

  import spark.implicits._

  private def df = Seq(
    (1L, 0L, 1.0, 0L, 1L, Option.empty[Double], "x"),
    (2L, 1L, 0.0, 0L, 1L, Option.empty[Double], "y"),
    (3L, 0L, 1.0, 0L, 1L, Option.empty[Double], "z"),
  ).toDF("id", "int01", "dbl01", "all_zero", "all_one", "all_null", "s")

  test("series_is_boolean: {0,1} numerics true; all-zero/all-one/all-null/other false or none") {
    val v = BoolInference.columnsAreBoolean(df)
    assert(v("int01").contains(true))
    assert(v("dbl01").contains(true))
    assert(v("all_zero").contains(false)) // reference caveat
    assert(v("all_one").contains(false))  // reference caveat
    assert(v("all_null").isEmpty)         // None for all-NULL
    assert(v("s").contains(false))
    assert(v("id").contains(false))       // 1,2,3 not boolean-shaped
  }

  test("create with inferBool maps {0,1} columns to Boolean, never the PK") {
    val wh = Files.createTempDirectory("graft-bool").toString
    KeyedTable.toSql(df, wh, "t", pk = Seq("id"))
    val back = KeyedTable.readSql(spark, wh, "t")
    assert(back.schema("int01").dataType == BooleanType)
    assert(back.schema("dbl01").dataType == BooleanType)
    assert(back.schema("all_zero").dataType == LongType)
    assert(back.schema("all_null").dataType == DoubleType)
    assert(back.schema("id").dataType == LongType)
    assert(back.filter(back("int01") === true).count() == 1)

    // opt-out keeps raw types
    KeyedTable.toSql(df, wh, "t_raw", pk = Seq("id"), inferBool = false)
    assert(KeyedTable.readSql(spark, wh, "t_raw").schema("int01").dataType == LongType)
  }

  test("naive (NTZ) timestamps are rejected by default, pinned to UTC on opt-in") {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val wh = Files.createTempDirectory("graft-ntz").toString
    val d = Seq((1L, "2024-01-01 10:30:00"), (2L, "2024-02-01 00:00:00"))
      .toDF("id", "s")
      .withColumn("t", expr("cast(s AS timestamp_ntz)")).drop("s")
    assert(d.schema("t").dataType == TimestampNTZType)
    // reference fail-fast contract: naive datetime column → error on
    // create (test_sql.py:273) …
    val e = intercept[StoreException](KeyedTable.toSql(d, wh, "ntz", pk = Seq("id")))
    assert(e.getMessage.contains("timezone must be set"))
    // … and on append/upsert into an existing table (test_sql.py:807)
    KeyedTable.toSql(d.withColumn("t", col("t").cast(TimestampType)), wh, "ntz",
      pk = Seq("id"))
    val more = Seq((3L, "2024-03-01 12:00:00")).toDF("id", "s")
      .withColumn("t", expr("cast(s AS timestamp_ntz)")).drop("s")
    intercept[StoreException](
      KeyedTable.toSql(more, wh, "ntz", pk = Seq("id"), how = WriteMode.Append))
    intercept[StoreException](
      KeyedTable.toSql(more, wh, "ntz", pk = Seq("id"), how = WriteMode.Upsert))

    // explicit opt-in (strictUtc=false): naive pins to the same
    // wall-clock UTC instant (session TZ is UTC), on create and append
    val wh2 = Files.createTempDirectory("graft-ntz2").toString
    KeyedTable.toSql(d, wh2, "ntz", pk = Seq("id"), strictUtc = false)
    val back = KeyedTable.readSql(spark, wh2, "ntz")
    assert(back.schema("t").dataType == TimestampType)
    assert(back.filter(col("id") === 1L).select(col("t").cast("string"))
      .head().getString(0) == "2024-01-01 10:30:00")
    KeyedTable.toSql(more, wh2, "ntz", pk = Seq("id"), how = WriteMode.Append,
      strictUtc = false)
    assert(KeyedTable.readSql(spark, wh2, "ntz").count() == 3)
  }
}
