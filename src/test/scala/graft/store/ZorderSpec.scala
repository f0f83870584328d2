package graft.store

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** #11r Z-order clustering: after zorderCompact on (x, y), parquet
  * row-group min/max stats are tight on BOTH dimensions — measured
  * directly from the footers — where a single-column sort leaves the
  * other dimension's ranges at full width. Layout, PK reads, and row
  * content are untouched. */
class ZorderSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String =
    java.nio.file.Files.createTempDirectory("graft-spec-zord-").toString

  /** Per-row-group (min, max) of `colName` across a table's buckets,
    * straight from the parquet footers. */
  private def rowGroupRanges(w: String, colName: String): Seq[(Double, Double)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val data = new java.io.File(s"$w/t/data")
    data.listFiles().filter(_.getName.startsWith("pb_bucket=")).toSeq
      .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")).toSeq)
      .flatMap { file =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val idx = r.getFooter.getFileMetaData.getSchema.getFieldIndex(colName)
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val st = b.getColumns.get(idx).getStatistics
            (st.genericGetMin.toString.toDouble,
              st.genericGetMax.toString.toDouble)
          }
        } finally r.close()
      }
  }

  /** Mean fraction of the global range a row group's stats span —
    * 1.0 = stats are useless for pruning, ~1/n = perfectly clustered. */
  private def coverage(ranges: Seq[(Double, Double)], span: Double): Double =
    ranges.map { case (a, b) => (b - a) / span }.sum / ranges.size

  private val span = 1048576.0
  private def data() = {
    val rnd = new scala.util.Random(42)
    (1L to 100000L).map(i =>
      (i, rnd.nextInt(1048576).toLong, rnd.nextInt(1048576).toLong))
      .toDF("k", "x", "y")
  }

  test("z-order tightens row-group stats on BOTH dims; x-sort leaves y at full width") {
    val wz = wh()
    KeyedTable.toSql(data(), wz, "t", pk = Seq("k"), buckets = 2)
    KeyedTable.zorderCompact(spark, wz, "t", Seq("x", "y"),
      parquetBlockBytes = Some(128L * 1024))
    // baseline: the same rewrite machinery sorted by x alone
    // (interleaving x with itself is monotone in x)
    val wx = wh()
    KeyedTable.toSql(data(), wx, "t", pk = Seq("k"), buckets = 2)
    KeyedTable.zorderCompact(spark, wx, "t", Seq("x", "x"),
      parquetBlockBytes = Some(128L * 1024))

    val zx = rowGroupRanges(wz, "x"); val zy = rowGroupRanges(wz, "y")
    val bx = rowGroupRanges(wx, "x"); val by = rowGroupRanges(wx, "y")
    assert(zx.size >= 4, s"expected several row groups, got ${zx.size}")
    // the x-only sort: x clustered, y ranges ~ the whole domain
    assert(coverage(bx, span) < 0.5, s"x-sort left x at ${coverage(bx, span)}")
    assert(coverage(by, span) > 0.8, s"x-sort should NOT cluster y: ${coverage(by, span)}")
    // the z-order: BOTH dimensions clustered
    assert(coverage(zx, span) < 0.6, s"z left x at ${coverage(zx, span)}")
    assert(coverage(zy, span) < 0.6, s"z left y at ${coverage(zy, span)}")
  }

  test("3-column z-order tightens row-group bounds on the THIRD dimension " +
      "where a 2-column interleave leaves it at full width") {
    val rnd = new scala.util.Random(7)
    def data3() = (1L to 100000L).map(i =>
      (i, rnd.nextInt(1048576).toLong, rnd.nextInt(1048576).toLong,
        rnd.nextInt(1048576).toLong))
      .toDF("k", "x", "y", "w")
    val d = data3()
    // small row groups: a 3-way interleave spreads the sort resolution
    // across three dimensions, so per-dimension tightness needs more
    // groups than the 2-D test to show up decisively in footer stats
    val blk = Some(32L * 1024)
    val w3 = wh()
    KeyedTable.toSql(d, w3, "t", pk = Seq("k"), buckets = 2)
    KeyedTable.zorderCompact(spark, w3, "t", Seq("x", "y", "w"),
      parquetBlockBytes = blk)
    // baseline: 2-column interleave over (x, y) only
    val w2 = wh()
    KeyedTable.toSql(d, w2, "t", pk = Seq("k"), buckets = 2)
    KeyedTable.zorderCompact(spark, w2, "t", Seq("x", "y"),
      parquetBlockBytes = blk)

    val t3w = rowGroupRanges(w3, "w")
    val t2w = rowGroupRanges(w2, "w")
    assert(t3w.size >= 8, s"expected many row groups, got ${t3w.size}")
    // the 2-col interleave never saw w: its ranges span ~ the domain
    assert(coverage(t2w, span) > 0.8,
      s"(x,y) z-order should NOT cluster w: ${coverage(t2w, span)}")
    // the 3-col interleave bounds w too — coarser than a 1-D sort (the
    // bits three-way interleave) but decisively below the unclustered
    // baseline, absolutely and relatively
    assert(coverage(t3w, span) < 0.75,
      s"3-col z left w at ${coverage(t3w, span)}")
    assert(coverage(t3w, span) < coverage(t2w, span) - 0.15,
      s"3-col z on w (${coverage(t3w, span)}) must beat the 2-col " +
      s"baseline (${coverage(t2w, span)}) decisively")
    // and still clusters the first two dimensions
    assert(coverage(rowGroupRanges(w3, "x"), span) < 0.75)
    assert(coverage(rowGroupRanges(w3, "y"), span) < 0.75)
    // content intact
    assert(KeyedTable.readSql(spark, w3, "t").count() == 100000L)
    // dial bounds: 1 and 5 columns refuse
    intercept[IllegalArgumentException](
      KeyedTable.zorderCompact(spark, w3, "t", Seq("x")))
    intercept[IllegalArgumentException](
      KeyedTable.zorderCompact(spark, w3, "t", Seq("x", "y", "w", "k", "x")))
  }

  test("content, PK reads, and bucket layout survive the rewrite") {
    val w = wh()
    val df = data()
    KeyedTable.toSql(df, w, "t", pk = Seq("k"), buckets = 2)
    KeyedTable.zorderCompact(spark, w, "t", Seq("x", "y"))
    val back = KeyedTable.readSql(spark, w, "t")
    assert(back.count() == 100000L)
    assert(back.agg(sum(col("x")), sum(col("y"))).head() ==
      df.agg(sum(col("x")), sum(col("y"))).head())
    // PK range read still prunes and answers correctly
    assert(KeyedTable.readSql(spark, w, "t",
      lowest = Seq(10L), highest = Seq(29L)).count() == 20)
    // unknown z column rejected
    intercept[StoreException](
      KeyedTable.zorderCompact(spark, w, "t", Seq("x", "nope")))
  }
}
