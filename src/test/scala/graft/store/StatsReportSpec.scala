package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 statistics reporting: the keyed scan reports its (pruned)
  * on-disk size, so Catalyst sizes keyed relations like parquet instead
  * of assuming defaultSizeInBytes — a small keyed dimension
  * auto-broadcasts in joins; the PK-pinned point read reports a
  * bucket's worth of bytes, not the table's. */
class StatsReportSpec extends SparkSpec {

  import spark.implicits._

  private def wh(): String =
    java.nio.file.Files.createTempDirectory("graft-spec-stats-").toString

  test("relation stats reflect on-disk bytes, not the default") {
    val w = wh()
    KeyedTable.toSql((1L to 5000L).map(i => (i, s"name-$i", i % 7))
        .toDF("k", "name", "grp"),
      w, "dim", pk = Seq("k"))
    val rel = KeyedTableSource.read(spark, w, "dim")
    val sz = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    val onDisk = {
      def walk(f: java.io.File): Long =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length else 0L }
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(s"$w/dim/data"))
    }
    assert(sz.toLong >= onDisk / 2 && sz.toLong <= onDisk * 8,
      s"stats $sz vs on-disk $onDisk — not tracking the files")
  }

  test("a small keyed dimension auto-broadcasts against a big fact side") {
    val w = wh()
    KeyedTable.toSql((1L to 200L).map(i => (i, s"dim-$i")).toDF("k", "label"),
      w, "dim", pk = Seq("k"))
    val fact = spark.range(0, 200000L)
      .select((col("id") % 200 + 1).as("k"), col("id").as("payload"))
    val joined = fact.join(KeyedTableSource.read(spark, w, "dim")
      .select("k", "label"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small keyed dim did not broadcast:\n$plan")
    assert(joined.count() == 200000L)
  }

  test("bucket pruning shrinks the reported size") {
    val w = wh()
    KeyedTable.toSql((1L to 20000L).map(i => (i, s"v$i")).toDF("k", "v"),
      w, "t", pk = Seq("k"), buckets = 16)
    val full = KeyedTableSource.read(spark, w, "t")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    // a fully-pinned PK prunes to ONE bucket directory — the reported
    // size must shrink accordingly (point reads look tiny to planners)
    val point = KeyedTableSource.read(spark, w, "t").filter(col("k") === 7L)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(point.toLong * 4 < full.toLong,
      s"point stats $point not pruned vs full $full")
  }
}
