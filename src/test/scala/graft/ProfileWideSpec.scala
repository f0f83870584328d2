package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The wide profiler's contract is its SCAN COUNT: profiling N columns
  * must cost one pass over the table, not N — a 100-column profile of
  * a 100 TB table cannot be 100 scans. */
class ProfileWideSpec extends SparkSpec {

  private def scanCount(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.size

  test("profile_wide plans exactly ONE scan for 10 profiled columns") {
    val wide = Analytics.profileWide(spark, sfDir)
    assert(scanCount(wide) === 1,
      s"wide profile must be a single pass:\n${wide.queryExecution.sparkPlan}")
    // and it still reads only the profiled columns (column pruning)
    val read = wide.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet
    }.head
    assert(read === Analytics.ProfileWideCols.toSet, s"scan reads $read")
  }

  test("the narrow oracle form pays scan-per-column — the wide form is the fix") {
    val narrow = Analytics.profileLineitem(spark, sfDir)
    assert(scanCount(narrow) === 4, "narrow union form: one scan per profiled column")
  }

  test("profile_wide values equal the scan-per-column form's") {
    val wide = Analytics.profileWide(spark, sfDir)
      .filter(col("column_name").isin("l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus"))
      .select("column_name", "n", "n_null", "min_str", "max_str")
    val narrow = Analytics.profileLineitem(spark, sfDir)
      .select("column_name", "n", "n_null", "min_str", "max_str")
    assert(wide.collect().map(_.toSeq).toSet === narrow.collect().map(_.toSeq).toSet)
  }

  test("approx variant: still one scan, HLL distinct within 10% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val cols = Analytics.ProfileWideCols
    val approx = Analytics.profileWideApprox(li, cols)
    assert(scanCount(approx) === 1, "approx wide profile must also be a single pass")
    val got = approx.collect().map(r =>
      r.getString(0) -> r.getLong(3)).toMap // n_distinct_approx
    val exact = cols.map { c =>
      c -> li.agg(count_distinct(col(c))).head().getLong(0)
    }.toMap
    cols.foreach { c =>
      val (a, e) = (got(c).toDouble, exact(c).toDouble)
      assert(math.abs(a - e) / math.max(e, 1.0) <= 0.10,
        s"$c: approx $a vs exact $e drifts past 10%")
    }
  }
}
