package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: scan every registered query's physical plan for the one
  * serial shape that does NOT scale — a `WindowExec` with an empty
  * partition spec (Spark moves ALL input rows to a single task). A
  * global scalar aggregate also plans an `Exchange SinglePartition`,
  * but its input is one row per partition — fine; this audit therefore
  * walks the plan tree for unpartitioned Window nodes instead of
  * string-matching the exchange. A few queries run a deliberately
  * bounded global window (post-aggregation row counts ≤ a few
  * hundred); those are listed in [[bounded]] with the reason, and the
  * audit reports them separately so a NEW serial stage can't hide
  * behind an old justified one.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {

  /** Queries whose single-partition stage is bounded by construction
    * (operates on already-aggregated rows, not raw data). */
  val bounded: Map[String, String] = Map(
    "vocab_growth" -> "running sum over <= #batches post-agg rows",
    "bpe_pairs" -> "top-k rank over the aggregated pair vocabulary (<= charset^2 rows)",
    "token_lift" -> "global rank over <= partitions x topK locally-pruned collocations",
    "events_new_users" -> "running sum over <= #days post-agg rows",
    "events_hazard" -> "reverse running sum over <= #lifetime-days post-agg rows")

  /** One query's audit result. `cartesians` counts CartesianProductExec
    * nodes — the all-pairs shape no query may EVER plan (a broadcast
    * scalar crossJoin plans BroadcastNestedLoopJoin, not this). */
  final case class Finding(name: String, globalWindows: Int,
                           justified: Boolean, error: Option[String],
                           cartesians: Int = 0)

  /** Audits every registered query; pure function of (spark, sfDir) so
    * the regression spec and the CLI share one implementation. */
  def scan(spark: SparkSession, sfDir: String): Seq[Finding] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        // sparkPlan, not executedPlan: AQE wraps the latter in an
        // AdaptiveSparkPlanExec whose inner tree collect() can't see
        val plan = fn(spark, sfDir).queryExecution.sparkPlan
        val globalWindows = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }
        val cartesians = plan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }
        if (globalWindows.isEmpty && cartesians.isEmpty) None
        else Some(Finding(name, globalWindows.size,
          cartesians.isEmpty && bounded.contains(name), None, cartesians.size))
      } catch {
        case e: Throwable => Some(Finding(name, 0, justified = false,
          Some(e.getMessage)))
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val findings = scan(spark, sfDir)
    findings.foreach {
      case Finding(n, _, _, Some(err), _) => println(s"ERROR   $n: $err")
      case Finding(n, _, _, _, x) if x > 0 => println(s"CARTESIAN $n ($x node(s))")
      case Finding(n, _, true, _, _) => println(s"BOUNDED $n: ${bounded(n)}")
      case Finding(n, c, false, _, _) => println(s"SERIAL  $n ($c global window(s))")
    }
    val serial = findings.filter(f => !f.justified)
    println(if (serial.isEmpty) "== audit clean =="
            else s"== ${serial.size} unjustified serial plans: ${serial.map(_.name).mkString(", ")} ==")
    spark.stop()
  }
}
