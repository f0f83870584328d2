package graft

/** Regression gate over EVERY registered query's physical plan: no
  * query may introduce an unpartitioned Window (the shape that
  * serializes raw data into one task at scale) unless it is
  * explicitly justified in [[PlanAudit.bounded]] with a reason. Only
  * the FINAL DataFrame of each query is planned, never executed (the
  * store queries do build their tables eagerly while constructing —
  * that is their query shape, and it is what bounds this sweep's
  * runtime). */
class PlanAuditSpec extends SparkSpec {

  test("no query plans an unjustified global window, none fail to plan") {
    val findings = PlanAudit.scan(spark, sfDir)
    val errors = findings.filter(_.error.nonEmpty)
    assert(errors.isEmpty,
      s"queries failed to plan: ${errors.map(f => s"${f.name}: ${f.error.get}").mkString("; ")}")
    val cartesian = findings.filter(_.cartesians > 0)
    assert(cartesian.isEmpty,
      s"all-pairs CartesianProduct plans (never allowed): ${cartesian.map(_.name).mkString(", ")}")
    val serial = findings.filter(f => !f.justified && f.error.isEmpty)
    assert(serial.isEmpty,
      "unjustified single-task window plans (add to PlanAudit.bounded " +
      s"ONLY with a real bound): ${serial.map(_.name).mkString(", ")}")
    // the allowlist must not rot: every justified entry still exists
    // and still has its global window (else the entry is stale)
    val flagged = findings.filter(_.justified).map(_.name).toSet
    assert(flagged == PlanAudit.bounded.keySet,
      s"stale PlanAudit.bounded entries: ${(PlanAudit.bounded.keySet -- flagged).mkString(", ")}")
  }
}
