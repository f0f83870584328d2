package graft

import org.scalatest.funsuite.AnyFunSuite

/** The correctness gate can only be trusted if its key set is stable:
  * r8 proved a failing query can otherwise vanish from the driver's
  * CORRECTNESS file instead of showing red (stream_upsert). Verify now
  * exits nonzero on any runtime failure; this spec pins the
  * contract-level invariants that don't need a Spark session.
  */
class GateCompletenessSpec extends AnyFunSuite {

  test("every registered query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("the merged query registries are pairwise disjoint") {
    // SparkEntry.queries is built with ++ — a key collision would
    // silently drop one registry's implementation from the gate.
    val regs = Seq(
      "PbQueries" -> PbQueries.queries.keySet,
      "LlmQueries" -> LlmQueries.queries.keySet,
      "Analytics" -> Analytics.queries.keySet)
    for {
      (an, a) <- regs
      (bn, b) <- regs if an < bn
    } assert((a & b).isEmpty, s"$an and $bn both register: ${(a & b).mkString(", ")}")
    val inline = SparkEntry.queries.keySet --
      regs.map(_._2).reduce(_ ++ _)
    val expectedInline = Set("q1_pricing_summary",
      "multimodal_meta", "multimodal_frames", "multimodal_patches",
      "multimodal_audio_windows")
    assert(inline == expectedInline,
      s"inline SparkEntry registrations drifted: $inline")
  }

  test("no oracle SQL is blank") {
    val blank = SparkEntry.oracleSql.collect { case (k, v) if v.trim.isEmpty => k }
    assert(blank.isEmpty, s"blank oracles: ${blank.mkString(", ")}")
  }
}
