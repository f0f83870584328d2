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

  test("SURVEY.md §2 documents exactly the gate's query keys") {
    // The §2 ↔ gate walk is the audit backbone: every gate row must be
    // documented as a `→ `key`` clause in the §2 operator inventory,
    // and §2 must not advertise keys the gate no longer runs. Round 14
    // broke this silently (two undocumented rows); this spec makes the
    // drift a red test instead of a judge finding.
    val path = java.nio.file.Paths.get("SURVEY.md")
    assert(java.nio.file.Files.exists(path),
      s"SURVEY.md not found at ${path.toAbsolutePath}")
    val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val start = text.indexOf("\n## §2")
    val end = text.indexOf("\n## §3")
    assert(start >= 0 && end > start, "SURVEY.md §2/§3 headings missing")
    val sec2 = text.substring(start, end)
    // a documented key set is every backticked token between an arrow
    // "→" and the first status marker bracket "[" (the §2 convention:
    // `… → `key1`, `key2` [oracle][spec]`)
    val arrowClause = "(?s)→([^→]*?)\\[".r
    val token = "`([a-z][a-z0-9_]*)`".r
    val documented: Set[String] = arrowClause.findAllMatchIn(sec2)
      .flatMap(m => token.findAllMatchIn(m.group(1)).map(_.group(1)))
      .toSet
    val gate = SparkEntry.queries.keySet
    assert((gate -- documented).isEmpty,
      s"gate queries missing from SURVEY §2: ${(gate -- documented).toSeq.sorted.mkString(", ")}")
    assert((documented -- gate).isEmpty,
      s"SURVEY §2 documents keys the gate does not run: ${(documented -- gate).toSeq.sorted.mkString(", ")}")
  }
}
