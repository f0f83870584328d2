package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding for float-derived scores.
  *
  * `round(x, n)` on a double is NOT portable across engines at ties:
  * Spark routes through the double's SHORTEST decimal representation
  * (`BigDecimal.valueOf` — so 0.0032134999999999998, printed
  * "0.0032135", HALF_UPs to 0.003214) while DuckDB rounds the actual
  * binary value (→ 0.003213). Real data hits such ties (sf0.1 found
  * 0.616992/192 = exactly 0.0032135 in decimal, one ulp below it in
  * binary).
  *
  * [[portableRound]] computes half-up as floor(x·10ⁿ + 0.5)/10ⁿ —
  * every step an IEEE double op, so any engine evaluating the same
  * expression shape on the same input double produces the SAME bits,
  * tie or no tie. (Half-up here means toward +∞ at exact .5, which
  * for negative inputs differs from round-half-away — consistency
  * across engines is the contract, not a rounding convention.)
  */
object Rounding {

  def portableRound(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 15, s"scale out of exact range: $scale")
    val f = math.pow(10, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** The matching DuckDB fragment, for oracle SQL authors. */
  def portableRoundSql(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    s"floor(($expr) * $f + 0.5) / $f"
  }

  /** The same floor-form half-up on a plain JVM double — for scalar
    * code (typed state functions) that must match [[portableRound]]
    * bit-for-bit on the same input. */
  def portableRoundDouble(x: Double, scale: Int): Double = {
    require(scale >= 0 && scale <= 15, s"scale out of exact range: $scale")
    val f = math.pow(10, scale)
    math.floor(x * f + 0.5) / f
  }
}
