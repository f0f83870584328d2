package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float|double>` embedding
  * columns (SURVEY.md §2 #25-27). Pure higher-order-function
  * expressions — codegen'd, no UDFs, run inside the scan.
  *
  * Doubles throughout: inputs are cast element-wise to double before the
  * fold so results are reproducible bit-for-bit in other engines (the
  * DuckDB oracle does the same cast).
  */
object VectorFunctions {

  private def d(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ — native codegen'd expression (sequential double sum, same
    * element order and therefore same result as the interpreted
    * `aggregate(zip_with(...))` fold it replaced). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.ArrayDotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot/(‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * long. Plane p's component for dimension i is a deterministic
    * pseudo-random value in [-1, 1) derived from the first 8 md5 hex
    * chars of "{seed·100003+p}:{i}" — no RNG state, so every executor
    * (and every engine, incl. the DuckDB oracle) derives the same
    * planes. Vectors with small angle share sign bits with high
    * probability (SimHash for the unit sphere).
    */
  def hyperplaneLshSignature(v: Column, planes: Int): Column =
    hyperplaneLshSignature(v, planes, seed = 0)

  /** Seeded variant: `seed` selects an independent set of hyperplanes,
    * so L seeds give the L independent hash tables classic LSH needs
    * for recall (a neighbor missed by one table is caught by another).
    * Native single pass ([[graft.functions.expr.HyperplaneLsh]]): the
    * md5-derived weight matrix is cached per executor, so per row
    * this is `planes` dot products, no hashing. */
  def hyperplaneLshSignature(v: Column, planes: Int, seed: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expr.HyperplaneLsh(
        org.apache.spark.sql.GraftBridge.expression(v), planes, seed))

  /** Composed-HOF reference form of [[hyperplaneLshSignature]] — kept
    * for the equivalence spec (and mirrored by the DuckDB oracle). */
  def hyperplaneLshSignatureComposed(v: Column, planes: Int, seed: Int): Column = {
    val proj = (0 until planes).map { p =>
      val sp = seed.toLong * 100003L + p
      // fold over dimensions: acc + v[i] * w(seed, p, i)
      val weighted = zip_with(d(v), sequence(lit(0), size(v) - 1),
        (x, i) => x * (
          (conv(substring(md5(concat(lit(s"$sp:"), i.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2000001L).cast("double") / 1000000.0 - 1.0))
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
    }
    proj.zipWithIndex.map { case (s, p) => when(s > 0, lit(1L << p)).otherwise(0L) }
      .reduce(_ + _)
  }
}
