package graft.functions.expr

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature: `planes` sign bits packed into a
  * long, bit p = 1 iff Σᵢ v[i]·w(seed,p,i) > 0 with the deterministic
  * pseudo-random weight w = pmod(xxhash64(seed·100003+p, i), 2000001)/1e6 − 1.
  *
  * Bit-identical to the composed HOF form in
  * `VectorFunctions.hyperplaneLshSignature` (same xxhash64 chain — seed
  * 42, long literal then int index — same double arithmetic in the same
  * order, any-null element ⇒ 0L), but the weight matrix depends only on
  * (seed, planes, dims): it is derived ONCE per executor and cached, so
  * the per-row work drops from planes×dims interpreted xxhash64 folds to
  * `planes` fused dot products — the ann_lsh / embedding-near-dup
  * candidate-generation hot loop.
  */
case class HyperplaneLsh(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def dataType: DataType = LongType

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_lsh requires array<float|double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneLsh.compute(input.asInstanceOf[ArrayData], planes, seed, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.HyperplaneLsh.compute($x, $planes, $seed, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_lsh"
}

object HyperplaneLsh {

  // weight matrices are tiny (planes × dims doubles) and few (one per
  // (seed, planes, dims) combination in the job) — cache per executor
  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  /** Same value chain as the composed form's
    * `pmod(xxhash64(lit(seed*100003L+p), i), 2000001) / 1e6 - 1.0`:
    * Spark's xxhash64 starts at seed 42, hashes the long literal, then
    * the int index. */
  private def weights(seed: Int, planes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, planes, dims), _ => {
      Array.tabulate(planes, dims) { (p, i) =>
        val h1 = XXH64.hashLong(seed.toLong * 100003L + p, 42L)
        val h = XXH64.hashInt(i, h1)
        val m = h % 2000001L
        val pm = if (m < 0) m + 2000001L else m
        pm.toDouble / 1000000.0 - 1.0
      }
    })

  /** Static entry point shared by eval and generated code. */
  def compute(v: ArrayData, planes: Int, seed: Int, isFloat: Boolean): Long = {
    val dims = v.numElements()
    val w = weights(seed, planes, dims)
    var i = 0
    while (i < dims) { // any null element nulls every plane sum → all bits 0
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var s = 0.0
      var j = 0
      if (isFloat) while (j < dims) { s += v.getFloat(j).toDouble * wp(j); j += 1 }
      else while (j < dims) { s += v.getDouble(j) * wp(j); j += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
