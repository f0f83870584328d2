package graft.functions.expr

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature: `planes` sign bits packed into a
  * long, bit p = 1 iff Σᵢ v[i]·w(seed,p,i) > 0 with the deterministic
  * pseudo-random weight
  * `w = (md5_32("{seed·100003+p}:{i}") mod 2000001)/1e6 − 1` where
  * md5_32 is the first 8 md5 hex chars as an unsigned 32-bit value —
  * engine-portable, so a SQL oracle can replay the exact planes
  * (`('0x'||substr(md5(sp||':'||i),1,8))::BIGINT`).
  *
  * Bit-identical to the composed HOF form in
  * `VectorFunctions.hyperplaneLshSignatureComposed` (same md5 chain,
  * same double arithmetic in the same order, any-null element ⇒ 0L),
  * but the weight matrix depends only on (seed, planes, dims): it is
  * derived ONCE per executor and cached, so the per-row work drops from
  * planes×dims interpreted md5 folds to `planes` fused dot products —
  * the ann_lsh / embedding-near-dup candidate-generation hot loop.
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
    * `conv(substring(md5("{sp}:{i}"), 1, 8), 16, 10) % 2000001 / 1e6 - 1`
    * with sp = seed·100003 + p: first 4 md5 digest bytes as an unsigned
    * 32-bit value, mod, scale to [-1, 1). */
  private def weights(seed: Int, planes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, planes, dims), _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes, dims) { (p, i) =>
        md.reset()
        val d = md.digest(s"${seed.toLong * 100003L + p}:$i".getBytes("UTF-8"))
        val x = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        (x % 2000001L).toDouble / 1000000.0 - 1.0
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
