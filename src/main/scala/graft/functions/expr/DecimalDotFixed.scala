package graft.functions.expr

import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.Decimal

/** Exact-decimal dot product of a vector column against a FIXED
  * 6-dp weight vector — the apply side of
  * [[graft.operators.Knn.projectTopComponent]], as one narrow codegen
  * call per row.
  *
  * Numerically identical to the composed form it replaces (posexplode
  * the vector, cast each element double→DECIMAL(18,6), broadcast-join
  * a (dim, weight DECIMAL(8,6)) frame, `sum(x*v)` per id → DECIMAL
  * (38,12)): elements pin through the same
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` as Spark's cast
  * ([[GramUpperTriangle.pin6]] — NaN/±Inf/overflow → the cast's null),
  * the weights arrive already 6-dp-pinned (unscaled longs), products
  * and the sum are exact integer arithmetic (128-bit), and the result
  * is the same DECIMAL(38,12) value. Elements past the weight vector's
  * length are ignored (the join dropped them); null elements are
  * skipped (their null products never reached `sum`); a row whose
  * elements ALL skip yields null (`sum` over no rows).
  *
  * Caveat vs the composed form, stated honestly: a vector that is NULL
  * or empty produced NO output row through posexplode+groupBy, while a
  * projection necessarily emits one (with null score) — callers keep
  * such rows out (the corpus has none; the oracle gate would flag
  * them).
  */
case class DecimalDotFixed(child: Expression, weights: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 12)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"decimal_dot_fixed requires array<float|double>, got ${t.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DecimalDotFixed.compute(input.asInstanceOf[ArrayData], weights, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    val isF = elemIsFloat
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.expr.DecimalDotFixed.compute($x, $wRef, $isF);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DecimalDotFixed =
    copy(child = newChild)

  override def prettyName: String = "decimal_dot_fixed"
}

object DecimalDotFixed {

  /** Static entry point shared by eval and generated code; null when
    * every element skipped (the composed form's empty `sum`). */
  def compute(arr: ArrayData, weights: Array[Long], isFloat: Boolean): Decimal = {
    val n = math.min(arr.numElements(), weights.length)
    var hi = 0L
    var lo = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val xi = GramUpperTriangle.pin6(x)
        val wi = weights(i)
        // Long.MinValue in either slot = the cast's null (skipped product)
        if (xi != Long.MinValue && wi != Long.MinValue) {
          any = true
          val pLo = xi * wi
          val pHi = Math.multiplyHigh(xi, wi)
          val t = lo + pLo
          val carry = ((lo & pLo) | ((lo | pLo) & ~t)) >>> 63
          lo = t
          hi += pHi + carry
        }
      }
      i += 1
    }
    if (!any) return null
    val s = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    val d = Decimal(new JBigDecimal(s, 12))
    // overflow of DECIMAL(38,12) → null, matching the composed
    // explode+sum form's overflow behavior (never emit a Decimal that
    // violates its declared precision)
    if (d.changePrecision(38, 12)) d else null
  }
}
