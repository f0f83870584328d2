package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd `size(filter(arr, e => v > e))` (countGreater = false) /
  * `size(filter(arr, e => v < e))` (countGreater = true; includeEqual
  * adds the `=` arm to either direction) over an
  * `array<double>` of range edges — the shard-assignment probe of
  * [[graft.operators.ExactRank]] and
  * [[graft.operators.Curation.budgetSample]].
  *
  * The composed higher-order-function form runs the per-element lambda
  * INTERPRETED (HOFs never enter whole-stage codegen): ~|edges|
  * interpreted comparisons per row in the scan-fused stage, which at
  * bench scale is single-task (one parquet row group per input file) —
  * measured as the bulk of every ExactRank pass. This expression is a
  * tight primitive loop in generated code.
  *
  * Null semantics mirror the composed form exactly: a NULL array →
  * NULL (`size(null)`); a NULL probe value → 0 (the lambda yields NULL
  * for every element, `filter` keeps none); NULL elements are never
  * counted. Comparison is Spark's double ordering
  * (SQLOrderingUtil.compareDoubles: NaN largest, -0.0 == 0.0) — the
  * same semantics the composed `v > e` BinaryComparison uses, so NaN
  * values shard consistently with the ranking windows downstream
  * (callers cast the probe to double; long→double is monotone).
  */
case class ArrayCountCompare(left: Expression, right: Expression,
                             countGreater: Boolean,
                             includeEqual: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_count_compare requires (array<double>, double), got " +
        s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullable: Boolean = left.nullable

  // custom null handling (NULL probe → 0, not NULL), so not nullSafeEval
  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val v = right.eval(input)
    if (v == null) return 0
    ArrayCountCompare.count(arr.asInstanceOf[ArrayData],
      v.asInstanceOf[Double], countGreater, includeEqual)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val nullCheck =
      if (left.nullable) code"${ev.isNull} = ${l.isNull};" else code""
    val isNullDecl =
      if (left.nullable) code"boolean ${ev.isNull} = false;"
      else code""
    ev.copy(
      code = code"""
        ${l.code}
        $isNullDecl
        int ${ev.value} = 0;
        $nullCheck
        if (${if (left.nullable) s"!${ev.isNull}" else "true"}) {
          ${r.code}
          if (!${r.isNull}) {
            ${ev.value} = graft.functions.expr.ArrayCountCompare.count(
              ${l.value}, ${r.value}, $countGreater, $includeEqual);
          }
        }
      """,
      isNull = if (left.nullable) ev.isNull else FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCountCompare =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_count_compare"
}

object ArrayCountCompare {

  /** Column-level constructor; the probe must already be double (cast
    * at the call site — long→double is monotone, and shard functions
    * only need monotone + self-consistent, see the operator docs). */
  def of(arr: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column,
         countGreater: Boolean, includeEqual: Boolean = false)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(ArrayCountCompare(
      org.apache.spark.sql.GraftBridge.expression(arr),
      org.apache.spark.sql.GraftBridge.expression(v),
      countGreater, includeEqual))

  /** Static entry point shared by eval and generated code.
    *
    * Comparison runs through Spark's own double ordering
    * (SQLOrderingUtil.compareDoubles — NaN greater than everything,
    * -0.0 == 0.0), NOT raw Java `<`/`>`: the composed
    * `size(filter(arr, e => v > e))` form this expression replaces
    * compares through the same ordering, so a NaN probe or edge ranks
    * identically here and in the ranking window that consumes the
    * shard — raw Java comparison would silently send NaN rows to
    * shard 0 while the window sorts them last. */
  def count(arr: ArrayData, v: Double, countGreater: Boolean,
            includeEqual: Boolean): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(v, arr.getDouble(i))
        val hit =
          if (countGreater) { if (includeEqual) cmp <= 0 else cmp < 0 }
          else { if (includeEqual) cmp >= 0 else cmp > 0 }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }
}
