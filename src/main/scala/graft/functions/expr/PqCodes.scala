package graft.functions.expr


import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization codes of a vector: for each of `m` subspaces,
  * the index of the nearest sub-codebook centroid by squared L2 —
  * `array<int>` of `m` codes.
  *
  * This is the corpus-scale half of PQ (every vector of a 100 TB
  * corpus encodes once), so it follows the [[IvfCells]] pattern: the
  * codebook rides as a codegen REFERENCE OBJECT and the generated code
  * is ONE static call — not m×k inlined higher-order-function folds,
  * which stay outside whole-stage codegen and generate enough source
  * to churn the Janino cache.
  *
  * Distance arithmetic mirrors the composed form and the SQL oracle
  * exactly: doubles folded in input order, each subspace distance
  * rounded to 6 decimals (floor-form half-up) BEFORE the argmin,
  * first-wins ties = lowest code.
  */
case class PqCodes(child: Expression,
                   m: Int,
                   codebook: Seq[Seq[Double]]) extends UnaryExpression {

  require(codebook.nonEmpty, "codebook must be non-empty")
  require(m >= 1 && codebook.head.nonEmpty && codebook.head.length % m == 0,
    s"dims=${codebook.head.length} must divide into m=$m subspaces")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float|double>, got ${t.catalogString}")
  }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val packed =
    PqCodes.Packed(codebook.map(_.toArray).toArray, m)

  override def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData], packed, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", packed, classOf[PqCodes.Packed].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.PqCodes.compute($x, $ref, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)

  override def prettyName: String = "pq_codes"
}

object PqCodes {

  case class Packed(vecs: Array[Array[Double]], m: Int)

  // floor-form half-up: pure IEEE ops, so the SQL oracle's identical
  // expression produces the same bits even at decimal ties (the
  // BigDecimal shortest-repr form diverges from engines that round the
  // binary value — see graft.functions.Rounding)
  private def round6(d: Double): Double =
    math.floor(d * 1000000.0 + 0.5) / 1000000.0

  /** Static entry point shared by eval and generated code. */
  def compute(v: ArrayData, cb: Packed, isFloat: Boolean): ArrayData = {
    val dims = cb.vecs(0).length
    val sub = dims / cb.m
    val x = new Array[Double](dims)
    var i = 0
    val n = math.min(dims, v.numElements())
    while (i < n) {
      x(i) = if (v.isNullAt(i)) 0.0
             else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      val off = j * sub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.vecs.length) {
        val cv = cb.vecs(c)
        var d = 0.0
        i = 0
        while (i < sub) {
          val diff = x(off + i) - cv(off + i)
          d += diff * diff
          i += 1
        }
        val dr = round6(d)
        if (dr < bestD) { bestD = dr; best = c } // strict: first-wins ties
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}
