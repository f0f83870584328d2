package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `n` nearest IVF centroids of a vector, by (cosine DESC, cid ASC),
  * as `array<bigint>` of centroid ids.
  *
  * Centroids ride along as a reference object, so the generated code is
  * ONE static call — the previous composition (an array of 16 inlined
  * dot-product loops + an O(cells²) argmax when-chain) generated so much
  * source that re-Janino-compiling it after codegen-cache churn cost
  * seconds per run. Cosines are computed as dot/(‖v‖·‖c‖) in input
  * order with a sequential double fold — bit-identical to the SQL
  * oracle's `list_dot_product(v, c)/(sqrt(..)*sqrt(..))` ranking with
  * `ORDER BY sim DESC, cid` (first-wins selection keeps the lowest cid
  * on exact ties).
  */
case class IvfCells(child: Expression,
                    centIds: Seq[Long],
                    centVecs: Seq[Seq[Double]],
                    n: Int) extends UnaryExpression {

  require(centIds.nonEmpty && centIds.length == centVecs.length,
    "centroid ids/vectors must align and be non-empty")
  require(n >= 1 && n <= centIds.length, s"n must be in [1, ${centIds.length}]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_cells requires array<float|double>, got ${t.catalogString}")
  }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val packed = IvfCells.Packed(
    centIds.toArray,
    centVecs.map(_.toArray).toArray,
    centVecs.map(c => math.sqrt(c.map(x => x * x).sum)).toArray)

  override def nullSafeEval(input: Any): Any =
    IvfCells.compute(input.asInstanceOf[ArrayData], packed, n, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", packed, classOf[IvfCells.Packed].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.IvfCells.compute($x, $ref, $n, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)

  override def prettyName: String = "ivf_cells"
}

object IvfCells {

  /** Centroid ids + vectors + precomputed norms. */
  case class Packed(ids: Array[Long], vecs: Array[Array[Double]], norms: Array[Double])

  /** Static entry point shared by eval and generated code. */
  def compute(v: ArrayData, cents: Packed, n: Int, isFloat: Boolean): ArrayData = {
    val dims = v.numElements()
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) {
      // null elements contribute 0 (deterministic; dense embeddings
      // never carry nulls, but SQL callers might)
      x(i) = if (v.isNullAt(i)) 0.0
             else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var vv = 0.0
    i = 0
    while (i < dims) { vv += x(i) * x(i); i += 1 }
    val nv = math.sqrt(vv)

    val c = cents.ids.length
    val sims = new Array[Double](c)
    var ci = 0
    while (ci < c) {
      val cv = cents.vecs(ci)
      val m = math.min(dims, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) { dot += x(i) * cv(i); i += 1 }
      sims(ci) = dot / (nv * cents.norms(ci))
      ci += 1
    }
    // selection of the top n by (sim DESC, cid ASC): first-wins strict
    // comparison keeps the lowest index (== lowest cid) on ties
    val picked = new Array[Boolean](c)
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      var best = -1
      ci = 0
      while (ci < c) {
        if (!picked(ci) && (best < 0 || sims(ci) > sims(best))) best = ci
        ci += 1
      }
      picked(best) = true
      out(k) = cents.ids(best)
      k += 1
    }
    new GenericArrayData(out)
  }
}
