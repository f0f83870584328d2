package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First-occurrence-distinct non-overlapping `k`-token segments of a
  * single-space-tokenized text — the intra-document segment dedup
  * kernel ([[graft.operators.Dedup.segmentDedupIntra]]).
  *
  * Semantically identical to the composed form
  * `filter(segs, (s, i) => array_position(segs, s) == i + 1)` over
  * `segs = transform(sequence(0, ceil(len/k)-1), i =>
  * array_join(slice(toks, i*k+1, k), " "))` — but one hash-set pass
  * per row instead of interpreted higher-order lambdas doing an
  * O(segments²) array_position probe (HOFs never enter whole-stage
  * codegen; this does). The trailing partial segment is its own unit,
  * like the composed form's clipped slice.
  */
case class SegmentsDistinct(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"segment width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"segments_distinct requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SegmentsDistinct.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.SegmentsDistinct.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): SegmentsDistinct =
    copy(child = newChild)

  override def prettyName: String = "segments_distinct"
}

object SegmentsDistinct {

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // split(" ", -1): identical to Spark's split(text, " ")
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < toks.length) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += k
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) {
      arr(n) = UTF8String.fromString(it.next())
      n += 1
    }
    new GenericArrayData(arr)
  }
}

/** ALL non-overlapping `k`-token segments of a text, in order,
  * duplicates kept — the corpus-level segment dedup's explode input
  * ([[graft.operators.Dedup.segmentDedupCorpus]]). Same single-pass
  * replacement for the interpreted transform + slice + array_join
  * composition as [[SegmentsDistinct]], without the distinct. */
case class Segments(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"segment width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"segments requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Segments.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.Segments.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): Segments =
    copy(child = newChild)

  override def prettyName: String = "segments"
}

object Segments {

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = (toks.length + k - 1) / k
    val arr = new Array[Any](n)
    var s = 0
    var i = 0
    while (i < toks.length) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      arr(s) = UTF8String.fromString(sb.toString)
      s += 1
      i += k
    }
    new GenericArrayData(arr)
  }
}
