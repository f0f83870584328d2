package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a single-space-tokenized text.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i, n))))` — including `split`'s
  * keep-trailing-empties behavior and first-occurrence distinct order —
  * but runs as one static JVM call per row instead of four nested
  * interpreted lambda walks with per-shingle array slices. Feeds the
  * minhash / jaccard / fingerprint pipeline heads.
  *
  * Documents shorter than `n` tokens collapse to one whole-text shingle.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.WordShingles.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // split(" ", -1): identical to Spark's split(text, " ") — trailing
    // empty tokens are kept
    val toks = text.toString.split(" ", -1)
    if (toks.length >= n) {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val arr = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) {
        arr(k) = UTF8String.fromString(it.next())
        k += 1
      }
      new GenericArrayData(arr)
    } else {
      new GenericArrayData(
        Array[Any](UTF8String.fromString(String.join(" ", toks: _*))))
    }
  }
}
