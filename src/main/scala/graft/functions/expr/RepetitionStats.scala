package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass repetition statistics over a text column — the raw
  * counts behind Gopher-style repetition quality filters: returns
  * `array<bigint>` of
  * `[n_tokens, n_distinct_tokens, top_token_count,
  *   n_bigrams, n_distinct_bigrams, top_bigram_count]`
  * where tokens are `split(text, ' ')` and bigrams are consecutive
  * token pairs joined with a space. The fractions (duplicate-token
  * ratio, top-token share, top-bigram share) are derived from these
  * integer counts in the query so a SQL oracle reproduces them with no
  * floating-point divergence.
  *
  * One tokenize + two small hash maps per row, instead of the composed
  * sort-the-array-and-fold HOF chain (which re-walks the token array
  * per statistic, interpreted).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.RepetitionStats.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    // split(text, " ") semantics: consecutive spaces yield empty tokens,
    // and the empty string yields one empty token — they all count
    val toks = text.toString.split(" ", -1)
    val tokCounts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) {
      tokCounts.put(toks(i), tokCounts.getOrDefault(toks(i), 0) + 1)
      i += 1
    }
    var topTok = 0
    val it = tokCounts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > topTok) topTok = c }

    val nBigrams = math.max(toks.length - 1, 0)
    val biCounts = new java.util.HashMap[String, Int]()
    i = 0
    while (i < toks.length - 1) {
      val bg = toks(i) + " " + toks(i + 1)
      biCounts.put(bg, biCounts.getOrDefault(bg, 0) + 1)
      i += 1
    }
    var topBi = 0
    val bit = biCounts.values().iterator()
    while (bit.hasNext) { val c = bit.next(); if (c > topBi) topBi = c }

    new GenericArrayData(Array[Long](
      toks.length.toLong, tokCounts.size().toLong, topTok.toLong,
      nBigrams.toLong, biCounts.size().toLong, topBi.toLong))
  }
}
