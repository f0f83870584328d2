package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy maximum-match (longest-prefix-wins) tokenization of a
  * space-delimited text against a fixed vocabulary — the classic
  * MaxMatch segmentation algorithm (the WordPiece/CJK-segmentation
  * inference loop, minus the `##` continuation convention): within each
  * word, repeatedly emit the LONGEST vocabulary entry that prefixes the
  * remaining characters; when none matches, emit `<unk>` and advance
  * one character. Tokenizer INFERENCE as a per-row scalar loop — the
  * shape that belongs in a native expression, not in N nested
  * interpreted HOF lambdas or an iterative join per prefix length.
  *
  * Determinism contract: the output is a pure function of (text,
  * vocab); the vocabulary rides the expression as a reference object
  * (same pattern as [[IvfCells]]' centroids), so generated code and
  * interpreted eval share one lookup structure. Lookup is a hash set
  * probed from min(longest-entry, remaining) down to 1 — O(maxLen) set
  * probes per emitted token, independent of vocabulary size.
  */
case class MaxMatchTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "maxmatch vocabulary must not be empty")
  require(!vocab.contains(""), "maxmatch vocabulary must not contain the " +
    "empty string (a zero-length match would never advance the greedy loop)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"maxmatch_tokens requires a string input, got ${t.catalogString}")
  }

  @transient private lazy val packed = MaxMatchTokens.Packed(
    new java.util.HashSet[String](java.util.Arrays.asList(vocab: _*)),
    vocab.map(_.length).max)

  override def nullSafeEval(input: Any): Any =
    MaxMatchTokens.compute(input.asInstanceOf[UTF8String], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmVocab", packed,
      classOf[MaxMatchTokens.Packed].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.MaxMatchTokens.compute($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxMatchTokens =
    copy(child = newChild)

  override def prettyName: String = "maxmatch_tokens"
}

object MaxMatchTokens {

  val Unk = "<unk>"

  /** Vocabulary set + its longest entry's length. */
  case class Packed(entries: java.util.HashSet[String], maxLen: Int)

  /** Static entry point shared by eval and generated code. Words are
    * split on single spaces (split(" ", -1) semantics — empty words
    * from runs contribute nothing since no vocab entry is empty). */
  def compute(text: UTF8String, vocab: Packed): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var pos = 0
      while (pos < word.length) {
        val lim = math.min(vocab.maxLen, word.length - pos)
        var len = lim
        var hit: String = null
        while (len >= 1 && hit == null) {
          val cand = word.substring(pos, pos + len)
          if (vocab.entries.contains(cand)) hit = cand
          len -= 1
        }
        if (hit != null) {
          out.add(UTF8String.fromString(hit))
          pos += hit.length
        } else {
          out.add(UTF8String.fromString(Unk))
          pos += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}
