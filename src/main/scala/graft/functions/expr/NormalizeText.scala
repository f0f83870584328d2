package graft.functions.expr

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonical pre-dedup/pre-tokenize
  * cleanup pass of an LLM data pipeline, as ONE codegen'd JVM call per
  * row (Spark has no built-in unicode-normalize function; the regex
  * alternative is four chained `regexp_replace`s, each a separate
  * interpreted pass):
  *
  *  1. NFD-decompose and drop combining marks (accent strip: é → e),
  *  2. NFC-recompose what remains,
  *  3. lowercase (locale-independent, Locale.ROOT),
  *  4. control chars → space, whitespace runs → one space, trim.
  *
  * Near-duplicate detection wants this first: "Café  Déjà" and
  * "cafe deja" should shingle identically. The DuckDB oracle composes
  * the same pipeline from `strip_accents`/`nfc_normalize`/`lower`/
  * `regexp_replace`; the unicode edge cases (where engine libs may
  * disagree) are spec-gated on this expression directly.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.NormalizeText.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  private val marks = Pattern.compile("\\p{M}+")
  // C0 + DEL only — NOT \p{Cc}, which also covers the C1 block
  // (U+0080–U+009F) that the DuckDB oracle's [\x00-\x1f\x7f] leaves
  // alone; both sides must agree beyond ASCII for engine parity
  private val controls = Pattern.compile("[\\x00-\\x1f\\x7f]")
  private val spaces = Pattern.compile("\\s+")

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String): UTF8String = {
    var s = Normalizer.normalize(text.toString, Normalizer.Form.NFD)
    s = marks.matcher(s).replaceAll("")
    s = Normalizer.normalize(s, Normalizer.Form.NFC)
    s = s.toLowerCase(java.util.Locale.ROOT)
    s = controls.matcher(s).replaceAll(" ")
    s = spaces.matcher(s).replaceAll(" ").trim
    UTF8String.fromString(s)
  }
}
