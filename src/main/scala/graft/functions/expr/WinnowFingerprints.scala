package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints of a single-space-tokenized text: the
  * distinct per-`window` minima over the POSITIONAL `n`-gram hash
  * stream (Schleimer/Wilkerson/Aiken — the MOSS selection rule).
  *
  * Semantically identical to the composed form (gram hashes via
  * `conv(substring(md5(gram), 1, 8), 16, 10)`, then
  * `array_distinct(transform(sequence(...), i => array_min(slice(h,
  * i+1, w))))`), which the DuckDB oracle replays — but ONE static JVM
  * call per row. The composed form is quadratic-by-reevaluation:
  * Catalyst inlines the gram-hash array expression into every window
  * lambda, so every window rebuilds every gram's md5 (tokens × windows
  * hashes per row — 90 s at sf0.1 where this expression takes
  * fractions of a second).
  *
  * Short inputs follow the composed edge cases exactly: < n tokens →
  * one whole-text gram; < window grams → the single global minimum.
  */
case class WinnowFingerprints(child: Expression, n: Int, window: Int)
    extends UnaryExpression {

  require(n >= 1 && window >= 1, s"need n >= 1 and window >= 1, got $n/$window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], n, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.WinnowFingerprints.compute($x, $n, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** conv(substring(md5(s), 1, 8), 16, 10) as a long — the first four
    * md5 bytes read big-endian, unsigned. */
  private def gramHash(s: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, n: Int, window: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    // positional gram-hash stream (NOT distinct — order matters)
    val h: Array[Long] =
      if (toks.length >= n) {
        val out = new Array[Long](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = gramHash(sb.toString)
          i += 1
        }
        out
      } else Array(gramHash(String.join(" ", toks: _*)))
    if (h.length < window) {
      var m = h(0); var i = 1
      while (i < h.length) { if (h(i) < m) m = h(i); i += 1 }
      new GenericArrayData(Array[Any](m))
    } else {
      // distinct window minima, first-occurrence order
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= h.length - window) {
        var m = h(i); var j = 1
        while (j < window) { if (h(i + j) < m) m = h(i + j); j += 1 }
        seen.add(m)
        i += 1
      }
      val arr = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next().longValue(); k += 1 }
      new GenericArrayData(arr)
    }
  }
}
