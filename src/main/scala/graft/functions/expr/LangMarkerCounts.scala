package graft.functions.expr

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID statistics over a text column: returns
  * `array<bigint>` of `[s_en, s_es, s_fr, s_de, cjk]` where `s_l` is the
  * occurrence count of language `l`'s marker tokens (exactly
  * `size(filter(split(text,' '), t -> t in markers_l))`) and `cjk` is
  * 1 iff the text contains a codepoint in U+4E00–U+9FFF.
  *
  * The composed form re-ran an interpreted HOF filter (with its own
  * split) per score occurrence in the argmax when-chain — O(langs²)
  * full-text passes — plus a codepoint-class `regexp_replace` for the
  * CJK test. This walks the UTF-8 bytes ONCE: tokens split on the space
  * byte (0x20 never occurs inside a multibyte char), marker lookup is a
  * binary search on the token bytes packed into a long (markers are all
  * ≤ 8 ASCII bytes; longer tokens can't match), and the CJK test decodes
  * only 3-byte-starter sequences (U+4E00–U+9FFF are exactly the 3-byte
  * range E4B880–E9BFBF).
  */
case class LangMarkerCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_marker_counts requires string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    LangMarkerCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.LangMarkerCounts.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): LangMarkerCounts =
    copy(child = newChild)

  override def prettyName: String = "lang_marker_counts"
}

object LangMarkerCounts {

  import graft.functions.TextFunctions.LangMarkers

  val NumLangs: Int = LangMarkers.size

  /** ASCII token bytes (≤ 8) packed little-endian into a long — unique
    * per token because every marker is pure ASCII. */
  private def pack(s: String): Long = {
    val b = s.getBytes("UTF-8")
    require(b.length <= 8, s"marker '$s' longer than 8 bytes")
    var key = 0L
    var i = 0
    while (i < b.length) { key |= (b(i) & 0xFFL) << (8 * i); i += 1 }
    key
  }

  // sorted packed marker keys + per-key language-count increments
  // (a token like "la" or "und" can be a marker for several languages)
  private val (keys: Array[Long], incs: Array[Array[Int]]) = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Int]]
    for (((_, markers), li) <- LangMarkers.zipWithIndex; w <- markers) {
      val inc = m.getOrElseUpdate(pack(w), new Array[Int](NumLangs))
      inc(li) += 1
    }
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2))
  }

  private val maxMarkerLen = LangMarkers.flatMap(_._2).map(_.length).max

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val counts = new Array[Long](NumLangs + 1)
    var cjk = false
    var start = 0
    var i = 0
    while (i <= n) {
      val b = if (i < n) bytes(i) else ' '.toByte
      if (b == ' '.toByte) {
        val len = i - start
        if (len >= 1 && len <= maxMarkerLen) {
          var key = 0L
          var j = 0
          while (j < len) { key |= (bytes(start + j) & 0xFFL) << (8 * j); j += 1 }
          val idx = Arrays.binarySearch(keys, key)
          if (idx >= 0) {
            val inc = incs(idx)
            var li = 0
            while (li < NumLangs) { counts(li) += inc(li); li += 1 }
          }
        }
        start = i + 1
      } else if (!cjk && (b & 0xF0) == 0xE0 && i + 2 < n) {
        val cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) cjk = true
      }
      i += 1
    }
    counts(NumLangs) = if (cjk) 1L else 0L
    new GenericArrayData(counts)
  }
}
