package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 128-bit content hashes of every `w`-CHARACTER window of a text,
  * stride 1 — the fanout of the Lee-et-al substring-dedup family
  * ([[graft.operators.Dedup.duplicateSpans]]), as ONE static JVM call
  * per row.
  *
  * Equality contract: two windows get the same (h1, h2) pair iff their
  * UTF-8 byte sequences are equal (modulo a 2⁻¹²⁸ birthday collision —
  * two independent-seed XXH64 runs over the same bytes), which is the
  * same equivalence relation `md5(substr(text, i+1, w))` induces — the
  * hash VALUES never reach any output, only their equality classes do,
  * so the composed md5 form and this one compute identical spans. The
  * DuckDB oracle keeps replaying the md5 form.
  *
  * What it saves vs `transform(sequence(...), i -> md5(substr(...)))`:
  * the per-element interpreted lambda (HOFs never enter whole-stage
  * codegen), one cryptographic digest + 32-char hex string per window
  * (the downstream exchange/sort carried 32-byte keys), and one
  * UTF8String allocation per window (windows hash in place over the
  * text's byte buffer via per-character offsets — multi-byte
  * characters handled exactly like substr's character addressing).
  *
  * Returns `array<struct<h1:bigint, h2:bigint>>` of length
  * `numChars - w + 1`; fewer than `w` characters yields an empty array
  * (callers filter `length >= w` anyway, matching the composed form's
  * empty `sequence` guard).
  */
case class WindowHashPairs(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"need w >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_hash_pairs requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WindowHashPairs.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.WindowHashPairs.compute($x, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashPairs =
    copy(child = newChild)

  override def prettyName: String = "window_hash_pairs"
}

object WindowHashPairs {

  // Two fixed, distinct seeds give two independent 64-bit hashes per
  // window; a cross-window clash needs BOTH to collide. Caveat: that
  // 2^-128 estimate assumes random inputs — XXH64 is non-cryptographic
  // with known seed-independent collision structure, so an ADVERSARIAL
  // corpus (crafted crawl text) can construct windows that collide
  // under both seeds at once, falsely merging span classes where the
  // md5-based oracle form would not. For hostile inputs swap Seed2's
  // hash for a structurally different function (e.g. Murmur3-128);
  // for organic/crawl-scale data the two-seed form stands.
  private val Seed1 = 42L
  private val Seed2 = 0x9e3779b97f4a7c15L

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val nChars = text.numChars()
    if (nChars < w) return new GenericArrayData(Array.empty[Any])
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    // per-character byte offsets so windows address CHARACTERS (the
    // substr contract) while hashing raw bytes in place
    val offs = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (c < nChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + b))
      c += 1
    }
    offs(nChars) = nBytes
    val n = nChars - w + 1
    val out = new Array[Any](n)
    var p = 0
    while (p < n) {
      val s = offs(p)
      val len = offs(p + w) - s
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + s, len, Seed1)
      val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + s, len, Seed2)
      out(p) = new GenericInternalRow(Array[Any](h1, h2))
      p += 1
    }
    new GenericArrayData(out)
  }
}
