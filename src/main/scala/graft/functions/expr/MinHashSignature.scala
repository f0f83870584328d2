package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** k-function MinHash signature of an `array<string>` shingle set.
  *
  * Semantically identical to the composed form in
  * `TextFunctions.minhashSignature` — per shingle, the base hash is the
  * first 8 hex chars of md5 (i.e. the first 4 digest bytes, unsigned),
  * then `h_i(x) = ((2i+3)·x + 7919·i) mod 1000000007` minimized over the
  * set — so the DuckDB oracle replays it exactly. But instead of an
  * interpreted `aggregate`/`zip_with` fold that allocates a k-array per
  * shingle and re-parses md5 hex through `conv`, this runs one digest
  * and k fused multiply-mod-min updates per shingle in a single JVM
  * pass (the dedup_minhash_lsh hot loop).
  *
  * Empty input yields the seed array `[p, p, …]`, matching the fold.
  * Null elements are skipped (least() ignores nulls in the fold).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"signature length must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string> shingles, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.expr.MinHashSignature.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {

  /** Same modulus as TextFunctions.MinhashPrime; also the "+∞" seed. */
  val Prime: Long = 1000000007L

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by eval and generated code. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val minima = new Array[Long](k)
    java.util.Arrays.fill(minima, Prime)
    val md = digests.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      // null shingles are skipped, matching the composed form where
      // least() ignores null hash values
      if (!shingles.isNullAt(i)) {
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        // first 4 digest bytes as an unsigned 32-bit value == the
        // composed form's conv(substring(md5(s), 1, 8), 16, 10)
        val x = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < k) {
          // (2j+3)·x + 7919·j < 2^38 for practical k — no overflow, no pmod
          val h = ((2L * j + 3L) * x + 7919L * j) % Prime
          if (h < minima(j)) minima(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(minima)
  }
}
