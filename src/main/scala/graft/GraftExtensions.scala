package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.expr.{ArrayDotProduct, HyperplaneLsh, LangMarkerCounts, Md5Prefix64, MinHashSignature, NormalizeText, RepetitionStats, Segments, SegmentsDistinct, SimHash64, WinnowFingerprints, WordShingles}

/** Registers graft's native expressions as SQL functions.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`; then
  * `spark.sql("SELECT graft_array_dot(a, b)")` /
  * `graft_simhash64(hashes)` plan the codegen'd expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL UPDATE / MERGE INTO over graft keyed tables → the store's own
    // update/merge primitives (see graft.plans.GraftSqlDmlRule)
    ext.injectResolutionRule(session =>
      new graft.plans.GraftSqlDmlRule(session))
    ext.injectFunction((
      FunctionIdentifier("graft_array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_array_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_array_dot(arrayA, arrayB)")
        ArrayDotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_word_shingles(text, n)")
        val n = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_word_shingles: n must be an integer literal, got $other")
        }
        WordShingles(args.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash(shingles, k)")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash: k must be an integer literal, got $other")
        }
        MinHashSignature(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_winnow(text, n, window)")
        val Seq(n, w) = args.tail.map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_winnow: n/window must be integer literals, got $other")
        }
        WinnowFingerprints(args.head, n, w)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lang_stats"),
      new ExpressionInfo(classOf[LangMarkerCounts].getName, "graft_lang_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_lang_stats(text)")
        LangMarkerCounts(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64(arrayOfTokenHashes)")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_64"),
      new ExpressionInfo(classOf[Md5Prefix64].getName, "graft_md5_64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5_64(str)")
        Md5Prefix64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_repetition_stats(text)")
        RepetitionStats(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_segments"),
      new ExpressionInfo(classOf[Segments].getName, "graft_segments"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_segments(text, k)")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_segments: k must be an integer literal, got $other")
        }
        Segments(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_segments_distinct"),
      new ExpressionInfo(classOf[SegmentsDistinct].getName, "graft_segments_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_segments_distinct(text, k)")
        val k = args(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_segments_distinct: k must be an integer literal, got $other")
        }
        SegmentsDistinct(args.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_normalize_text(text)")
        NormalizeText(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_lsh"),
      new ExpressionInfo(classOf[HyperplaneLsh].getName, "graft_hyperplane_lsh"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_hyperplane_lsh(vec, planes, seed)")
        val Seq(planes, seed) = args.tail.map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_hyperplane_lsh: planes/seed must be integer literals, got $other")
        }
        HyperplaneLsh(args.head, planes, seed)
      }))
  }
}
