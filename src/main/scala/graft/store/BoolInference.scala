package graft.store

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conservative boolean inference — the reference's `series_is_boolean`
  * (/root/reference/pandabase/helpers.py:35), applied on table create
  * like the reference's column mapping does.
  *
  * Per column: `None` if all values are NULL; `Some(true)` if the
  * column is already boolean, or is numeric with every non-null value
  * in {0, 1} AND both 0 and 1 present (the reference's caveat: all-zero
  * or all-one columns are NOT boolean); `Some(false)` otherwise.
  *
  * All candidate columns are decided in ONE aggregation pass (a single
  * scan regardless of column count — this runs against full tables).
  */
object BoolInference {

  private def isNumeric(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }

  /** series_is_boolean for every column of `df` in one pass. */
  def columnsAreBoolean(df: DataFrame): Map[String, Option[Boolean]] = {
    val candidates = df.schema.fields.filter(f =>
      f.dataType == BooleanType || isNumeric(f.dataType))
    if (candidates.isEmpty)
      return df.columns.map(_ -> Some(false).asInstanceOf[Option[Boolean]]).toMap

    val aggs = candidates.flatMap { f =>
      val c = col(f.name)
      val (isZero, isOne) =
        if (f.dataType == BooleanType) (!c, c) else (c === 0, c === 1)
      Seq(
        count(c).as(s"${f.name}!n"),
        count(when(isZero, 1)).as(s"${f.name}!zeros"),
        count(when(isOne, 1)).as(s"${f.name}!ones"))
    }
    val r: Row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
    val decided = candidates.zipWithIndex.map { case (f, i) =>
      val n = r.getLong(3 * i)
      val zeros = r.getLong(3 * i + 1)
      val ones = r.getLong(3 * i + 2)
      val verdict: Option[Boolean] =
        if (n == 0) None
        else if (f.dataType == BooleanType) Some(true)
        else Some(zeros + ones == n && zeros > 0 && ones > 0)
      f.name -> verdict
    }.toMap
    df.columns.map(c => c -> decided.getOrElse(c, Some(false))).toMap
  }

  /** Cast the columns inferred boolean (among `eligible`) to
    * BooleanType; all-null and non-boolean-shaped columns unchanged. */
  def applyInference(df: DataFrame, eligible: Set[String]): DataFrame = {
    val verdicts = columnsAreBoolean(df)
    df.columns.foldLeft(df) { (d, c) =>
      if (eligible.contains(c) && d.schema(c).dataType != BooleanType &&
          verdicts(c).contains(true))
        d.withColumn(c, col(c) =!= 0)
      else d
    }
  }
}
