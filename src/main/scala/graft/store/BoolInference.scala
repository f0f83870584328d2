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

  private def candidatesOf(schema: StructType) =
    schema.fields.filter(f => f.dataType == BooleanType || isNumeric(f.dataType))

  /** The aggregation columns that decide every candidate column of
    * `schema` (3 counters per candidate). Exposed separately from
    * [[columnsAreBoolean]] so a caller can FUSE this scan with its own
    * aggregates — KeyedTable.create runs PK validation and bool
    * inference as ONE job over the staged parquet instead of two. */
  private[store] def aggColumns(schema: StructType): Seq[org.apache.spark.sql.Column] =
    candidatesOf(schema).toIndexedSeq.flatMap { f =>
      val c = col(f.name)
      val (isZero, isOne) =
        if (f.dataType == BooleanType) (!c, c) else (c === 0, c === 1)
      Seq(
        count(c).as(s"${f.name}!n"),
        count(when(isZero, 1)).as(s"${f.name}!zeros"),
        count(when(isOne, 1)).as(s"${f.name}!ones"))
    }

  /** [[decode]] against the named-metric map an `observe()` of
    * [[aggColumns]] returns (KeyedTable.create fuses the inference
    * into the staging write's own job — zero extra passes). */
  private[store] def decodeMap(schema: StructType,
                               m: Map[String, Any]): Map[String, Option[Boolean]] = {
    val decided = candidatesOf(schema).map { f =>
      val n = m(s"${f.name}!n").asInstanceOf[Long]
      val zeros = m(s"${f.name}!zeros").asInstanceOf[Long]
      val ones = m(s"${f.name}!ones").asInstanceOf[Long]
      val verdict: Option[Boolean] =
        if (n == 0) None
        else if (f.dataType == BooleanType) Some(true)
        else Some(zeros + ones == n && zeros > 0 && ones > 0)
      f.name -> verdict
    }.toMap
    schema.fieldNames.map(c => c -> decided.getOrElse(c, Some(false))).toMap
  }

  /** Reads the [[aggColumns]] counters back out of `r` starting at
    * field `offset`; verdicts for every column of `schema`. */
  private[store] def decode(schema: StructType, r: Row,
                            offset: Int): Map[String, Option[Boolean]] = {
    val decided = candidatesOf(schema).zipWithIndex.map { case (f, i) =>
      val n = r.getLong(offset + 3 * i)
      val zeros = r.getLong(offset + 3 * i + 1)
      val ones = r.getLong(offset + 3 * i + 2)
      val verdict: Option[Boolean] =
        if (n == 0) None
        else if (f.dataType == BooleanType) Some(true)
        else Some(zeros + ones == n && zeros > 0 && ones > 0)
      f.name -> verdict
    }.toMap
    schema.fieldNames.map(c => c -> decided.getOrElse(c, Some(false))).toMap
  }

  /** series_is_boolean for every column of `df` in one pass. */
  def columnsAreBoolean(df: DataFrame): Map[String, Option[Boolean]] = {
    val aggs = aggColumns(df.schema)
    if (aggs.isEmpty)
      return df.columns.map(_ -> Some(false).asInstanceOf[Option[Boolean]]).toMap
    decode(df.schema, df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head(), 0)
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
