package graft.store

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result of a comparison — truthy like the reference's Companda object
  * (/root/reference/pandabase/companda.py:19). */
final case class CompandaResult(equal: Boolean, columnsEqual: Boolean, message: String) {
  override def toString: String =
    if (equal) "COMPANDA(true)"
    else s"COMPANDA(false); columns_equal=$columnsEqual. Unequal because: $message"
}

/** Distributed DataFrame comparison — the reference's companda
  * (/root/reference/pandabase/companda.py:40), re-expressed as a keyed
  * full-outer join + one global aggregate instead of a row-loop.
  *
  * Equal iff: column sets equal, same key set (the "index"), NaN/NULL
  * placement equal, and values equal within `epsilon` for numerics.
  */
object Companda {

  /** Per-column inequality counts plus rows-missing counts; tiny output
    * (one row per column), computed in a single pass. Columns:
    * (column_name, n_unequal). Key mismatches count as unequal in every
    * compared column. */
  def diff(df1: DataFrame, df2: DataFrame, pk: Seq[String],
           epsilon: Double = 0.001): DataFrame = {
    val shared = df1.columns.filter(df2.columns.contains).filterNot(pk.contains)
    // rename the right side to avoid self-join ambiguity when df2 derives from df1
    val l = df1.select((pk ++ shared).map(col): _*)
    val r = df2.select((pk ++ shared).map(c => col(c).as(s"__r_$c")): _*)
    val joined = l.join(r, pk.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _), "full_outer")
    val typeOf = df1.schema.fields.map(f => f.name -> f.dataType).toMap

    def colsEqual(c: String): Column = {
      val a = col(c); val b = col(s"__r_$c")
      typeOf(c) match {
        case _: NumericType => // null-safe: one-sided NULL must compare unequal
          (a.isNull && b.isNull) ||
            (a.isNotNull && b.isNotNull &&
              abs(a.cast("double") - b.cast("double")) <= lit(epsilon))
        case _ => a <=> b
      }
    }
    // a row present on only one side is a difference in every column
    val missing = pk.map(k => col(k).isNull || col(s"__r_$k").isNull).reduce(_ || _)
    val counts = shared.toIndexedSeq.map { c =>
      sum(when(missing || !colsEqual(c), 1L).otherwise(0L)).as(c)
    }
    val row = joined.agg(counts.head, counts.tail: _*)
    // unpivot the single count row to (column_name, n_unequal)
    val stackExpr = shared.map(c => s"'$c', `$c`").mkString(", ")
    row.selectExpr(s"stack(${shared.length}, $stackExpr) as (column_name, n_unequal)")
      .orderBy("column_name")
  }

  /** @param ignoreIndex positional compare (reference companda.py:46):
    *   each frame is sorted by its own index columns (`pk` for df1,
    *   `df2Pk` — default `pk` — for df2), the index columns are then
    *   IGNORED (dropped), and the remaining shared columns compare row
    *   i against row i. This is what the reference's auto-index tests
    *   use, where the synthetic PK and the original frame's index
    *   don't line up (test_sql.py:104, 841). Costs one global sort +
    *   row-numbering pass per side — inherent to positional semantics.
    */
  def apply(df1: DataFrame, df2: DataFrame, pk: Seq[String],
            epsilon: Double = 0.001,
            checkDtype: Boolean = false,
            ignoreAllNanColumns: Boolean = false,
            ignoreIndex: Boolean = false,
            df2Pk: Seq[String] = null): CompandaResult = {
    val pk2 = Option(df2Pk).getOrElse(pk)
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
    var (a, b) =
      if (ignoreIndex) {
        val (na, ca) = sortAndNumber(df1, pk)
        val (nb, cb) = sortAndNumber(df2, pk2)
        cached += ca; cached += cb
        (na, nb)
      } else (df1, df2)
    val key = if (ignoreIndex) Seq(PosCol) else pk
    if (ignoreAllNanColumns) {
      a = dropAllNullColumns(a, key); b = dropAllNullColumns(b, key)
    }
    val cols1 = a.columns.toSet; val cols2 = b.columns.toSet
    if (cols1 != cols2)
      return CompandaResult(equal = false, columnsEqual = false,
        s"Columns ${(cols1 -- cols2).toSeq.sorted} missing from df2 and " +
        s"${(cols2 -- cols1).toSeq.sorted} missing from df1")
    if (checkDtype) {
      val t1 = a.schema.fields.map(f => f.name -> f.dataType).toMap
      val bad = b.schema.fields.filter(f => t1(f.name) != f.dataType)
      if (bad.nonEmpty)
        return CompandaResult(equal = false, columnsEqual = true,
          s"datatypes not equal in columns ${bad.map(_.name).toSeq}")
    }
    val Seq(n1, n2) = Seq(a, b).map(_.count())
    if (n1 != n2)
      return CompandaResult(equal = false, columnsEqual = true,
        s"len(df1) = $n1, len(df2) = $n2")
    val d = diff(a, b, key, epsilon).filter(col("n_unequal") > 0)
      .collect().map { case Row(c: String, n: Long) => s"$c($n)" }
    if (d.nonEmpty)
      CompandaResult(equal = false, columnsEqual = true,
        s"values not equal in columns: ${d.mkString(", ")}")
    else CompandaResult(equal = true, columnsEqual = true,
      s"EQUAL, checked_dtype=$checkDtype")
    } finally cached.foreach(_.unpersist(false))
  }

  private val PosCol = "__companda_pos"

  /** Sort by the frame's own index columns, drop them, append a
    * contiguous position column. `sort` range-partitions in global
    * order, so the store's partition-offset numbering
    * ([[KeyedTable.assignAutoIndex]] — one bounded per-partition count
    * job, then offset + the local bits of monotonically_increasing_id)
    * yields positional ids fully in Tungsten: no RDD round-trip, the
    * id pass stays narrow and codegen'd.
    *
    * The sorted frame MUST be pinned before numbering: the counts job
    * and the numbering projection are separate query executions, and
    * RangePartitioner re-samples its boundaries per execution (seed
    * depends on the shuffle RDD's id), so an unpinned sort could land
    * different rows in different partitions across the two jobs —
    * duplicate/gapped position ids. Persisting substitutes one
    * InMemoryRelation into both executions; the cached RDD's lineage
    * (boundaries included) is fixed at cache time, so even an evicted
    * partition recomputes under the original partitioning. Caller
    * unpersists via the returned handle once the comparison has run. */
  private[store] def sortAndNumber(df: DataFrame, sortCols: Seq[String]): (DataFrame, DataFrame) = {
    val sorted = df.sort(sortCols.map(col): _*).drop(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (KeyedTable.assignAutoIndex(sorted, 0L, PosCol)._1, sorted)
  }

  private def dropAllNullColumns(df: DataFrame, pk: Seq[String]): DataFrame = {
    val candidates = df.columns.filterNot(pk.contains)
    if (candidates.isEmpty) return df
    val counts = df.agg(
      count(col(candidates.head)).as(candidates.head),
      candidates.tail.toIndexedSeq.map(c => count(col(c)).as(c)): _*).head()
    val drop = candidates.zipWithIndex.collect { case (c, i) if counts.getLong(i) == 0 => c }
    df.drop(drop.toIndexedSeq: _*)
  }
}
