package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a downstream grouped aggregate from a
  * [[graft.store.KeyedTable]] change-data-capture log (#11l's consumer):
  * the read-side payoff of CDC. A derived table holding
  * `GROUP BY g → (count, sum(v))` is brought up to date by folding the
  * changelog's before/after images — never by re-reading the base table.
  *
  * Per changelog row the additive delta is
  *  - `insert`   → (new_g, +1, +new_v)
  *  - `update`   → (old_g, −1, −old_v) AND (new_g, +1, +new_v) — two
  *                 delta rows, so a row that MOVES groups debits its old
  *                 group and credits its new one
  *  - `delete`   → (old_g, −1, −old_v) — the debit alone (written by
  *                 changelog-enabled [[graft.store.KeyedTable.delete]])
  *  - `unchanged`→ nothing.
  * NULL values contribute nothing to the sum (SQL sum semantics) but
  * count as rows, exactly as a full recompute would tally them — and a
  * group holding NO non-null values sums to NULL, not 0: the fold
  * tracks the NET non-null contribution per group, which for a group
  * whose base sum is NULL/absent determines the recompute's nullness
  * EXACTLY (such a group has zero stored non-null values, so debits of
  * non-null values cannot exist against it). Without `nnCol`, one
  * residual approximation remains: a group whose base sum is non-NULL
  * and whose every non-null value is then UPDATED to NULL folds to
  * sum = 0 where a recompute yields NULL. PERSISTING the non-null
  * count in the derived table (`nnCol`) closes it: the fold then
  * maintains the count and derives the sum's nullness from it, making
  * incremental ≡ recompute in every case, including that one.
  *
  * Scale shape: cost ∝ |changelog since the snapshot| — a handful of
  * delta batches against a 100 TB base table folds through one narrow
  * union + one |groups|-sized aggregate + one join on the (tiny) derived
  * table. Sums stay DECIMAL end to end, so the incremental result is
  * bit-identical to a full recompute, not approximately equal.
  *
  * Reference concept: incremental view maintenance over the reference's
  * upsert semantics (/root/reference/pandabase/sql.py:299 upsert).
  */
object CdcConsumer {

  /** Fold changelog rows into a (groupCol → countCol, sumCol) aggregate.
    *
    * @param base  the derived aggregate at the snapshot horizon:
    *              columns (groupCol, countCol, sumCol)
    * @param log   changelog rows AFTER that horizon, as produced by
    *              [[graft.store.KeyedTable.readChangelog]]: must carry
    *              `op`, `old_<groupCol>`, `new_<groupCol>`,
    *              `old_<valueCol>`, `new_<valueCol>`
    * @param groupCol the grouping column's name in the BASE table
    * @param valueCol the summed column's name in the base table
    * @param nnCol when the derived table also persists the per-group
    *              COUNT OF NON-NULL values under this name, pass it:
    *              the fold maintains it and derives the sum's nullness
    *              exactly (see class doc). None = the base carries no
    *              such column; the NULL/absent-base rule applies.
    * @return one row per surviving group (count > 0), same column names
    *         and sum type as `base` (plus `nnCol` when given). Groups
    *         whose rows all left drop out; groups first seen in the
    *         deltas appear. NULL group keys are not supported (they
    *         would need a null-safe join).
    */
  def applyGroupedAgg(base: DataFrame, log: DataFrame, groupCol: String,
                      countCol: String, sumCol: String,
                      valueCol: String,
                      nnCol: Option[String] = None): DataFrame = {
    val sumType = base.schema(sumCol).dataType
    // values are pinned to the base aggregate's (decimal) type BEFORE the
    // sum, so delta accumulation is exact and merge-order-free — the
    // precondition for "incremental ≡ recompute" being bit-identical
    val debits = log.filter(col("op").isin("update", "delete"))
      .select(col(s"old_$groupCol").as(groupCol),
        lit(-1L).as("dn"), negate(col(s"old_$valueCol").cast(sumType)).as("dv"),
        when(col(s"old_$valueCol").isNotNull, -1L).otherwise(0L).as("_graft_dnn"))
    val credits = log.filter(col("op").isin("insert", "update"))
      .select(col(s"new_$groupCol").as(groupCol),
        lit(1L).as("dn"), col(s"new_$valueCol").cast(sumType).as("dv"),
        when(col(s"new_$valueCol").isNotNull, 1L).otherwise(0L).as("_graft_dnn"))
    val deltas = debits.unionByName(credits)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"),
        sum(col("_graft_dnn")).as("_graft_dnn"))
    val joined = base.join(deltas, Seq(groupCol), "full_outer")
    val summed =
      (coalesce(col(sumCol).cast(sumType), lit(0).cast(sumType)) +
        coalesce(col("dv").cast(sumType), lit(0).cast(sumType)))
        .cast(sumType)
    nnCol match {
      case Some(nc) =>
        // the persisted non-null count makes nullness EXACT everywhere:
        // sum is NULL iff the group now holds zero non-null values
        val nnTotal = coalesce(col(nc), lit(0L)) + coalesce(col("_graft_dnn"), lit(0L))
        joined.select(col(groupCol),
          (coalesce(col(countCol), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as(countCol),
          when(nnTotal === 0L, lit(null).cast(sumType))
            .otherwise(summed).as(sumCol),
          nnTotal.as(nc))
          .filter(col(countCol) > 0)
      case None =>
        joined.select(col(groupCol),
          (coalesce(col(countCol), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as(countCol),
          // a base-NULL/absent group stores zero non-null values, so
          // its recomputed sum is NULL exactly when the deltas' net
          // non-null contribution is zero too (see scaladoc)
          when(col(sumCol).isNull && coalesce(col("_graft_dnn"), lit(0L)) === 0L,
            lit(null).cast(sumType))
            .otherwise(summed).as(sumCol))
          .filter(col(countCol) > 0)
    }
  }
}
