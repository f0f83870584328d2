package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pandas `merge(validate=...)` parity: fail fast when a join's key
  * cardinality contract is violated (the bug class where an unexpected
  * duplicate key silently fans out a join and doubles downstream
  * aggregates — at 100 TB the fanout is also a cost explosion, so the
  * cheap pre-check pays for itself).
  *
  * The uniqueness probe is distributed and bounded: group-count the
  * key columns, keep rows with count > 1, `limit(1)` — the job short-
  * circuits on the first duplicate found and ships at most one row to
  * the driver. Mirrors pandas' MergeError contract
  * (pandas.core.reshape.merge `_validate_validate_kwd`).
  */
object ValidatedJoin {

  final class MergeError(msg: String) extends RuntimeException(msg)

  /** Inner/left/right/outer equi-join on `on` with a pandas-style
    * `validate` contract: "one_to_one" | "one_to_many" | "many_to_one"
    * | "many_to_many" (the last checks nothing, like pandas). */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String],
            how: String = "inner",
            validate: String = "many_to_many"): DataFrame = {
    def hasDup(df: DataFrame): Boolean =
      df.groupBy(on.map(col): _*).count()
        .filter(col("count") > 1).limit(1).head(1).nonEmpty
    validate match {
      case "one_to_one" =>
        if (hasDup(left))
          throw new MergeError(
            "Merge keys are not unique in left dataset; not a one-to-one merge")
        if (hasDup(right))
          throw new MergeError(
            "Merge keys are not unique in right dataset; not a one-to-one merge")
      case "one_to_many" =>
        if (hasDup(left))
          throw new MergeError(
            "Merge keys are not unique in left dataset; not a one-to-many merge")
      case "many_to_one" =>
        if (hasDup(right))
          throw new MergeError(
            "Merge keys are not unique in right dataset; not a many-to-one merge")
      case "many_to_many" => ()
      case other =>
        throw new IllegalArgumentException(s"invalid validate: $other")
    }
    left.join(right, on, how)
  }
}
