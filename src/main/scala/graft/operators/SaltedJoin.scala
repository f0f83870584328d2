package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins (SURVEY.md §2 #16b).
  *
  * A shuffled equi-join sends every row of a key to one reducer; a
  * single hot key (the null user, the default account, the empty
  * string) therefore serializes into one task however many executors
  * the cluster has. AQE's OptimizeSkewedJoin splits oversized
  * post-shuffle partitions, which covers sort-merge joins — but not
  * every shape (it is disabled under Structured Streaming, inapplicable
  * when the skewed side must first pass through a window/aggregate that
  * pins the partitioning, and it reacts to observed sizes rather than
  * guaranteeing a bound). Salting is the deterministic, plan-level
  * fix:
  *
  *  - the BIG (skewed) side gets a salt in [0, salts) derived from a
  *    high-cardinality disambiguator column (any per-row id; xxhash64,
  *    never a random — reruns and retries must route identically);
  *  - the SMALL side is replicated `salts` times (explode over the
  *    salt range);
  *  - the join key becomes (key, salt), so a hot key spreads over
  *    `salts` reducers, each holding a full copy of the small side's
  *    matching rows.
  *
  * Cost model: small-side shuffle volume multiplies by `salts`; the
  * big side's hottest task shrinks by the same factor. Worth it
  * exactly when |small| · salts ≪ |big-hot-key|. The result is
  * row-for-row equal to the plain join — that equality IS the oracle
  * gate (`join_salted`).
  */
object SaltedJoin {

  /** Inner equi-join of `big ⋈ small` on `bigKey = smallKey`, salted
    * `salts` ways. `disambig` names big-side column(s) whose hash
    * spreads the hot key (a row id, a line number — NOT the join key).
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      disambig: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val b = big.withColumn("_salt",
      pmod(xxhash64(disambig.map(col): _*), lit(salts)))
    // shuffled-hash, build = the salted small side (guide §3.1: beats
    // sort-merge when one side is small per partition — which the
    // small side is BY THIS OPERATOR'S CONTRACT, |small|·salts ≪
    // |big|): neither 18M-row side gets sorted, and each reducer
    // builds a |small|·salts/partitions hash table. Measured 11.5 →
    // 4.4 s at sf1. A small side too big to hash per-partition is
    // already outside the salting cost model (the replication would
    // dominate first).
    val sm = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
      .hint("shuffle_hash")
    b.join(sm, b(bigKey) === sm(smallKey) && b("_salt") === sm("_salt"))
      .drop("_salt")
  }
}
