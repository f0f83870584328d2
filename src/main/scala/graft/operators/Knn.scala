package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2 #26-27).
  */
object Knn {

  /** #26 Brute-force cosine top-k: every query row scored against every
    * corpus row. The corpus↔query product is realized as a broadcast
    * nested-loop join (queries are the small side — broadcast them),
    * then a per-query top-k window. Exact baseline; cost O(|Q|·|C|·d).
    * At 100 TB the corpus stays partition-local — only the small query
    * set moves — so this parallelizes perfectly; use [[lsh]] when |Q|
    * is also huge. Returns (query_id, neighbor_id, rank, cos).
    */
  def bruteForce(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** #27 LSH-bucketed ANN: corpus and queries are both signed with the
    * same deterministic random-hyperplane signature; candidates are
    * corpus rows whose signature is within `maxBitDiff` bits of the
    * query's (probing all masks at distance ≤1 keeps recall high while
    * touching only a few buckets). Top-k among candidates only — the
    * 1-executor-per-bucket shape IVF/LSH indexes use at scale.
    * Returns (query_id, neighbor_id, rank, cos).
    */
  def lsh(corpus: DataFrame, queries: DataFrame,
          idCol: String, vecCol: String, k: Int,
          planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneLshSignature(col(vecCol), planes).as("csig"))
    // multi-probe: each query also probes every signature at hamming
    // distance 1 (flip one bit) — planes+1 probe keys per query
    val probes = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*)
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          hyperplaneLshSignature(col(vecCol), planes).as("sig"))
        .select(col("query_id"), col("qv"),
          explode(transform(probes, m => col("sig").bitwiseXOR(m))).as("qsig"))
        .dropDuplicates("query_id", "qsig"))
    val scored = c.join(q, col("csig") === col("qsig") && col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
