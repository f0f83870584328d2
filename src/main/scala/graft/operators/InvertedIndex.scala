package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search (SURVEY.md §2
  * #30y) — the retrieval primitive behind contamination audits
  * ("which training docs contain this eval sentence verbatim?") and
  * corpus concordance queries.
  *
  * The index is the classic positional-postings relation
  * (token, doc_id, pos). A phrase query touches only the postings of
  * the phrase's own tokens — each `filter(tok = w)` prunes at the
  * scan (predicate pushdown; in a production deployment the postings
  * live in a keyed table bucketed BY TOKEN, so each lookup is a
  * bucket-pruned read, not a corpus scan). Adjacency is m−1 equi-joins
  * on (doc_id, pos − offset): shuffle keys are (doc, position) pairs
  * of MATCHING tokens only, so cost scales with the posting-list
  * lengths of the query tokens — the inverted-index contract — never
  * with corpus size.
  */
object InvertedIndex {

  /** The positional postings relation: one row per token occurrence.
    * Build once, write to a keyed table bucketed by token; all
    * searches below are joins against it. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))

  /** Exact phrase search: docs containing `phrase` as consecutive
    * tokens. Returns (doc_id, n_matches, first_pos) — one row per
    * matching doc, positions 0-based; counts overlapping occurrences
    * (position semantics, not substring-replace semantics). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val p = postings(docs, idCol, textCol)
    val first = p.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(p.filter(col("tok") === w)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("pos")).cast("long").as("first_pos"))
  }
}
