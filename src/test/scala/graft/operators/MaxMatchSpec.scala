package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.maxMatchTokens

/** Contract specs for the greedy maximum-match tokenizer (#30ae). */
class MaxMatchSpec extends SparkSpec {

  import spark.implicits._

  private def tok(text: String, vocab: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(maxMatchTokens(col("t"), vocab).as("x"))
      .as[Seq[String]].head()

  test("longest prefix wins; fallback chars; <unk> advances one char") {
    val vocab = Seq("ab", "abc", "c", "d", "b", "a")
    assert(tok("abcd", vocab) == Seq("abc", "d"), "greedy longest, not first")
    assert(tok("abab", vocab) == Seq("ab", "ab"))
    assert(tok("xba", vocab) == Seq("<unk>", "b", "a"))
    assert(tok("abc xd", vocab) == Seq("abc", "<unk>", "d"),
      "spaces delimit words and are never tokens")
  }

  test("greedy is not optimal — the documented MaxMatch property") {
    // optimal segmentation of "abc" with this vocab is [ab, c] (2
    // tokens never beats 2 tokens — use a case where greedy loses):
    // vocab {aa, aab-less}: "aab" -> greedy [aa, <unk>] vs optimal [a, ab]
    val vocab = Seq("aa", "a", "ab")
    assert(tok("aab", vocab) == Seq("aa", "b").map(t => if (t == "b") "<unk>" else t))
  }

  test("interpreted eval matches codegen over the corpus") {
    val docs = graft.Tables.documents(spark, sfDir).limit(100)
    val vocab = Seq("merge", "join", "the", "a", "e", "r", "t") ++
      ('a' to 'z').map(_.toString)
    val viaExpr = docs.select(col("doc_id"),
        maxMatchTokens(col("text"), vocab.distinct).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    // reference reimplementation in plain Scala
    val vset = vocab.distinct.toSet
    val maxLen = vocab.map(_.length).max
    def ref(text: String): Seq[String] =
      text.split(" ", -1).toSeq.flatMap { w =>
        val out = scala.collection.mutable.Buffer[String]()
        var pos = 0
        while (pos < w.length) {
          val lim = math.min(maxLen, w.length - pos)
          (lim to 1 by -1).find(l => vset(w.substring(pos, pos + l))) match {
            case Some(l) => out += w.substring(pos, pos + l); pos += l
            case None => out += "<unk>"; pos += 1
          }
        }
        out.toSeq
      }
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      assert(viaExpr(id) == ref(t), s"doc $id segmentation mismatch")
    }
  }
}
