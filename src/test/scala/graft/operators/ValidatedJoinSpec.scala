package graft.operators

import graft.SparkSpec

/** pandas merge(validate=) error contracts. */
class ValidatedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val uniq = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
  private val dup = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "w")

  test("one_to_one passes on unique keys, fails on either duplicated side") {
    assert(ValidatedJoin.merge(uniq, uniq.withColumnRenamed("v", "w"),
      Seq("k"), validate = "one_to_one").count() == 2)
    val e1 = intercept[ValidatedJoin.MergeError] {
      ValidatedJoin.merge(dup, uniq, Seq("k"), validate = "one_to_one")
    }
    assert(e1.getMessage.contains("left"))
    val e2 = intercept[ValidatedJoin.MergeError] {
      ValidatedJoin.merge(uniq, dup, Seq("k"), validate = "one_to_one")
    }
    assert(e2.getMessage.contains("right"))
  }

  test("one_to_many / many_to_one check only their unique side") {
    assert(ValidatedJoin.merge(uniq, dup, Seq("k"),
      validate = "one_to_many").count() == 3)
    intercept[ValidatedJoin.MergeError] {
      ValidatedJoin.merge(dup, uniq, Seq("k"), validate = "one_to_many")
    }
    assert(ValidatedJoin.merge(dup, uniq, Seq("k"),
      validate = "many_to_one").count() == 3)
    intercept[ValidatedJoin.MergeError] {
      ValidatedJoin.merge(uniq, dup, Seq("k"), validate = "many_to_one")
    }
  }

  test("many_to_many checks nothing; bad keyword rejected") {
    assert(ValidatedJoin.merge(dup, dup.withColumnRenamed("w", "u"),
      Seq("k"), validate = "many_to_many").count() == 5)
    intercept[IllegalArgumentException] {
      ValidatedJoin.merge(uniq, uniq.withColumnRenamed("v", "w"),
        Seq("k"), validate = "1:1")
    }
  }
}
