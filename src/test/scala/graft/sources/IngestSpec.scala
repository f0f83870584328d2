package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** SURVEY.md §2 #36: wire-format ingestion quarantines bad lines
  * instead of failing or dropping them. */
class IngestSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("jsonl: clean lines parse, malformed lines quarantine with the raw text") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      java.util.Arrays.asList(
        """{"id": 1, "text": "hello world"}""",
        """{"id": 2 BROKEN""",
        """{"id": 3, "text": "ok"}"""))
    val (clean, bad) = Ingest.split(Ingest.jsonl(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toSet ==
      Set((1L, "hello world"), (3L, "ok")))
    assert(bad.select("raw_line").collect().map(_.getString(0)).toSeq ==
      Seq("""{"id": 2 BROKEN"""))
  }

  test("csv: malformed rows quarantine; clean roundtrip has an empty quarantine") {
    val dir = Files.createTempDirectory("graft-ingest-csv").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.csv"),
      java.util.Arrays.asList(
        "id,text",
        "1,hello",
        "not_a_long,world",
        "3,ok"))
    val (clean, bad) = Ingest.split(Ingest.csv(spark, dir, schema))
    assert(clean.as[(Long, String)].collect().toSet == Set((1L, "hello"), (3L, "ok")))
    assert(bad.select("raw_line").collect().map(_.getString(0)).toSeq ==
      Seq("not_a_long,world"))

    // clean roundtrip of a real frame → nothing quarantined
    val out = Files.createTempDirectory("graft-ingest-rt").toString
    val docs = graft.Tables.documents(spark, sfDir)
    docs.write.mode("overwrite").option("header", "true").csv(out)
    val (c2, b2) = Ingest.split(Ingest.csv(spark, out, docs.schema))
    assert(b2.count() == 0)
    // count via a data column: a bare count() over the clean side
    // prunes to a corrupt-only scan, which Spark refuses (see
    // Ingest.split scaladoc)
    assert(c2.select("doc_id").collect().length == docs.count())
  }
}
