package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus ingestion from the wire formats LLM-data pipelines actually
  * receive (SURVEY.md §2 #36): JSONL (one JSON doc per line — the
  * standard crawl/corpus interchange) and CSV, both read with an
  * EXPLICIT schema (schema inference is a full extra pass over 100 TB
  * — never pay it) and PERMISSIVE corrupt-record capture so one bad
  * line quarantines instead of failing the job or silently vanishing.
  *
  * Both readers are plain `spark.read` — splittable, predicate/column
  * pruned where the format allows, and scale with the file count. The
  * quarantine column rides the scan; [[split]] separates clean rows
  * from quarantined ones without a second read.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, org.apache.spark.sql.types.StringType, nullable = true)

  /** JSON-lines reader: explicit schema + corrupt-line quarantine. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV reader: explicit schema, header expected, corrupt-line
    * quarantine. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "true")
      .csv(path)

  /** (clean rows without the quarantine column, quarantined rows as
    * `raw_line` + the partially-parsed columns).
    *
    * The quarantine side deliberately keeps the parsed columns next to
    * `raw_line`: Spark refuses file scans whose only referenced column
    * is the corrupt-record column (analysis-time restriction), and a
    * raw_line-only projection would prune to exactly that. Consumers
    * that want just the raw lines should materialize first (cache or
    * write), per Spark's own guidance — bad lines are a vanishing
    * fraction of a healthy corpus, so that set is tiny. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    // the checkpoint is the materialization boundary Spark's guidance
    // asks for: it scans the file once WITH the data columns (allowed)
    // and truncates lineage, so no downstream consumer of the
    // quarantine — however it projects — can prune back to the
    // corrupt-only file scan Spark refuses (CSV's parser pruning
    // defeats a lazy cache boundary here). Bad lines are a vanishing
    // fraction of a healthy corpus, so the materialized set is tiny;
    // the one eager scan is the price of a quarantine you can always
    // inspect. The clean side stays a pure lazy scan — with one Spark
    // caveat that can't be papered over lazily: a bare count() on it
    // references no data column, prunes to a corrupt-only scan, and
    // Spark refuses that; count a data column instead.
    val bad = df.filter(col(CorruptCol).isNotNull)
      .select((col(CorruptCol).as("raw_line") +: df.columns
        .filterNot(_ == CorruptCol).map(col).toSeq): _*)
      .localCheckpoint()
    (df.filter(col(CorruptCol).isNull).drop(CorruptCol), bad)
  }
}
