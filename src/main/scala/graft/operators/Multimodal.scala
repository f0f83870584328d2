package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column pipeline (SURVEY.md §2 #28).
  *
  * Media assets are opaque `binary` columns plus a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as a partition-
  * batched `mapPartitions` pass (the Scala analogue of `mapInPandas`):
  * one decoder instance per partition, rows streamed through it, no
  * driver involvement — at 100 TB each executor decodes only its own
  * partitions. The actual codec is pluggable; this container has no
  * image/audio libs, so [[StubDecoder]] derives deterministic fake
  * features from the payload's MD5 (making the whole pipeline oracle-
  * checkable end-to-end while keeping schema/partitioning/batch plumbing
  * real).
  */
object Multimodal {

  /** What a decoder extracts from one asset. */
  final case class MediaFeatures(width: Long, height: Long, nFrames: Long,
                                 contentMd5: String)

  /** Pluggable per-partition decoder. Implementations may hold native
    * resources; one instance is created per partition (not per row). */
  trait Decoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a real codec: features derived from the
    * payload MD5. Replace with a real image/audio decoder in production. */
  object StubDecoder extends Decoder {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      def hexAt(from: Int, len: Int): Long =
        java.lang.Long.parseLong(hex.substring(from, from + len), 16)
      MediaFeatures(
        width = hexAt(0, 4) % 1280 + 1,
        height = hexAt(4, 4) % 720 + 1,
        nFrames = if (mediaType == "video") hexAt(8, 2) % 60 + 1 else 1L,
        contentMd5 = hex)
    }
  }

  /** Attach an opaque binary payload + typed metadata to a text corpus
    * (stand-in for reading real media files alongside a metadata table). */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast(BinaryType).as("payload"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      struct(
        length(col(textCol).cast(BinaryType)).cast(LongType).as("byte_len"),
        lit("utf-8").as("encoding")).as("meta"))

  private val featSchema = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_frames", LongType), StructField("content_md5", StringType)))

  /** Partition-batched decode: one Decoder per partition, features
    * appended as columns. Narrow transform — no shuffle. */
  def decodeFeatures(df: DataFrame, decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ featSchema.fields)
    val payloadIx = df.schema.fieldIndex("payload")
    val typeIx = df.schema.fieldIndex("media_type")
    df.mapPartitions { rows =>
      rows.map { r =>
        val f = decoder.decode(r.getString(typeIx),
                               r.getAs[Array[Byte]](payloadIx))
        Row.fromSeq(r.toSeq ++ Seq(f.width, f.height, f.nFrames, f.contentMd5))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Aspect-preserving resize into a bounding box (pure column math). */
  def withResize(df: DataFrame, boxW: Int, boxH: Int): DataFrame = {
    val scale = least(lit(boxW.toDouble) / col("width"),
                      lit(boxH.toDouble) / col("height"), lit(1.0))
    df.withColumn("resized_w", greatest(floor(col("width") * scale), lit(1L)))
      .withColumn("resized_h", greatest(floor(col("height") * scale), lit(1L)))
  }

  /** Uniform frame sampling: every `step`-th frame, as summary stats
    * (count + last sampled index) to stay hash-stable across engines. */
  def withFrameSample(df: DataFrame, step: Int): DataFrame =
    df.withColumn("n_sampled",
        (floor((col("n_frames") - 1) / step) + 1).cast(LongType))
      .withColumn("last_frame",
        (col("n_sampled") - 1) * step)

  /** The full #28 pipeline over the documents table. */
  def pipeline(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val decoded = decodeFeatures(withPayload(docs, idCol, textCol))
    withFrameSample(withResize(decoded, 256, 256), step = 10)
      .select(col(idCol), col("media_type"), col("meta.byte_len").as("byte_len"),
        col("content_md5"), col("width"), col("height"), col("n_frames"),
        col("resized_w"), col("resized_h"), col("n_sampled"), col("last_frame"))
  }

  /** #28c ViT-style patch grid: each image explodes into its
    * ⌈w/p⌉×⌈h/p⌉ grid of patch rows over the RESIZED dims — the
    * row-fanout stage that feeds patch embedding. Edge patches
    * (partial at the right/bottom) are included, as ViT pads them. The
    * per-patch feature is the deterministic stub hash (no image libs
    * in-container); the Spark plumbing — grid arithmetic, double
    * explode, per-patch keys — is the real, tested part. Fan-out is
    * bounded by (target/p)² per image, so the stage is a pure narrow
    * map — no shuffle. */
  def patchGrid(pipelineOut: DataFrame, patch: Int = 32): DataFrame =
    pipelineOut
      .filter(col("media_type") === "image")
      .withColumn("nx", floor((col("resized_w") + patch - 1) / patch))
      .withColumn("ny", floor((col("resized_h") + patch - 1) / patch))
      // defensive: sequence(0, -1) is a DESCENDING [0,-1], not empty —
      // a zero/negative dim (upstream resize guarantees ≥1, but this
      // operator must not rely on it) would fabricate patches
      .filter(col("nx") > 0 && col("ny") > 0)
      .select(col("doc_id"), col("nx"), col("ny"),
        col("content_md5"),
        explode(sequence(lit(0L), col("nx") - 1)).as("px"))
      .select(col("doc_id"), col("nx"), col("ny"), col("content_md5"), col("px"),
        explode(sequence(lit(0L), col("ny") - 1)).as("py"))
      .select(col("doc_id"), col("px"), col("py"),
        md5(concat(col("content_md5"), lit(":"),
          col("px").cast("string"), lit(":"), col("py").cast("string")))
          .as("patch_md5"))
}
