package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pattern: media (image/audio/video) carried as an
  * opaque `binary` payload column with a typed metadata struct, decoded
  * / feature-extracted per partition in batches. The Spark-side plumbing
  * — schema, partition-wise batching, typed record shape — is real;
  * the actual codec call is STUBBED (deterministic fake) because no
  * image/audio libraries ship in this container. Swap
  * [[MediaDecoder.decodeStub]] for a real JNI/library call without
  * touching the dataflow.
  *
  * Scale notes: payloads never participate in a shuffle here — decode is
  * a narrow mapPartitions directly over the scan, features (small) are
  * all that flows downstream. At 100 TB of media that separation (wide
  * ops on features only) is the whole game.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      payload: Array[Byte],
      format: String,
      source: String)

  /** Extracted features — what downstream (dedup, search) consumes. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      feature: Long)

  object MediaDecoder {
    /** STUB: a real implementation would decode the payload (JPEG →
      * pixels, WAV → samples) and run feature extraction. The fake is
      * deterministic and cheap: byte length and a trivial byte-derived
      * "feature" so the pipeline is differentially testable end-to-end.
      */
    def decodeStub(r: MediaRecord): MediaFeatures = {
      val first = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else 0L
      MediaFeatures(r.doc_id, r.payload.length.toLong, r.format,
        r.payload.length.toLong * 31L + first)
    }
  }

  /** Build the multimodal table from documents: text bytes stand in for
    * the media payload (binary column), lang for the container format.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        col("lang").as("format"),
        col("source"))
      .as[MediaRecord]
  }

  /** Decode + featurize partition-wise (the batch seam where a real
    * decoder would amortize per-batch setup), then aggregate features
    * per format — the narrow→wide split described above.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(MediaDecoder.decodeStub))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"), col("feature"))
      .orderBy(col("doc_id"))
  }

  /** Per-format feature rollup (features only — payloads were dropped
    * before this shuffle).
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(MediaDecoder.decodeStub))
      .toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("feature")).as("min_feature"))
      .orderBy(col("format"))
  }
}
