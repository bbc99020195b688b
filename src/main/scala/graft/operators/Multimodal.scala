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

    /** STUB resize: a real implementation re-encodes pixels to the
      * target box; the fake truncates bytes proportionally, preserving
      * the contract a resize must have — output is a new payload, no
      * bigger than the input, derived deterministically.
      */
    def resizeStub(r: MediaRecord, maxBytes: Int): MediaRecord =
      r.copy(payload = r.payload.take(maxBytes))

    /** STUB frame sampling: a real implementation decodes video and
      * emits one record per sampled frame; the fake slices the payload
      * into `n` deterministic chunks tagged by frame index — the
      * one-to-many record shape (flatMap) is the real contract.
      */
    def frameSampleStub(r: MediaRecord, n: Int): Iterator[(Long, Int, Array[Byte])] = {
      val step = math.max(r.payload.length / math.max(n, 1), 1)
      Iterator.range(0, math.min(n, r.payload.length))
        .map(i => (r.doc_id, i, r.payload.slice(i * step, i * step + step)))
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

  /** Resize + frame-sample pipeline: payload-shrinking stages run as
    * narrow per-partition maps BEFORE anything wide; the one-to-many
    * frame explosion emits (doc, frame_idx, chunk) records whose chunks
    * are immediately reduced to features. Per-format frame counts are
    * the (tiny) aggregate that shuffles.
    */
  def frameFeatures(spark: SparkSession, dir: String, frames: Int = 4): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(MediaDecoder.resizeStub(_, 4096)))
      .mapPartitions(_.flatMap(MediaDecoder.frameSampleStub(_, frames)))
      .map { case (doc, idx, chunk) => (doc, idx, chunk.length.toLong) }
      .toDF("doc_id", "frame_idx", "chunk_bytes")
      .groupBy(col("frame_idx"))
      .agg(count(lit(1)).as("n_frames"), sum(col("chunk_bytes")).as("total_bytes"))
      .orderBy(col("frame_idx"))
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
