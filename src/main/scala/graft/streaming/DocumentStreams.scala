package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Streaming surface over documents-shaped data: incremental ingest of
  * an unbounded corpus drop directory, computing near-dup state
  * (MinHash signatures) AS DOCUMENTS ARRIVE instead of re-running the
  * batch pipeline per drop — the ingestion front half of a streaming
  * dedup pipeline (signatures land incrementally; band-bucket joins
  * against the accumulated signature store happen downstream).
  */
object DocumentStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Incremental MinHash ingest under the driver gate: the SAME
    * signature dataflow as the batch operator
    * ([[graft.operators.Dedup.minhashSignaturesUnsorted]] — shingle
    * explode + hash are stateless per row; the 64-member min is
    * per-document aggregation state) executed as a real StreamingQuery
    * over the streaming file source, UPDATE mode → memory sink.
    *
    * Every shingle of a document rides the document's own row, so each
    * document's group is updated in exactly one micro-batch and Update
    * mode emits exactly one final row per document — which is why a
    * finite replay reproduces the batch operator bit-for-bit and the
    * query shares q_minhash_signatures' DuckDB oracle (the stronger
    * gate than rows-only). On an unbounded corpus the state store holds
    * one 64-long vector per document seen in the current watermark
    * horizon; signatures stream out to the band-bucket store as they
    * finalize.
    */
  def streamedMinhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), col("text"))
    val sig = graft.operators.Dedup.minhashSignaturesUnsorted(docs, prodHash = false)
    // same state-partition sizing note as EventStreams.streamedTumbling
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = sig.writeStream.format("memory")
        .queryName("graft_stream_minhash")
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.table("graft_stream_minhash").orderBy(col("doc_id"))
  }
}
