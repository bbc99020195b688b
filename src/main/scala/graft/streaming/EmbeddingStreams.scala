package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.VectorFunctions.sqDistD
import graft.operators.Similarity

/** Streaming surface over embeddings-shaped data: the model-serving
  * half of the clustering pipeline — a batch-fitted model scores
  * unbounded arrivals, the classic "train offline, assign online"
  * split (the same batch/streaming seam as
  * [[DocumentStreams.streamedMinhashSignatures]]: scoring is a pure
  * per-row function once the model is data).
  */
object EmbeddingStreams {

  /** Streaming k-means assignment: arrivals score against the
    * batch-fitted [[Similarity.kmeansCentroids]] model, carried as
    * k·dim LITERALS in the plan (model state, not a join side — the
    * broadcast-free degenerate of a stream-static join). Each arrival
    * is one stateless per-row argmin over the literal centroid array
    * (the codegen sqDistD kernel per element, min(struct) tie-break by
    * (d, cid) — bit-identical to the batch [[Similarity.kmeansAssignOn]]
    * assignment), so the query runs APPEND mode with ZERO state rows:
    * the production shape, no watermark, no state store growth,
    * unbounded throughput. Finite replay therefore equals the batch
    * assignment, and the query shares q_kmeans' Lloyd-chain oracle
    * (minus the global size aggregate, which is a batch-side concept —
    * a streaming count per cluster would need Complete-mode state).
    */
  def streamedKmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._

    val e = graft.tables.Tables.embeddings(spark, dir)
    // k·dim Lloyd centroids: bounded MODEL state (the one legitimate
    // driver-side materialization — O(k·dim) doubles, never the corpus).
    val model = Similarity.kmeansCentroids(spark, e).collect()
    val centArr = array(model.map { r =>
      struct(lit(r.getLong(0)).as("cid"),
        array(r.getSeq[Double](1).map(lit(_)): _*).as("cent"))
    }: _*)

    // Corpus replay through the streaming FILE source — the same
    // executor-side ingest as [[DocumentStreams.streamedDocs]]; the
    // driver never holds a row, so the gate harness survives a 100×
    // embeddings table unchanged.
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val stream = spark.readStream.schema(embSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .select(col("vec_id"), col("embedding"))

    // the batch quantization verbatim: longs at 2^20, exact doubles back
    val assigned = stream
      .withColumn("xv", transform(col("embedding"),
        v => round(v.cast("double") * Similarity.KmeansScale, 0).cast("long")
          .cast("double") / Similarity.KmeansScale))
      .withColumn("m", array_min(transform(centArr,
        c => struct(sqDistD(col("xv"), c.getField("cent")).as("d"),
          c.getField("cid").as("cid")))))
      .select(col("vec_id"), col("m.cid").as("cluster"),
        round(col("m.d"), 6).as("dist"))

    StreamConf.withStatePartitions(spark, 4) {
      val q = assigned.writeStream.format("memory")
        .queryName("graft_stream_kmeans")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
    }
    spark.table("graft_stream_kmeans").orderBy(col("vec_id"))
      .localCheckpoint()
  }
}
