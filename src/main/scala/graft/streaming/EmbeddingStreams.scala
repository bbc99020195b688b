package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Streaming delta-SemDeDup — the SERVING shape of the incremental
    * semantic-dedup family ([[Similarity.deltaSemDedup]]'s twin, the
    * q_stream_image_neardup_delta discipline on embeddings): new
    * vectors stream in, are assigned statelessly against the stored
    * centroid LITERALS (the [[streamedKmeansAssign]] kernel), and each
    * arrival is adjudicated against the FROZEN stored decision table
    * through one stream-STATIC equi-join on its cluster — APPEND mode,
    * ZERO state rows, no watermark; the decision against a frozen
    * store is a pure per-row function, so output is independent of
    * micro-batch boundaries.
    *
    * At serving each arrival is its own batch of one, so there are no
    * intra-batch pairs to adjudicate: rank counts STORED members above
    * (1 + |stored above|) and `kept` drops on a cosine hit against a
    * stored member ranked above — the batch delta operator's
    * vs-stored half exactly (its batch-internal terms vanish at batch
    * size 1). The static side pre-aggregates each cluster's members
    * into ONE array row (collect_list of (dist, vec_id, embedding) —
    * bounded by design: k is the SemDeDup scale knob, production sizes
    * per-cluster occupancy to target_cluster_size), so the join is
    * row-to-row and the per-arrival scan is a higher-order fold over
    * its own cluster's members, never a shuffle. Finite replay is
    * re-derived end-to-end by the DuckDB oracle (the delta chain with
    * the comparison side restricted to base).
    */
  def streamedDeltaSemDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    import graft.functions.VectorFunctions.cosine

    val (centsDf, storedBase, b) = Similarity.semdedupStoredState(spark, dir)
    // k·dim fitted centroids as plan literals (bounded model state)
    val model = centsDf.collect()
    val centArr = array(model.map { r =>
      struct(lit(r.getLong(0)).as("cid"),
        array(r.getSeq[Double](1).map(lit(_)): _*).as("cent"))
    }: _*)
    // static side: one row per cluster holding its frozen members
    // (dist, vec_id, embedding) — the sort is presentation-stable only;
    // the fold below is order-independent (count + exists)
    val members = storedBase
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(sort_array(collect_list(struct(col("dist"), col("vec_id"),
        col("embedding")))).as("ms"))

    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val stream = spark.readStream.schema(embSchema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .filter(col("vec_id") >= b)
      .select(col("vec_id"), col("embedding"))

    // the batch assignment verbatim (quantize → literal-centroid argmin)
    val assigned = stream
      .withColumn("xv", transform(col("embedding"),
        v => round(v.cast("double") * Similarity.KmeansScale, 0).cast("long")
          .cast("double") / Similarity.KmeansScale))
      .withColumn("m", array_min(transform(centArr,
        c => struct(sqDistD(col("xv"), c.getField("cent")).as("d"),
          c.getField("cid").as("cid")))))
      .select(col("vec_id"), col("embedding"),
        col("m.cid").as("cluster"), round(col("m.d"), 6).as("dist"))

    // `stored member above this arrival` in the SemDeDup order
    def above(m: Column): Column =
      (m.getField("dist") > col("dist")) ||
        (m.getField("dist") === col("dist") &&
          m.getField("vec_id") < col("vec_id"))
    val ms = coalesce(col("ms"),
      array().cast("array<struct<dist:double,vec_id:bigint,embedding:array<float>>>"))
    val decided = assigned
      .join(members, Seq("cluster"), "left")
      .select(col("vec_id"), col("cluster"),
        (lit(1L) + size(filter(ms, m => above(m))).cast("long")).as("rank"),
        when(exists(ms, m => above(m) &&
            round(cosine(m.getField("embedding"), col("embedding")), 6)
              >= threshold), 0L)
          .otherwise(1L).as("kept"))

    StreamConf.withStatePartitions(spark, 4) {
      val q = decided.writeStream.format("memory")
        .queryName("graft_stream_semdedup_delta")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
    }
    spark.table("graft_stream_semdedup_delta").orderBy(col("vec_id"))
      .localCheckpoint()
  }
}
