package graft.operators

import graft.functions.VectorFunctions._
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (`embedding: array<float>`, 64-dim). Two paths:
  *
  *  - [[bruteForceKnn]]: exact cosine top-k — broadcast the (small)
  *    query set against the full corpus, rank per query. The baseline
  *    and the correctness oracle for the approximate path.
  *  - [[ivfKnn]]: IVF-style two-stage search — assign every vector to
  *    its nearest centroid (coarse quantizer), then search only within
  *    the probe cell(s). At 100 TB this turns an O(N·Q) scan into
  *    O(N/cells · Q) with the corpus partitioned BY cell, which is the
  *    standard billion-scale layout (cell = partition key → partition
  *    pruning on probe).
  *
  * All math via codegen'd higher-order functions (zip_with/aggregate) —
  * see [[graft.functions.VectorFunctions]].
  */
object Similarity {

  val K = 5
  val NumQueries = 10 // vec_id < 10 are the query vectors
  val NumCells = 8    // IVF coarse centroids (deterministic: vec_id < 8)

  /** Exact top-k cosine neighbors for each query vector. The query set
    * is tiny → broadcast; the corpus side never shuffles until the
    * final per-query rank (partitioned by query id). Ranking orders on
    * round(sim, 6) with an id tie-break so results are reproducible
    * across engines and partitionings.
    */
  def bruteForceKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val sims = e.select(col("vec_id").as("n_id"), col("embedding"))
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF approximate top-k: centroids are the first NumCells vectors
    * (a deterministic stand-in for k-means — the dataflow is identical:
    * broadcast centroids, argmin assignment, search within the probe
    * cell). Recall < 1.0 by construction; the scale path.
    */
  def ivfKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val centroids = e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))

    // argmin over centroids via min(struct(dist, c_id)) — one broadcast
    // join + one narrow agg per vector, no shuffle of the embedding.
    def assign(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.crossJoin(broadcast(centroids))
        .groupBy(col(idCol))
        .agg(min(struct(sqDist(col(embCol), col("c_emb")).as("d"),
          col("c_id").as("c"))).getField("c").as("cell"))

    val corpusCells = assign(e.select(col("vec_id"), col("embedding")), "vec_id", "embedding")
    val corpus = e.join(corpusCells, "vec_id")
      .select(col("vec_id").as("n_id"), col("embedding"), col("cell"))

    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qCells = assign(e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id"), col("embedding")), "vec_id", "embedding")
      .withColumnRenamed("vec_id", "q_id")
      .withColumnRenamed("cell", "q_cell")
    val queries = q.join(qCells, "q_id")

    // probe: only vectors in the query's cell are scored
    val sims = corpus.join(broadcast(queries),
        col("cell") === col("q_cell") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Array-function surface over the embedding column: size, element
    * access, subsequence stats — the scalar array ops a feature
    * pipeline leans on (all codegen'd builtins, no shuffle until the
    * final sort). Floats cast to double only at output.
    */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(aggregate(slice(col("embedding"), 1, 8),
          lit(0.0), (acc, v) => acc + v.cast("double")), 6).as("head8_sum"),
        round(array_max(col("embedding")).cast("double"), 6).as("max_val"),
        round(array_min(col("embedding")).cast("double"), 6).as("min_val"))
      .orderBy(col("vec_id"))

  /** Embedding near-duplicate pairs: cosine ≥ threshold among vectors
    * sharing a coarse cell (the IVF assignment doubles as the LSH-style
    * blocking key, keeping the pair join off the full cross product).
    */
  def embeddingDedup(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val centroids = e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val cells = e.crossJoin(broadcast(centroids))
      .groupBy(col("vec_id"))
      .agg(min(struct(sqDist(col("embedding"), col("c_emb")).as("d"),
        col("c_id").as("c"))).getField("c").as("cell"))
    val tagged = e.join(cells, "vec_id")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val a = tagged.as("a")
    val b = tagged.as("b")
    a.join(b, col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }
}
