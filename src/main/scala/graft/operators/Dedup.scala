package graft.operators

import graft.functions.TextFunctions._
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash group-by), MinHash signatures + LSH banding (near-dup), char
  * n-gram Jaccard verification, and SimHash. All hashes derive from md5
  * prefixes ([[graft.functions.TextFunctions.md5Hash32]]) so every stage
  * is reproducible in the DuckDB oracle — a deliberate trade (md5 is
  * slower than murmur3/xxhash64 but differential-testable; swap
  * `md5Hash32` for `xxhash64` in production).
  *
  * Scale design: every step is shuffle-by-key (shingle, band key, pair)
  * with partial aggregation — no driver-side collection, no quadratic
  * all-pairs. The only pair enumeration is within an LSH band bucket or
  * a shared-shingle bucket, the standard linear-ish scaling trick at
  * 100 TB corpus size.
  */
object Dedup {

  val ShingleK = 4
  val NumHashes = 8
  val Bands = 4 // 4 bands x 2 rows per band

  /** Exact dedup on normalized text: groupBy(norm) keeping the smallest
    * doc_id — one shuffle on the normalized-text key. At 100 TB,
    * group on a 128-bit content hash instead of the full text to keep
    * shuffle rows narrow; `exactDedupByHash` does exactly that.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(normalized(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Exact dedup keyed on sha256(text) — narrow shuffle key (64 hex
    * chars) instead of the document body; the form that scales.
    */
  def exactDedupByHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Distinct char-k-shingles per document, exploded: (doc_id, sh). */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(charShingles(normalized(col("text")), ShingleK)).as("sh"))
      .distinct()

  /** MinHash signature per document: NumHashes independent md5-derived
    * hash family members, min over the shingle set. Computed as one
    * explode + single groupBy(doc_id) with NumHashes min() aggregates —
    * one shuffle total, partial-agg (map-side min) does the heavy
    * lifting.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(md5Hash32Seeded(col("sh"), i)).as(s"mh$i"))
    shingles(spark, dir)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("doc_id"))
  }

  /** LSH banding: band key = (band index, hash of the band's signature
    * rows); documents sharing any band key are candidate near-dups.
    * Pair enumeration happens only within a band bucket (self-join on
    * the band key), then candidates are verified with the MinHash
    * similarity estimate. Returns pairs with estimated Jaccard ≥ 0.5.
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val rowsPerBand = NumHashes / Bands
    val bandKeyed = (0 until Bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      sig.select(col("doc_id"),
        lit(b).as("band"),
        concat_ws("_", cols: _*).as("bkey"))
    }.reduce(_ union _)
    val a = bandKeyed.as("a")
    val b = bandKeyed.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sa = sig.as("sa")
    val sb = sig.as("sb")
    val matches = (0 until NumHashes)
      .map(i => when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
      .reduce[Column](_ + _)
    cand.join(sa, col("id_a") === col("sa.doc_id"))
      .join(sb, col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(matches.cast("double") / NumHashes, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact n-gram Jaccard near-dup pairs: inverted index on shingles →
    * pair counts for documents sharing ≥1 shingle → |A∩B| / (|A|+|B|-
    * |A∩B|). The shingle-bucket self-join bounds pair enumeration to
    * co-bucketed docs. Threshold 0.4.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.as("a")
    val b = sh.as("b")
    val common = a.join(b,
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "ka").withColumnRenamed("sz", "sz_a"),
        col("id_a") === col("ka"))
      .join(sizes.withColumnRenamed("doc_id", "kb").withColumnRenamed("sz", "sz_b"),
        col("id_b") === col("kb"))
      .select(col("id_a"), col("id_b"),
        round(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash (32-bit): per token, an md5-derived 32-bit hash votes ±1
    * on each bit position weighted by token frequency; the fingerprint
    * sets bit b iff the vote sum is positive. One explode over
    * (token, bit) and a single groupBy(doc_id) — two shuffles total.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(transform(tokens(col("text")), t => lower(t))).as("tok"))
      .withColumn("h", md5Hash32(col("tok")))
    // shiftright/shiftleft with a *column* shift amount need the SQL
    // form (the Scala function API only takes a literal Int).
    val bits = toks.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("vote",
        when(expr("shiftright(h, b) % 2") === 1, 1).otherwise(-1))
    bits.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id"))
  }
}
