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

  val ShingleK = 8 // Broder-style char shingles; k=8 keeps 4-gram-level
                   // stopword collisions out of the index (df skew kills
                   // the candidate join at corpus scale with small k)
  val NumHashes = 8
  val Bands = 4 // 4 bands x 2 rows per band

  /** Universal-hash family for MinHash: mh_i = min((A(i)·h + B(i)) mod P)
    * over the shingle set, where h = md5Hash32(shingle) is computed ONCE
    * per shingle (instead of NumHashes md5 invocations — md5 is the
    * expensive part; the affine members are three long ops each).
    * P is the smallest prime > 2^32; A(i) < 2^31 keeps A·h + B below
    * 2^63 so the identical arithmetic is expressible in DuckDB BIGINTs.
    */
  val HashP = 4294967311L
  val HashA: IndexedSeq[Long] = IndexedSeq(
    1926125219L, 1209881391L, 1813258661L, 1610612741L,
    805306457L, 402653189L, 201326611L, 100663319L)
  val HashB: IndexedSeq[Long] = IndexedSeq(
    7L, 2147483629L, 1073741827L, 536870923L,
    268435459L, 134217757L, 67108879L, 33554467L)

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

  /** MinHash signature per document: one md5 per shingle, then NumHashes
    * affine family members min'd in a single groupBy(doc_id) — one
    * shuffle total, partial-agg (map-side min) does the heavy lifting.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(pmod(lit(HashA(i)) * col("h") + lit(HashB(i)), lit(HashP))).as(s"mh$i"))
    shingles(spark, dir)
      .withColumn("h", md5Hash32(col("sh")))
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
    // The signature table feeds three branches (band keys + both sides of
    // the verification join); without a cache Spark recomputes the whole
    // shingle→md5→agg pipeline per branch. It is tiny (docs × 9 longs).
    val sig = minhashSignatures(spark, dir).cache()
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

  /** Exact n-gram Jaccard near-dup pairs with PPJoin-style prefix
    * filtering (Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07; see
    * also the all-pairs join in Xiao et al. "Efficient Similarity Joins
    * for Near Duplicate Detection"). A naive inverted-index self-join on
    * shingles explodes quadratically on hot shingles (a 4-gram present
    * in most documents yields |docs|²/2 pairs by itself — the scan that
    * kills the query at corpus scale). Instead:
    *
    *  1. order each document's shingle set canonically by ascending
    *     document frequency (rarest first, tie-break on the shingle);
    *  2. index only the PREFIX of length |S| - ceil(t·|S|) + 1 — the
    *     classic lemma: Jaccard(A,B) ≥ t implies |A∩B| ≥ t·|A|, so two
    *     qualifying sets must collide within these prefixes;
    *  3. verify every candidate pair exactly with a sorted-array
    *     intersection (`array_intersect`) — no estimate, same result set
    *     as the naive plan.
    *
    * The hot shingles land at the END of the canonical order and never
    * enter the index, so candidate buckets stay small. Threshold 0.4.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.TextShingleExpressions.{shingleHashSetCol, sortedIntersectSizeCol}
    val threshold = 0.4
    // One codegen'd pass per document builds its shingle set as a SORTED
    // array of 64-bit hashes — set algebra becomes a primitive merge walk
    // (collision odds ~|vocab|²/2^65; the string-level oracle checks the
    // end-to-end values differentially).
    val docSets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        shingleHashSetCol(normalized(col("text")), ShingleK).as("set"))
      .withColumn("sz", size(col("set")).cast("long"))
      .cache() // reused: prefix index + both sides of verification
    val exploded = docSets.select(col("doc_id"), col("sz"), explode(col("set")).as("h"))
    val dfreq = exploded.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Canonical per-doc order: rarest shingle first; index only the
    // prefix of length |S| - ceil(t·|S|) + 1 (J ≥ t ⇒ |A∩B| ≥ t·|A| ⇒
    // qualifying pairs must collide inside these prefixes).
    val prefixes = exploded.join(dfreq, "h")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
      .filter(col("pos") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select(col("doc_id"), col("h"), col("pos"), col("sz"))
      .cache() // both sides of the candidate self-join read this
    // Candidate enumeration with the published prune conditions: shared
    // prefix token, length filter (t·max(|A|,|B|) ≤ min(|A|,|B|)), and
    // the positional filter (suffix lengths bound best-case overlap
    // below α = ceil(t/(1+t)·(|A|+|B|))). All provably lossless for the
    // exact verification that follows.
    val szA = col("a.sz"); val szB = col("b.sz")
    val maxOverlap = least(szA - col("a.pos"), szB - col("b.pos")) + 1
    val alpha = ceil((szA + szB) * (threshold / (1 + threshold)))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        greatest(szA, szB) * threshold <= least(szA, szB) &&
        maxOverlap >= alpha)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val n_common = sortedIntersectSizeCol(col("set_a"), col("set_b"))
    cand
      .join(docSets.select(col("doc_id").as("id_a"),
        col("set").as("set_a"), col("sz").as("sz_a")), "id_a")
      .join(docSets.select(col("doc_id").as("id_b"),
        col("set").as("set_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(n_common.cast("double") /
          (col("sz_a") + col("sz_b") - n_common), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Duplicate clusters: connected components over the LSH near-dup
    * pair graph, via min-label propagation — each node repeatedly
    * adopts the smallest label among itself and its neighbors until
    * fixpoint (≤ graph-diameter iterations; each iteration is one
    * shuffle-join, the standard large-graph CC dataflow). The driver
    * loop is control flow only — labels never leave the cluster. A
    * dedup pipeline keeps min(doc_id) per cluster and drops the rest.
    */
  def duplicateClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(spark, dir).select(col("id_a"), col("id_b"))
    // Undirected edge list (both directions) PLUS a self-loop per node,
    // so neighbor-min below needs no per-iteration union (self-loop
    // carries each node's own label into the min). All unions happen
    // here, on unckeckpointed lineage. localCheckpoint TRUNCATES
    // lineage — without it each iteration's self-join doubles the plan
    // until planning itself blows up (the classic iterative-DataFrame
    // failure mode).
    val rawEdges = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
    val nodes = rawEdges.select(col("src").as("id")).distinct()
    val edges = rawEdges
      .union(nodes.select(col("id").as("src"), col("id").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < 20) {
      // (a) neighbor-min: adopt the smallest label in the neighborhood
      // (self-loops make each node its own neighbor). Not checkpointed:
      // its lineage is bounded by the checkpointed labels, and the
      // double evaluation in (b) is cheaper than a materialization job.
      val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("lbl")).as("lbl"))
      // (b) pointer jump (path halving): adopt the label OF the label —
      // collapses an L-long chain in O(log L) rounds instead of O(L)
      val next = nbrMin.as("n")
        .join(nbrMin.select(col("id").as("p_id"), col("lbl").as("p_lbl")).as("p"),
          col("n.lbl") === col("p_id"), "left")
        .select(col("n.id").as("id"),
          least(col("n.lbl"), coalesce(col("p_lbl"), col("n.lbl"))).as("lbl"))
        .localCheckpoint()
      iters += 1
      // convergence check every other round — halving converges in a
      // handful of rounds; the count job is half the per-round cost
      if (iters % 2 == 0 || iters >= 20)
        changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
          .filter(col("lbl") =!= col("old")).count()
      labels = next
    }
    labels.groupBy(col("lbl").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster_rep"))
  }

  /** Deterministic hash split: route every document to train/val/test
    * by its content hash (md5-derived, engine-portable) — the standard
    * leakage-free held-out split of a training-data pipeline: the
    * assignment is a pure function of content, so re-runs, re-shards,
    * and incremental ingests never move a document across splits.
    * 80/10/10 by hash mod 10.
    */
  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(md5Hash32(col("text")), lit(10))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("split"))
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
