package graft.operators

import graft.functions.VectorFunctions._
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (`embedding: array<float>`, 64-dim). Two paths:
  *
  *  - [[bruteForceKnn]]: exact cosine top-k — broadcast the (small)
  *    query set against the full corpus, rank per query. The baseline
  *    and the correctness oracle for the approximate path.
  *  - [[ivfKnn]]: IVF two-stage search — deterministic fixed-point
  *    Lloyd coarse quantizer (cells ~√N), multi-probe within the
  *    nearest cells. At
  *    100 TB this turns an O(N·Q) scan into O(probes·N/cells · Q) with
  *    the corpus partitioned BY cell, which is the standard
  *    billion-scale layout (cell = partition key → partition pruning
  *    on probe).
  *
  * All vector math runs in native codegen expressions (fused
  * primitive loops, no boxing) — see
  * [[org.apache.spark.sql.graft.ArrayMathExpressions]];
  * [[graft.functions.VectorFunctions]] explains why the higher-order
  * builtins were abandoned for the hot path.
  */
object Similarity {

  val K = 5
  val NumQueries = 10 // vec_id < 10 are the query vectors

  /** Coarse-cell count for [[embeddingDedup]]'s blocking key: ~√N,
    * mirroring [[ivfKnn]]'s IVF sizing, so the expected within-cell
    * population is ~√N and the blocked self-join does Σ C(n_cell, 2) ≈
    * N·√N/2 work instead of the quadratic N²/(2·cells) a FIXED cell
    * count degrades to once N outgrows it (the round-4 scale flaw: 8
    * pinned cells meant N²/16 pair comparisons at any corpus size).
    * Deterministic — pure function of the corpus count — so the DuckDB
    * oracle derives the identical value from `count(*)`.
    */
  def dedupCells(n: Long): Int = math.max(4, math.sqrt(n.toDouble).toInt)

  /** Exact top-k cosine neighbors for each query vector. The query set
    * is tiny → broadcast; the corpus side never shuffles until the
    * final per-query rank (partitioned by query id). Ranking orders on
    * round(sim, 6) with an id tie-break so results are reproducible
    * across engines and partitionings.
    */
  def bruteForceKnn(spark: SparkSession, dir: String): DataFrame =
    bruteForceKnnOn(spark, Tables.embeddings(spark, dir))

  def bruteForceKnnOn(spark: SparkSession, e: DataFrame): DataFrame = {
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

  /** Contrastive hard-negative mining: for each query (anchor) vector,
    * the top-[[K]] most-similar corpus vectors carrying a DIFFERENT
    * label — the "hard negatives" a contrastive embedding trainer
    * pairs with each anchor (highest-loss negatives: close in the
    * space, wrong by the labels). Same broadcast-the-anchors shape as
    * [[bruteForceKnnOn]], but per-anchor selection runs through the
    * bounded top-K AGGREGATOR rather than a rank window: anchors are
    * few and each candidate set is corpus-sized, so an anchor-
    * partitioned window would serialize the corpus through |Q| tasks
    * while the aggregator ships ≤K rows per partition per anchor
    * map-side (the BM25/stratified-sample lesson). Labels for the ≤
    * Q·K selected ids come back via one broadcast join — never a
    * second corpus shuffle.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegativesOn(spark, Tables.embeddings(spark, dir))

  def hardNegativesOn(spark: SparkSession, e: DataFrame): DataFrame = {
    import graft.functions.TypedAggregators.topKSelect
    val anchors = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    // round(sim, 6) BEFORE selection so ranking (and its n_id
    // tie-break) is reproducible across engines, as in bruteForceKnn
    val sims = e.select(col("vec_id").as("n_id"), col("label"), col("embedding"))
      .join(broadcast(anchors), col("q_label") =!= col("label"))
      .select(col("q_id").as("key"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("v"),
        col("n_id").as("tag"))
    val top = topKSelect(spark, sims, K)
      .select(col("key").as("q_id"), col("rank"),
        col("tag").as("n_id"), col("v").as("sim"))
    e.select(col("vec_id").as("n_id"), col("label").as("n_label"))
      .join(broadcast(top), "n_id")
      .select(col("q_id"), col("rank"), col("n_id"), col("n_label"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Greedy k-center (Gonzalez farthest-point) selection rounds for
    * [[kCenterSelect]]. Demo-scale; the per-round cost model is what
    * matters (see scaladoc there).
    */
  val KCenterRounds = 8

  /** Greedy k-center coreset selection over the embeddings — the
    * classic diversity-maximizing data-selection pass (Gonzalez' 2-approx
    * farthest-point traversal): seed with the smallest vec_id, then each
    * round admit the point LEAST similar to its nearest already-selected
    * point (argmin of max-cosine, vec_id tie-break).
    *
    * Scale shape: the selected set is O(k·dim) MODEL STATE (the k-means
    * centroid precedent) — each round is one narrow corpus scan with the
    * selected vectors inlined as literals (`greatest` over k codegen
    * cosines, NO shuffle, no N×k join), and the argmin is a
    * TakeOrderedAndProject (per-partition top-1 → driver merge), so a
    * round moves k rows of model state and nothing else. k rounds = k
    * scans; at 100 TB you batch rounds against a cached/columnar corpus.
    * Determinism: round(sim, 6) before comparison and a total
    * (maxsim ASC, vec_id ASC) order — the DuckDB oracle re-derives the
    * identical traversal.
    */
  def kCenterSelect(spark: SparkSession, dir: String): DataFrame =
    kCenterSelectOn(spark, Tables.embeddings(spark, dir))

  def kCenterSelectOn(spark: SparkSession, emb: DataFrame): DataFrame = {
    import spark.implicits._
    val e = emb.select(col("vec_id"), col("embedding")).persist()
    try {
      val seed = e.orderBy(col("vec_id")).limit(1).head()
      var selected = Seq(seed.getLong(0) -> seed.getSeq[Float](1))
      val picks = (1 to KCenterRounds).map { r =>
        val sims = selected.map { case (_, v) =>
          round(cosine(col("embedding"), typedLit(v)), 6) }
        val maxSim = sims.reduce((a, b) => greatest(a, b))
        val pick = e.filter(!col("vec_id").isin(selected.map(_._1): _*))
          .select(col("vec_id"), col("embedding"), maxSim.as("maxsim"))
          .orderBy(col("maxsim").asc, col("vec_id"))
          .limit(1).head() // O(1) model state per round
        selected :+= (pick.getLong(0) -> pick.getSeq[Float](1))
        (r.toLong, pick.getLong(0), pick.getDouble(2))
      }
      picks.toDF("sel_round", "vec_id", "maxsim").orderBy(col("sel_round"))
    } finally { e.unpersist(); () }
  }

  /** IVF approximate top-k with a REAL coarse quantizer: the gated
    * fixed-point Lloyd ([[ivfExactAssignments]]) over the corpus, cell
    * count scaling ~√N with the corpus (the standard IVF sizing:
    * balances cells scanned per probe against vectors per cell), and
    * MULTI-PROBE search — each query scans its `probes` nearest cells,
    * which recovers the boundary neighbors single-probe loses.
    *
    * The quantizer is a pure function of the data (deterministic init =
    * first-k vectors, fixed-point centroid sums), so the whole tier
    * sits under the DuckDB oracle gate — same pipeline as
    * [[ivfKnnExact]], with the production √N cell sizing instead of the
    * fixed [[IvfExactCells]] (the oracle re-derives √N from
    * `count(*)`, the [[dedupCells]] convention).
    *
    * Scale shape: the fitted centroids are model state (k·dim floats —
    * broadcast, never shuffled with the data); corpus vectors get their
    * cell in one narrow pass; at 100 TB the corpus would be WRITTEN
    * partitioned by cell so a probe is partition pruning, and the
    * per-cell scan is the only data movement. The BUILD pays the
    * standard IVF assignment bill — N·cells distance kernels per Lloyd
    * round, ~N^1.5 at √N sizing (probed: 5.4 s at 100k → 37.6 s at
    * 400k → 106.9 s at 800k vectors, local[32]) — a one-off index
    * cost, amortized across every query the pruned layout then serves;
    * corpora past the [[IvfMaxCells]] cap pay N·cap instead (linear).
    * Recall < 1.0 by construction; SimilaritySpec holds the floor at
    * 0.8 recall@5.
    */
  def ivfKnn(spark: SparkSession, dir: String, probes: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (corpus, probeCells) = ivfAssignments(spark, e, probes,
      Some(denseCountDir(spark, dir, "ivf sizing")))
    ivfSearch(corpus, probeCells)
  }

  /** IVF search over any (vec_id, embedding: array<float>) relation —
    * the quantizer-quality spec runs this on clustered data, where IVF
    * actually earns its keep. (On a structureless corpus recall can
    * never beat the scanned fraction: with no cluster signal, each
    * probed cell holds a random ~1/cells of the true neighbors; that
    * is a property of the DATA, not the quantizer.)
    */
  def ivfKnnOn(spark: SparkSession, e: DataFrame, probes: Int = 3): DataFrame = {
    val (corpus, probeCells) = ivfAssignments(spark, e, probes)
    ivfSearch(corpus, probeCells)
  }

  /** Ceiling on the √N IVF cell count: centroids are collected,
    * broadcast model state (cells · dim · 8 B — 64 MB at this cap for
    * 64-dim embeddings), and √N outgrows a broadcast around 10^10
    * vectors; past the cap cells deepen instead of multiplying, which
    * trades probe selectivity, never correctness. Mirrored in the
    * oracle's `least(...)` so the sizing rule itself is under the
    * gate.
    */
  val IvfMaxCells = 131072

  /** The √N-sized quantizer's two products: the corpus tagged with its
    * coarse cell (`n_id`, `embedding`, `cell`) and the per-query probe
    * plan (`q_id`, `q_emb`, `cell` — one row per probed cell). Shared
    * by the in-memory search and the materialized layout. The one
    * sizing job (count → [[dedupCells]] capped at [[IvfMaxCells]]) is
    * the only work before the shared Lloyd chain.
    */
  private def ivfAssignments(spark: SparkSession, e: DataFrame,
                             probes: Int,
                             precountedN: Option[Long] = None): (DataFrame, DataFrame) =
    ivfExactAssignments(spark, e, probes,
      math.min(IvfMaxCells, dedupCells(precountedN.getOrElse(e.count()))))

  /** Cell-partitioned layout write with CONSOLIDATED files (guide §6
    * "aim for output files in the 128 MB–1 GB range", fixture edition:
    * the upstream assignment arrives in up to shuffle.partitions
    * slices, so the plain write emitted one file PER (task, cell) —
    * the r21 compacted layout held MORE files (96) than the base ∪
    * delta it folded (48+...), and every consumer query re-listed and
    * re-opened them all. A hash repartition on the partition column
    * first puts each cell in exactly one task → exactly one file per
    * cell, and the write's exchange replaces — not adds to — the
    * cost, since the writer no longer commits N× the files. A
    * production writer targeting a fixed file size would repartition
    * by (cell, pmod(hash, ceil(cell_bytes/target))) — same seam,
    * sized instead of single.) Values untouched: file layout only.
    */
  private def writeConsolidated(df: DataFrame, keyCol: String,
      path: String): Unit =
    df.repartition(col(keyCol))
      .write.mode("overwrite").partitionBy(keyCol).parquet(path)

  /** Probe scan + exact rerank: only vectors in each query's probed
    * cells are scored.
    */
  private def ivfSearch(corpus: DataFrame, probeCells: DataFrame): DataFrame = {
    val sims = corpus.join(broadcast(probeCells), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** On-disk home of the cell-partitioned corpus — since round 22 a
    * per-corpus [[graft.sources.Scratch.materializeOnce]] slot (the
    * delta family's stored-layout discipline, applied to the serving
    * layout it pioneered): the round-21 form re-wrote the whole layout
    * on EVERY call, paying a full partitioned write per query run
    * where "the write runs once at ingest" was already the operator's
    * own scale story. Values identical (the Lloyd chain is a pure
    * function of the corpus); a cold session still builds inside the
    * first consumer's timed window.
    */
  def ivfLayoutDir(spark: SparkSession, dir: String): String =
    graft.sources.Scratch.corpusDir(spark, "ivf_layout", dir)

  /** The IVF layout MATERIALIZED: the corpus is WRITTEN partitioned by
    * its fitted k-means cell, and a probe is a partition-PRUNED read —
    * only the probed cells' files are ever opened, which is the
    * billion-scale ANN serving layout SURVEY §8 describes (at 100 TB
    * the write runs once at ingest; every query after that touches
    * probes/cells of the data). Same deterministic Lloyd quantizer and
    * same search as [[ivfKnnOn]], so the result is identical to
    * q_knn_ivf — SimilaritySpec asserts the equality, and PlanAuditSpec
    * asserts the scan carries the cell PartitionFilters.
    *
    * The probed cell list is collected to the driver to become plan-time
    * literals — that is what makes pruning static — and is bounded by
    * queries × probes rows of one int each, probe METADATA in the same
    * class as the density probe's scalar, never corpus data.
    *
    * Equality with [[ivfKnn]] is unconditional: the fixed-point Lloyd
    * quantizer is a pure function of the DATA alone (first-k init,
    * associative long sums — no layout or seed sensitivity), so two
    * independent library calls over the same table always agree, and
    * both match the DuckDB re-derivation (shared q_knn_ivf oracle).
    */
  def ivfKnnMaterialized(spark: SparkSession, dir: String, probes: Int = 3): DataFrame = {
    val (corpus, probeCells0) = ivfAssignments(spark,
      Tables.embeddings(spark, dir), probes,
      Some(denseCountDir(spark, dir, "ivf sizing")))
    // probeCells is consumed twice (driver collect of the probed cells,
    // then the search join) and its lineage includes the full corpus
    // normalization pass — eagerly materialize the tiny frame
    // (queries × probes rows) so the second consumption is a local scan
    val probeCells = probeCells0.localCheckpoint()
    val layoutDir = ivfLayoutDir(spark, dir)
    graft.sources.Scratch.materializeOnce(layoutDir) {
      writeConsolidated(corpus, "cell", layoutDir)
    }
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val layout = graft.sources.Scratch.readParquetOnce(spark, layoutDir)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    ivfSearch(layout, probeCells)
  }

  /** Cell count for [[ivfKnnExactOn]]. Fixed (not √N) so the DuckDB
    * twin's seed filter is a plain literal; the √N-sized production
    * path stays [[ivfKnn]]/[[ivfKnnMaterialized]]. 16 cells × 3 probes
    * scans ~19% of the corpus — enough structure to be a real IVF while
    * the whole pipeline stays a pure function of the data.
    */
  val IvfExactCells = 16

  /** IVF at the FIXED [[IvfExactCells]] cell count — the first
    * oracle-graded ANN tier, kept alongside the √N-sized [[ivfKnn]] as
    * the literal-k variant (its DuckDB seed filter is a plain literal,
    * no count(*) subquery). Both run the same composition: angular
    * cells over unit vectors via the fixed-point Lloyd of
    * [[kmeansAssignOn]] ([[lloydRounds]]: seeds = first k vectors,
    * [[KmeansIters]] rounds, long-sum centroid updates), multi-probe
    * cell plan, exact cosine rerank inside probed cells — every stage
    * a deterministic pure function of (data, constants) that DuckDB
    * re-derives in SQL for the full rows+schema+hash gate.
    *
    * Cosine ranks neighbors, so cells must partition the unit sphere:
    * vectors are L2-normalized in double arithmetic BEFORE the 2^20
    * fixed-point quantization (for unit vectors ‖x−y‖² = 2−2cosθ, so
    * L2 Lloyd over units IS angular clustering — the [[ivfAssignments]]
    * note), with the zero-vector guard keeping all-zero embeddings
    * zero instead of NaN-poisoning the fit.
    *
    * Scale shape is [[ivfKnn]]'s: centroids are O(k·dim) collected
    * model state broadcast to both the corpus assignment and the probe
    * plan; the search joins corpus cells to a broadcast probe plan —
    * at 100 TB the corpus would be written partitioned by cell
    * ([[ivfKnnMaterialized]]) and a probe is partition pruning.
    */
  def ivfKnnExact(spark: SparkSession, dir: String, probes: Int = 3): DataFrame =
    ivfKnnExactOn(spark, Tables.embeddings(spark, dir), probes)

  def ivfKnnExactOn(spark: SparkSession, e: DataFrame, probes: Int = 3): DataFrame = {
    val (corpus, probeCells) = ivfExactAssignments(spark, e, probes)
    ivfSearch(corpus, probeCells)
  }

  /** The deterministic quantizer's two products — tagged corpus and
    * per-query probe plan — shared by the in-memory search and the
    * materialized layout (the [[ivfAssignments]] split, Lloyd edition).
    */
  /** Unit vectors in double arithmetic (sequential element-order fold,
    * the cosine-parity convention) — the row-local normalization every
    * IVF tier quantizes from; shared by the full fit and the delta
    * entries (a batch vector normalizes identically whether it arrives
    * at base ingest or later, which is what makes the stateless delta
    * assignment equal the full fit's).
    */
  private def unitized(e: DataFrame): DataFrame = e
    .withColumn("nrm", sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))))
    .select(col("vec_id"),
      when(col("nrm") === 0.0,
        transform(col("embedding"), x => x.cast("double")))
        .otherwise(transform(col("embedding"), x => x.cast("double") / col("nrm")))
        .as("embedding"))

  private def ivfExactAssignments(spark: SparkSession, e: DataFrame,
      probes: Int, cells: Int = IvfExactCells): (DataFrame, DataFrame) = {
    // quantizedX fixes the unit vectors to 2^20 longs + exact xv
    // doubles for the Lloyd chain
    val q = quantizedX(unitized(e))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloydRounds(spark, q, cells)
    // cell as INT on both sides: the materialized layout re-infers the
    // partition column as IntegerType, and a mismatched join/filter
    // type would push the cast onto the attribute and defeat pruning
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding"))
      .join(assignStep(q, cents)
        .select(col("vec_id").as("n_id"),
          col("cluster").cast("int").as("cell")), "n_id")
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("d"), col("cid"))
    val probeCells = q.filter(col("vec_id") < NumQueries)
      .crossJoin(broadcast(cents))
      .select(col("vec_id").as("q_id"), col("cid"),
        sqDistD(col("xv"), col("cent")).as("d"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= probes)
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
      .select(col("q_id"), col("q_emb"), col("cid").cast("int").as("cell"))
    (corpus, probeCells)
  }

  /** The graded tier's 100 TB SERVING LAYOUT: [[ivfKnnExact]]'s corpus
    * WRITTEN partitioned by its deterministic Lloyd cell, probes
    * executed as partition-PRUNED read-back (the [[ivfKnnMaterialized]]
    * pattern) — so the one ANN tier under the full hash gate is also
    * the one whose scan shape survives a billion vectors. Identical
    * rows to [[ivfKnnExact]] (same pure-function quantizer, same
    * search; SimilaritySpec asserts equality, PlanAuditSpec-style
    * PartitionFilters asserted in the same spec), hence it shares
    * q_knn_ivf_exact's DuckDB oracle. The probed cell list collected
    * to the driver is queries × probes ints — probe metadata, the
    * materialized-IVF convention.
    */
  def ivfKnnExactMaterialized(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    val (corpus, probeCells0) =
      ivfExactAssignments(spark, Tables.embeddings(spark, dir), probes)
    // consumed twice (cell collect + search join) with the Lloyd
    // normalization pass in its lineage — materialize the tiny frame
    val probeCells = probeCells0.localCheckpoint()
    val layoutDir = graft.sources.Scratch.corpusDir(spark, "ivf_exact_layout", dir)
    graft.sources.Scratch.materializeOnce(layoutDir) {
      writeConsolidated(corpus, "cell", layoutDir)
    }
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val layout = graft.sources.Scratch.readParquetOnce(spark, layoutDir)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    ivfSearch(layout, probeCells)
  }

  // ——— delta (incremental) ANN index maintenance ———

  /** Append-only ingest split shared by both delta ANN entries: prior
    * ingests assigned vec_ids 0..B-1 (B = ⌊0.8n⌋ via integer
    * arithmetic so the DuckDB twin's `count(*) * 8 // 10` matches
    * bit-for-bit), the new batch holds B..n-1. An id-PREFIX, not the
    * media families' mod-10 cut: an ANN index's id space is
    * append-only by construction, and the prefix keeps the STORED side
    * dense so the seed/entry conventions (`vec_id < k`) read the same
    * vectors at base ingest and forever after — Lloyd seeds, graph
    * entry points, and the query set never silently move when a batch
    * lands.
    */
  private[graft] def deltaBaseCount(n: Long): Long = n * 8 / 10

  /** INCREMENTAL IVF — index MAINTENANCE under ingest, the similarity
    * family's delta form (the last family without one): prior ingests
    * left a STORED deterministic Lloyd quantizer (the
    * [[ivfKnnExactOn]] fit over the base, [[IvfExactCells]] cells) and
    * the cell-partitioned base layout ([[ivfKnnExactMaterialized]]'s
    * serving shape). A new batch is absorbed WITHOUT refitting or
    * re-clustering anything: each new vector takes a STATELESS argmin
    * over the stored centroids (the q_stream_kmeans kernel — one
    * broadcast join, map-only) and lands as a delta commit NEXT TO the
    * frozen base layout (its own cell-partitioned directory,
    * idempotent overwrite — the [[graft.operators.Dedup.deltaShardAppend]]
    * frozen-base discipline on the ANN layout; a compaction folds
    * delta files into the base off the query path). Ingest cost is
    * O(batch · cells) scoring plus a batch-sized write — NEVER a Lloyd
    * chain over the corpus (probed flat-in-base; ScalingProbe
    * delta_knn_ivf).
    *
    * Search after ingest: the probe plan scores queries against the
    * SAME stored centroids and reads base + delta layouts partition-
    * PRUNED to the probed cells. Because base cells were themselves
    * assigned against these centroids at base ingest, base ∪ delta
    * equals one assignment pass over the whole corpus vs the
    * base-fitted quantizer — which is exactly what the DuckDB oracle
    * re-derives (Lloyd over the id-prefix base, assignment over all),
    * so the graded entry sits under the full rows+schema+hash gate.
    * The DRIFT this maintenance trades away is quantizer FIT, not
    * correctness: centroids stop tracking the distribution as batches
    * accumulate (recall drift vs a full refit is floored in
    * Round19OpsSpec on the clustered fixture); the production answer
    * is periodic refits, exactly like the re-shard note on
    * deltaShardAppend.
    */
  /** Fit the deterministic [[IvfExactCells]]-cell Lloyd quantizer over
    * an embedding frame — the stored-centroid builder of the delta
    * family (and the probe's fixed-seed stand-in).
    */
  private[graft] def ivfFitCents(spark: SparkSession, e: DataFrame): DataFrame = {
    val q = quantizedX(unitized(e))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try lloydRounds(spark, q, IvfExactCells).localCheckpoint()
    finally { q.unpersist(); () }
  }

  /** Stateless cell assignment against FIXED centroids — the
    * q_stream_kmeans kernel as a corpus operator: one broadcast join,
    * map-only, the entire per-batch ingest cost of the maintained IVF.
    */
  private[graft] def ivfAssignTo(cents: DataFrame, e: DataFrame): DataFrame =
    e.select(col("vec_id").as("n_id"), col("embedding"))
      .join(assignStep(quantizedX(unitized(e)), cents)
        .select(col("vec_id").as("n_id"),
          col("cluster").cast("int").as("cell")), "n_id")

  /** Per-query probe plan against fixed centroids: top-`probes` cells
    * by quantized distance, query embedding riding along.
    */
  private def ivfProbePlan(queriesE: DataFrame, cents: DataFrame,
      probes: Int): DataFrame = {
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("d"), col("cid"))
    quantizedX(unitized(queriesE)).crossJoin(broadcast(cents))
      .select(col("vec_id").as("q_id"), col("cid"),
        sqDistD(col("xv"), col("cent")).as("d"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= probes)
      .join(queriesE.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb")), "q_id")
      .select(col("q_id"), col("q_emb"), col("cid").cast("int").as("cell"))
  }

  def deltaIvfKnn(spark: SparkSession, dir: String, probes: Int = 3): DataFrame = {
    val (cents, layouts) = deltaIvfEnsure(spark, dir)
    val e = Tables.embeddings(spark, dir)
    // serving: probe plan vs the stored centroids, base + delta read
    // back partition-pruned to the probed cells
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
        cents, probes)
      .localCheckpoint() // cell collect + search join
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val layout = layouts
      .map(p => graft.sources.Scratch.readParquetOnce(spark, p)
        .filter(col("cell").isin(cellIds.map(Int.box): _*)))
      .reduce(_ unionByName _)
    ivfSearch(layout, probeCells)
  }

  /** Materialize (once per corpus) the single-ingest delta IVF's
    * stored state — the 8/10-base-fitted quantizer, the frozen
    * cell-partitioned base layout, and the batch's delta commit (the
    * INGEST: stateless assignment, the base layout never reopened) —
    * returning (centroids, layout paths). Shared by the serving entry,
    * its compaction, and the drift router.
    */
  private def deltaIvfEnsure(spark: SparkSession,
      dir: String): (DataFrame, Seq[String]) = {
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "delta IVF")
    val b = deltaBaseCount(n)
    val base = e.filter(col("vec_id") < b)
    val centPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_centroids", dir)
    val layoutPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_layout", dir)
    graft.sources.Scratch.materializeOnce(centPath) {
      val cents = ivfFitCents(spark, base)
      cents.write.mode("overwrite").parquet(centPath)
      writeConsolidated(ivfAssignTo(cents, base), "cell", layoutPath)
    }
    val cents = graft.sources.Scratch.readParquetOnce(spark, centPath)
    val deltaPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_layout_batch", dir)
    graft.sources.Scratch.materializeOnce(deltaPath) {
      writeConsolidated(ivfAssignTo(cents, e.filter(col("vec_id") >= b)),
        "cell", deltaPath)
    }
    (cents, Seq(layoutPath, deltaPath))
  }

  /** RETRACTION — the IVF layout under DELETION, closing the ANN
    * column of the lifecycle matrix: tombstoned vec_ids drop out of
    * the stored cell-partitioned layout by one anti-filter fold
    * (written once, off the query path — the deletion-vector
    * materialize of a lakehouse, cell partitioning preserved), while
    * the stored quantizer is DELIBERATELY untouched: retraction
    * deletes DATA, not the model — centroids keep serving until the
    * drift router ([[ivfKnnDriftRouted]]) MEASURES that the fit
    * itself must refresh. Serving reads the retracted layout
    * partition-pruned; the oracle is the maintenance chain with the
    * assignment restricted to survivors (the quantizer still fits
    * over the ORIGINAL base — exactly the stored-model semantics).
    * Fixture tombstones: vec_id ≡ 7 (mod 10) excluding the query ids.
    */
  def retractIvfKnn(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    val (cents, layouts) = deltaIvfEnsure(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val retractPath = graft.sources.Scratch.corpusDir(spark, "ivf_retract_layout", dir)
    graft.sources.Scratch.materializeOnce(retractPath) {
      writeConsolidated(
        layouts.map(p => graft.sources.Scratch.readParquetOnce(spark, p))
          .reduce(_ unionByName _)
          .filter(!(col("n_id") % 10 === 7 && col("n_id") >= NumQueries)),
        "cell", retractPath)
    }
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
      cents, probes).localCheckpoint()
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    ivfSearch(graft.sources.Scratch.readParquetOnce(spark, retractPath)
      .filter(col("cell").isin(cellIds.map(Int.box): _*)), probeCells)
  }

  /** DRIFT-MEASURED refit router, IVF edition ([[graphKnnDriftRouted]]'s
    * twin on the quantizer-fit drift trade): a deterministic sample of
    * inserted vectors runs the SERVING probe plan over the maintained
    * layouts AND an exact broadcast scan; sampled recall@[[K]] ≥
    * [[DriftRecallFloor]] serves the maintained index (the
    * gate-certified [[deltaIvfKnn]] result), below it the router
    * loudly escalates to a full refit ([[ivfKnnExactOn]] — new Lloyd
    * fit over everything). The decision prices quantizer staleness by
    * MEASUREMENT instead of refitting on a calendar.
    */
  def ivfKnnDriftRouted(spark: SparkSession, dir: String,
      probes: Int = 3, expectArm: Option[String] = None): DataFrame = {
    val (cents, layouts) = deltaIvfEnsure(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "drift-routed IVF")
    val b = deltaBaseCount(n)
    val nSample = math.min(DriftSampleQueries.toLong, n - b)
    val recall = measuredIvfRecall(spark, e, cents,
      layouts.map(p => graft.sources.Scratch.readParquetOnce(spark, p)), b, nSample, probes)
    assertRoutedArm("IVF", recall, expectArm)
    if (recall >= DriftRecallFloor) {
      System.err.println(f"[drift-router] sampled IVF insert recall@$K = " +
        f"$recall%.3f >= $DriftRecallFloor — serving the maintained index")
      deltaIvfKnn(spark, dir, probes)
    } else {
      System.err.println(f"[drift-router] sampled IVF insert recall@$K = " +
        f"$recall%.3f < $DriftRecallFloor — ESCALATING to a full refit")
      ivfKnnExactOn(spark, e)
    }
  }

  /** Routing-arm assertion for the GRADED drift-router entries: each
    * entry's DuckDB oracle hard-pins one arm (the IVF fixture measures
    * ~0.46 and escalates; the graph fixture measures ~1.0 and serves),
    * so a gate-corpus / sampling shift that silently flipped the
    * measured recall across [[DriftRecallFloor]] would surface as an
    * OPAQUE hash mismatch. When the registered entry declares its
    * expected arm, fail loudly instead — both on an arm flip and on a
    * measurement drifting within ε of the floor (the flip about to
    * happen). Spec/production callers pass None and route freely
    * (round-20 advice #1).
    */
  private def assertRoutedArm(which: String, recall: Double,
      expectArm: Option[String]): Unit = expectArm.foreach { arm =>
    val eps = 0.05
    val taken = if (recall >= DriftRecallFloor) "serve" else "refit"
    require(math.abs(recall - DriftRecallFloor) >= eps,
      f"drift-router($which): measured recall $recall%.3f is within " +
        f"ε=$eps of the floor $DriftRecallFloor — the graded fixture no " +
        "longer separates the arms; re-pin the oracle before trusting " +
        "the hash gate")
    require(taken == arm,
      f"drift-router($which): took the '$taken' arm (recall $recall%.3f " +
        f"vs floor $DriftRecallFloor) but the graded oracle pins '$arm' — " +
        "fixture or sampling drift; fix the entry's oracle, this is not " +
        "a data bug")
  }

  /** The IVF router's measured statistic: fraction of the sampled
    * inserted vectors' true top-[[K]] the maintained index's own
    * serving plan (probe cells vs stored centroids, pruned layout
    * scans) returns. Deterministic on both sides.
    */
  private[graft] def measuredIvfRecall(spark: SparkSession, e: DataFrame,
      cents: DataFrame, layouts: Seq[DataFrame], b: Long, nSample: Long,
      probes: Int): Double = {
    if (nSample <= 0) return 1.0
    val sample = e.filter(col("vec_id") >= b && col("vec_id") < b + nSample)
      .localCheckpoint()
    val probeCells = ivfProbePlan(sample, cents, probes).localCheckpoint()
    val approx = ivfSearch(layouts.reduce(_ unionByName _), probeCells)
      .select(col("q_id"), col("n_id"))
    val sampleQ = sample
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val exact = e.select(col("vec_id").as("n_id"), col("embedding"))
      .join(broadcast(sampleQ), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("n_id"))
    recallOf(exact, approx)
  }

  /** recall = |exact ∩ approx| / |exact| in ONE aggregation job: a
    * left-outer join from the exact side with a hit marker, then one
    * (count, count-hits) pass. The denominator is the EXACT side's
    * actual row count, not nSample·K — on a corpus with n − 1 < K each
    * sampled query has fewer than K true neighbors and nSample·K would
    * bias recall low enough to trigger a spurious full refit (round-20
    * advice). On any corpus with ≥ K+1 vectors the denominators are
    * equal, so the gate statistic — and the routed arm — is unchanged.
    */
  private def recallOf(exact: DataFrame, approx: DataFrame): Double = {
    val row = exact.join(
        approx.select(col("q_id"), col("n_id"), lit(1).as("hit")),
        Seq("q_id", "n_id"), "left_outer")
      .agg(count(lit(1)).as("n"), count(col("hit")).as("hits")).head()
    val n = row.getLong(0)
    if (n == 0L) 1.0 else row.getLong(1).toDouble / n
  }

  /** The delta lifecycle's CLOSING stage — COMPACTION: the batch's
    * delta commit folded into one cell-partitioned layout (read base +
    * delta, rewrite partitioned — off the query path, the
    * deltaShardAppend re-shard note's IVF edition: small delta files
    * accumulate per ingest until a compaction pass consolidates them;
    * row VALUES never change, only file layout). The graded entry
    * serves the same queries over the compacted layout and must equal
    * [[deltaIvfKnn]] row-for-row — it shares the delta oracle, so the
    * gate certifies compaction as a pure layout change. Serving stays
    * partition-pruned; the plan now reads ONE layout instead of
    * base ∪ delta.
    */
  def deltaIvfKnnCompacted(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    // ensure the maintained layouts exist (shared materialization with
    // q_delta_knn_ivf — a compaction runs AFTER ingests)
    deltaIvfKnn(spark, dir, probes)
    val centPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_centroids", dir)
    val layoutPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_layout", dir)
    val deltaPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_layout_batch", dir)
    val compactPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta_layout_compacted", dir)
    graft.sources.Scratch.materializeOnce(compactPath) {
      writeConsolidated(
        graft.sources.Scratch.readParquetOnce(spark, layoutPath)
          .unionByName(graft.sources.Scratch.readParquetOnce(spark, deltaPath)),
        "cell", compactPath)
    }
    val e = Tables.embeddings(spark, dir)
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
        graft.sources.Scratch.readParquetOnce(spark, centPath), probes)
      .localCheckpoint()
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    ivfSearch(graft.sources.Scratch.readParquetOnce(spark, compactPath)
      .filter(col("cell").isin(cellIds.map(Int.box): _*)), probeCells)
  }

  /** MULTI-INGEST compounding for the IVF family — TWO stored
    * assignment commits then serving, under the gate: the quantizer
    * fits over the 6/10 id-prefix base; ingests 1 (ids [0.6n, 0.8n))
    * and 2 (ids [0.8n, n)) each land as their OWN cell-partitioned
    * commit next to the frozen base layout (idempotent, batch-sized —
    * never a refit, never a rewrite of a prior commit). Because the
    * assignment is STATELESS against the stored centroids, any commit
    * grouping unions to one assignment pass over the whole corpus —
    * ingest(ingest(base, b1), b2) == full assignment — and the graded
    * entry hash-matches the [[deltaIvfKnn]] oracle chain at the 6/10
    * cut. Serving reads all commits partition-pruned to the probed
    * cells.
    */
  def delta2IvfKnn(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    val (cents, layouts) = delta2IvfEnsure(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
      cents, probes).localCheckpoint()
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val layout = layouts
      .map(p => graft.sources.Scratch.readParquetOnce(spark, p)
        .filter(col("cell").isin(cellIds.map(Int.box): _*)))
      .reduce(_ unionByName _)
    ivfSearch(layout, probeCells)
  }

  /** The two-commit lifecycle's N-COMMIT compaction: base + BOTH
    * ingest commits folded into one cell-partitioned layout (off the
    * query path; row values unchanged) — serving the fold shares the
    * delta2 oracle row-for-row, certifying the N-way fold as a pure
    * layout change (the single-commit [[deltaIvfKnnCompacted]]
    * generalized to the multi-ingest history it accumulates).
    */
  def delta2IvfKnnCompacted(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    val (cents, layouts) = delta2IvfEnsure(spark, dir)
    val compactPath = graft.sources.Scratch.corpusDir(spark,
      "ivf_delta2_compacted", dir)
    graft.sources.Scratch.materializeOnce(compactPath) {
      writeConsolidated(
        layouts.map(p => graft.sources.Scratch.readParquetOnce(spark, p))
          .reduce(_ unionByName _),
        "cell", compactPath)
    }
    val e = Tables.embeddings(spark, dir)
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
      cents, probes).localCheckpoint()
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    ivfSearch(graft.sources.Scratch.readParquetOnce(spark, compactPath)
      .filter(col("cell").isin(cellIds.map(Int.box): _*)), probeCells)
  }

  /** Materialize (once per corpus) the delta2 IVF's stored state —
    * 6/10-base-fitted centroids, the base layout, and the two ingest
    * commits — and return (centroids, commit paths in ingest order).
    */
  private def delta2IvfEnsure(spark: SparkSession,
      dir: String): (DataFrame, Seq[String]) = {
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "delta2 IVF")
    val b0 = n * 6 / 10
    val b1 = deltaBaseCount(n) // 8/10 — the single-delta batch cut
    val centPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta2_centroids", dir)
    val layoutPath = graft.sources.Scratch.corpusDir(spark, "ivf_delta2_layout", dir)
    graft.sources.Scratch.materializeOnce(centPath) {
      val cents = ivfFitCents(spark, e.filter(col("vec_id") < b0))
      cents.write.mode("overwrite").parquet(centPath)
      writeConsolidated(ivfAssignTo(cents, e.filter(col("vec_id") < b0)),
        "cell", layoutPath)
    }
    val cents = graft.sources.Scratch.readParquetOnce(spark, centPath)
    val c1Path = graft.sources.Scratch.corpusDir(spark, "ivf_delta2_c1", dir)
    graft.sources.Scratch.materializeOnce(c1Path) {
      writeConsolidated(
        ivfAssignTo(cents, e.filter(col("vec_id") >= b0 && col("vec_id") < b1)),
        "cell", c1Path)
    }
    val c2Path = graft.sources.Scratch.corpusDir(spark, "ivf_delta2_c2", dir)
    graft.sources.Scratch.materializeOnce(c2Path) {
      writeConsolidated(ivfAssignTo(cents, e.filter(col("vec_id") >= b1)),
        "cell", c2Path)
    }
    (cents, Seq(layoutPath, c1Path, c2Path))
  }

  /** In-memory delta-IVF body for specs and probes (no corpus identity
    * to materialize under): fit on the id-prefix base, assign the
    * batch statelessly against those centroids, search the union —
    * value-identical to [[deltaIvfKnn]]'s stored-table path.
    */
  private[graft] def deltaIvfKnnOn(spark: SparkSession, e: DataFrame,
      probes: Int = 3): DataFrame = {
    val n = denseCount(e, "delta IVF")
    val b = deltaBaseCount(n)
    val cents = ivfFitCents(spark, e.filter(col("vec_id") < b))
    val corpus = ivfAssignTo(cents, e.filter(col("vec_id") < b))
      .unionByName(ivfAssignTo(cents, e.filter(col("vec_id") >= b)))
    val probeCells = ivfProbePlan(e.filter(col("vec_id") < NumQueries),
      cents, probes).localCheckpoint()
    ivfSearch(corpus, probeCells)
  }

  /** Probe support (ScalingProbe delta_knn_ivf): maintenance + serving
    * over a PREBUILT assigned base layout — the timed work is the
    * batch's stateless assignment, the probe plan, and the
    * cell-filtered union search; the base enters only through the
    * filtered scan, never a fit.
    */
  private[graft] def deltaIvfProbe(baseLayout: DataFrame, cents: DataFrame,
      batch: DataFrame, queriesE: DataFrame, probes: Int = 3): DataFrame = {
    val probeCells = ivfProbePlan(queriesE, cents, probes).localCheckpoint()
    val cellIds = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val corpus = baseLayout.unionByName(ivfAssignTo(cents, batch))
      .filter(col("cell").isin(cellIds.map(Int.box): _*))
    ivfSearch(corpus, probeCells)
  }

  // ——— graph ANN (NSW-style) ———

  val GraphM = 8        // proximity out-degree per node
  val GraphBeam = 24    // search beam width per query
  val GraphHops = 5     // beam-expansion rounds
  val GraphEntries = 8  // deterministic global entry points
  private val LongLinkGroup = 32L // target nodes per hash-ring group

  /** Build the navigable neighbor graph over (vec_id, embedding) —
    * the flat single-layer core of HNSW. (HNSW's hierarchy exists to
    * cut the O(log N) descent a SINGLE pointer-chasing searcher pays
    * per query; a batch engine amortizes that differently — one
    * edge-table scan per hop serves the whole query batch — so the
    * layer worth keeping is the navigable base graph.)
    *
    * Two link families, unioned:
    *  - PROXIMITY links: top-[[GraphM]] cosine neighbors within
    *    deterministic coarse blocks (each node assigned to its TWO
    *    nearest of ~√N centroid blocks, so boundary neighbors still
    *    pair — same blocking arithmetic as [[embeddingDedup]], ~N^1.5
    *    total pair work at any corpus size, never N²).
    *  - LONG-RANGE links: two hash-ordered ring families — nodes are
    *    grouped by pmod(mix31(vec_id, salt), N/32) and chained in
    *    hash order within each group (wrapping). A pure-proximity k-NN
    *    graph over clustered data is a disconnected archipelago no
    *    beam search can cross; two independent pseudo-random rings
    *    make the union connected with high probability, NSW's small-
    *    world shortcut property, WITHOUT a global sort — grouping is
    *    one hash-keyed shuffle, so the build holds at corpus scale.
    */
  /** Dense-id sizing probe shared by both graph builders: centroids,
    * entry points, and queries are derived by filtering vec_id < k
    * (the NumQueries/ivf fixture convention), which REQUIRES dense ids
    * 0..n-1 — on a sparse or offset id space those filters can be
    * empty and the search would return nothing, silently. The min/max
    * probe rides the same O(1) sizing job as the count.
    */
  private def denseCount(e: DataFrame, who: String): Long = {
    val szRow = e.agg(count(lit(1)), min(col("vec_id")), max(col("vec_id"))).head()
    val n = szRow.getLong(0)
    require(n == 0L ||
        (szRow.getAs[Long](1) == 0L && szRow.getAs[Long](2) == n - 1),
      s"$who derives centroids/entries/queries from `vec_id < k`: " +
        s"vec_id must be dense 0..n-1 (got min=${szRow.get(1)}, " +
        s"max=${szRow.get(2)}, n=$n)")
    n
  }

  /** [[denseCount]] memoized per (session, corpus dir) — the round-21
    * verdict's "session-memoize corpus counts the way the widen
    * decision is memoized": every dir-keyed ANN entry re-ran the same
    * O(1)-result sizing job over the same immutable corpus file (17
    * call sites, 1–3 sizing jobs per query across the ~27-query knn
    * family — pure driver/job overhead at any scale, since the probe's
    * answer is a property of the corpus, not the query). The fixture
    * is validated dense on the FIRST probe per corpus; the memo is
    * in-JVM only (a fresh bench/oracle run re-counts from parquet),
    * the [[graft.sources.Scratch.materializeOnce]] discipline applied
    * to a scalar. On-variants over arbitrary frames keep the
    * per-call probe.
    */
  private def denseCountDir(spark: SparkSession, dir: String,
      who: String): Long =
    countMemo.computeIfAbsent((System.identityHashCode(spark), dir),
      _ => Long.box(denseCount(Tables.embeddings(spark, dir), who)))

  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), java.lang.Long]()

  /** Oracle-portable 31-bit integer mixer (xor-shift → multiply ×2,
    * the lowbias32 finalizer shape): every intermediate stays below
    * 2^62, so the SAME arithmetic runs in DuckDB — whose BIGINT
    * multiplication ERRORS on overflow — and in Spark's wrapping
    * longs without divergence. This replaced xxhash64 throughout the
    * graph-ANN builders (init neighbors, ring groups/order, ρ-sample)
    * in round 15 so the ENTIRE NN-descent build + beam search became
    * a DuckDB-re-derivable pure function of the corpus (the
    * q_knn_ivf_exact precedent applied to q_knn_graph_nnd); xxhash64
    * has no DuckDB twin, which is what kept the graph family
    * rows-only through round 14. Nonlinear (unlike an LCG chain,
    * which stays affine in x under composition and would give
    * structured neighbor sets); inputs must be non-negative.
    */
  private[graft] def mix31(x: Column, salt: Long): Column = {
    val M = 2147483648L // 2^31
    val C = 73244475L   // lowbias-style multiplier, < 2^27
    val h0 = pmod(x + lit(salt), lit(M))
    val h1 = pmod(h0.bitwiseXOR(shiftrightunsigned(h0, 16)) * lit(C), lit(M))
    val h2 = pmod(h1.bitwiseXOR(shiftrightunsigned(h1, 16)) * lit(C), lit(M))
    h2.bitwiseXOR(shiftrightunsigned(h2, 16))
  }

  /** The two hash-ordered ring families (NSW's long-range shortcut
    * property without a global sort) — shared by both graph builders;
    * see [[graphAnnEdges]] for why a pure-proximity graph needs them.
    */
  private def ringEdges(e: DataFrame, n: Long): DataFrame = {
    val nGroups = math.max(1L, n / LongLinkGroup)
    (1 to 2).map { salt =>
      val grouped = e.select(col("vec_id"),
        pmod(mix31(col("vec_id"), salt), lit(nGroups)).as("grp"),
        mix31(col("vec_id"), salt + 100).as("ord"))
      val rw = Window.partitionBy(col("grp")).orderBy(col("ord"), col("vec_id"))
      grouped
        .withColumn("nxt", lead(col("vec_id"), 1).over(rw))
        .withColumn("wrap", first(col("vec_id")).over(
          rw.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("vec_id").as("src"),
          coalesce(col("nxt"), col("wrap")).as("dst"))
        .filter(col("src") =!= col("dst")) // 1-node group has no link
    }.reduce(_ unionByName _)
  }

  /** Viability ceiling for the BLOCKED proximity build: within-block
    * pair volume is ~N^1.5 and the round-12 probe DNF'd it at 1M
    * vectors (OOM at 8 GB driver; ~80 GB shuffle spill at 24 GB).
    * [[graphKnnAuto]] routes to [[nnDescentEdges]] above this (the
    * q_neardup_auto density-routing pattern), and [[graphAnnEdges]]
    * itself REFUSES to run past it — the fixture-scale tier must not
    * be pointable at a production corpus by accident. [[graphKnnOn]]
    * (q_knn_graph) stays blocked-only at every size so the query's
    * algorithm — and therefore its DuckDB oracle — is never
    * scale-dependent; the refusal is its guard rail.
    */
  val BlockedBuildMaxN = 200000L

  private[graft] def graphAnnEdges(spark: SparkSession, e: DataFrame,
      maxN: Long = BlockedBuildMaxN): DataFrame =
    graphAnnEdgesFor(e, denseCount(e, "graph ANN"), maxN)

  /** [[graphAnnEdges]] with the corpus size already counted — the
    * routed entry computes n once for the decision and the build.
    */
  private def graphAnnEdgesFor(e: DataFrame, n: Long, maxN: Long): DataFrame = {
    require(n <= maxN,
      s"blocked graph-ANN build is quadratic within blocks and DNFs " +
        s"past ~1M vectors (measured); n=$n exceeds the viability " +
        s"ceiling $maxN — use nnDescentEdges/graphKnnNnd (the " +
        s"linear-per-round NN-descent build) for corpora this size")
    val nCells = dedupCells(n)
    val centroids = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val bw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("c_id"))
    val blocks = e.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        sqDist(col("embedding"), col("c_emb")).as("d"))
      .withColumn("r", row_number().over(bw))
      .filter(col("r") <= 2)
      .select(col("vec_id"), col("embedding"), col("c_id").as("blk"))
    val a = blocks.as("a")
    val b = blocks.as("b")
    val pw = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    // mirror-pair build: join each unordered within-block pair ONCE
    // (vec_id <, half the join output and half the cosine work of the
    // =!= form), then explode both directions for the per-src top-M —
    // cosine is evaluated before the explode, so the mirror row reuses
    // the number instead of recomputing it (and the edge set is
    // bit-identical: multiplication commutes and the accumulation
    // order is the index order either way)
    val half = a.join(b,
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("x"), col("b.vec_id").as("y"),
        cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .dropDuplicates("x", "y") // a pair can share both blocks
    val proximity = half
      .select(explode(array(
          struct(col("x").as("src"), col("y").as("dst"), col("sim")),
          struct(col("y").as("src"), col("x").as("dst"), col("sim")))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.sim"))
      .withColumn("r", row_number().over(pw))
      .filter(col("r") <= GraphM)
      .select(col("src"), col("dst"))
    proximity.unionByName(ringEdges(e, n)).dropDuplicates("src", "dst")
  }

  /** Batch beam search over the navigable graph: every query starts at
    * the same [[GraphEntries]] deterministic entry nodes, then
    * [[GraphHops]] rounds of expand-score-prune — frontier nodes'
    * out-edges are followed, the neighbors scored against the query,
    * and the best [[GraphBeam]] of (beam ∪ neighbors) survive. Scores
    * only improve monotonically, so a fixed hop count needs no visited
    * set. Each round is two joins of the TINY beam (queries × beam
    * rows, broadcast) against the edge and corpus tables — the batch
    * restatement of HNSW's pointer chase, amortizing each edge-table
    * scan over the whole query batch. Beams are localCheckpoint'd per
    * round (driver-side loop is control flow only; beam data never
    * leaves the cluster — the [[graft.operators.Dedup.duplicateClusters]]
    * iteration pattern).
    *
    * Approximate with respect to the TRUE neighbors, but fully
    * DuckDB-oracle-gated since round 15: every hash in the build is
    * [[mix31]] (portable arithmetic), so the whole build + search is a
    * pure re-derivable function of the corpus and q_knn_graph /
    * q_knn_graph_nnd / q_knn_graph_auto all hash-match their oracles.
    * SimilaritySpec additionally holds recall@5 ≥ 0.8 on clustered
    * data and the structureless-fixture floor, and asserts approximate
    * sims never beat the exact top-1.
    */
  def graphKnn(spark: SparkSession, dir: String): DataFrame =
    graphSearch(Tables.embeddings(spark, dir),
      materializedGraphEdges(spark, dir))

  /** The blocked build at EVERY size (the require is its guard rail) —
    * q_knn_graph's algorithm must not depend on corpus size, or the
    * query would silently diverge from its DuckDB oracle above the
    * routing threshold. Use [[graphKnnAuto]] for the any-size entry.
    */
  def graphKnnOn(spark: SparkSession, e: DataFrame): DataFrame =
    graphSearch(e, graphAnnEdges(spark, e))

  /** Blocked edge table MATERIALIZED once per (session, corpus) and
    * shared by q_knn_graph and (below the routing ceiling)
    * q_knn_graph_auto — the [[graft.operators.Dedup.materializedPairs]]
    * pattern. At 100 TB nobody rebuilds an ANN graph per query batch:
    * the edge list (2 longs × N·M rows, tiny relative to the vectors)
    * is written ONCE and each search plans over the narrow read-back.
    * The build is deterministic (mix31-derived blocks, explicit
    * tiebreakers), so reading it back is value-identical to
    * recomputing — both registered entries stay hash-matched against
    * the same DuckDB oracle, and the round-15 double build (the auto
    * entry re-ran the whole ~N^1.5 construction q_knn_graph had just
    * run) is gone. Routing itself is certified by spec:
    * Round15OpsSpec proves auto == blocked below the ceiling and
    * SimilaritySpec proves the blocked builder refuses above it.
    */
  private[graft] def materializedGraphEdges(spark: SparkSession,
      dir: String, precountedN: Option[Long] = None): DataFrame = {
    val path = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges", dir)
    graft.sources.Scratch.materializeOnce(path) {
      // a caller that already sized the corpus (the auto router)
      // passes n through — the "corpus counted ONCE" contract
      val e = Tables.embeddings(spark, dir)
      val n = precountedN.getOrElse(denseCountDir(spark, dir, "graph ANN"))
      graphAnnEdgesFor(e, n, BlockedBuildMaxN)
        .write.mode("overwrite").parquet(path)
    }
    graft.sources.Scratch.readParquetOnce(spark, path).select(col("src"), col("dst"))
  }

  def graphKnnAuto(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "graph ANN routing")
    val edges =
      if (n <= BlockedBuildMaxN) materializedGraphEdges(spark, dir, Some(n))
      else nnDescentEdgesFor(spark, e, n, NndRounds, None)
    graphSearch(e, edges)
  }

  /** Auto-routed production entry (the q_neardup_auto pattern): the
    * block-guaranteed proximity build up to [[BlockedBuildMaxN]]
    * vectors, NN-descent beyond it — safe at any corpus size (the
    * blocked build alone DNF'd the 1M probe). The corpus is counted
    * ONCE here and the n flows into whichever builder runs. At gate
    * scale the router picks the blocked build, so the registered
    * q_knn_graph_auto shares q_knn_graph's oracle row-for-row — the
    * routing decision itself is what the gate then certifies. The
    * dir-based [[graphKnnAuto]] additionally shares q_knn_graph's
    * [[materializedGraphEdges]] table below the ceiling instead of
    * rebuilding; this On-variant (arbitrary frame, no corpus key to
    * materialize under) always builds fresh.
    */
  def graphKnnAutoOn(spark: SparkSession, e: DataFrame): DataFrame = {
    val n = denseCount(e, "graph ANN routing")
    val edges =
      if (n <= BlockedBuildMaxN) graphAnnEdgesFor(e, n, BlockedBuildMaxN)
      else nnDescentEdgesFor(spark, e, n, NndRounds, None)
    graphSearch(e, edges)
  }

  /** NN-descent variant: same beam search over edges built by
    * iterative neighbor-of-neighbor refinement ([[nnDescentEdges]])
    * instead of the blocked ~N^1.5 construction.
    */
  def graphKnnNnd(spark: SparkSession, dir: String): DataFrame = {
    // corpus counted through the per-corpus memo (the dir entry's
    // privilege); the On-variant below keeps the per-call probe
    val e = Tables.embeddings(spark, dir)
    graphSearch(e, nnDescentEdgesFor(spark, e,
      denseCountDir(spark, dir, "NN-descent"), NndRounds, None))
  }

  def graphKnnNndOn(spark: SparkSession, e: DataFrame,
      rho: Option[Int] = None): DataFrame =
    graphSearch(e, nnDescentEdges(spark, e, rho = rho))

  /** INCREMENTAL NSW graph maintenance — the classic navigable-graph
    * INSERT restated for a batch engine: each new vector BEAM-SEARCHES
    * the STORED edge table for its [[GraphM]] nearest reachable nodes
    * (search cost only — one [[beamTop]] pass with the batch as the
    * query set, never a rebuild of the blocked/NND construction) and
    * joins the graph as those M out-edges plus their M reverse edges
    * (the backlinks that make the new node REACHABLE to future
    * searches and future inserts). Ingest cost is the insert search —
    * O(batch · beam · hops) joins against edge and corpus tables —
    * flat in the stored graph's size (ScalingProbe delta_knn_graph),
    * where the blocked rebuild is ~N^1.5 and NND is R·O(N·M²).
    *
    * The serving search then runs over stored ∪ inserted edges with
    * the corpus including the batch. Fully deterministic (the insert
    * beam is the same oracle-locked arithmetic as the serving beam),
    * so the whole maintain-then-search composition is re-derived by
    * the DuckDB twin — Lloyd-free, the q_knn_graph chain restricted to
    * the id-prefix base plus an unrolled insert beam — and the graded
    * entry sits under the full hash gate. Drift trade, stated plainly:
    * inserted nodes link only to what the stored graph could REACH at
    * insert time (no blocked-build completeness over new∪old), so
    * recall drifts as batches accumulate; Round19OpsSpec floors it on
    * the clustered fixture, and the production answer is periodic
    * rebuilds — the deltaIvfKnn refit note, graph edition.
    */
  def deltaGraphKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (stored, inserted) = deltaGraphEnsureTables(spark, dir, e)
    graphSearch(e, stored.unionByName(inserted))
  }

  /** Materialize (once per corpus) and read back the delta graph's two
    * stored tables — the base edge table written at base ingest and
    * the batch's beam-selected insert commit (the deltaIvfKnn
    * discipline: the insert beam is paid once per INGEST, not once per
    * query or per consumer; serving and compaction both read the
    * commits back).
    */
  private def deltaGraphEnsureTables(spark: SparkSession, dir: String,
      e: DataFrame): (DataFrame, DataFrame) = {
    val n = denseCountDir(spark, dir, "delta graph ANN")
    val b = deltaBaseCount(n)
    val base = e.filter(col("vec_id") < b)
    val edgesPath = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_base", dir)
    graft.sources.Scratch.materializeOnce(edgesPath) {
      graphAnnEdgesFor(base, b, BlockedBuildMaxN)
        .write.mode("overwrite").parquet(edgesPath)
    }
    val stored = graft.sources.Scratch.readParquetOnce(spark, edgesPath).select(col("src"), col("dst"))
    val insertPath = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_batch", dir)
    graft.sources.Scratch.materializeOnce(insertPath) {
      deltaGraphInsertEdges(base, stored, e.filter(col("vec_id") >= b))
        .write.mode("overwrite").parquet(insertPath)
    }
    (stored, graft.sources.Scratch.readParquetOnce(spark, insertPath).select(col("src"), col("dst")))
  }

  /** The graph lifecycle's CLOSING stage — COMPACTION, the
    * [[deltaIvfKnnCompacted]] discipline on the edge table: insert
    * commits accumulate one small file set per ingest until a
    * compaction folds base ∪ inserts into ONE stored edge table, off
    * the query path; edge VALUES never change, only file layout, so
    * the graded entry must equal [[deltaGraphKnn]] row-for-row and
    * shares the delta-graph oracle — the gate certifies the fold as a
    * pure layout change. Serving then reads a single edge scan (the
    * beam's per-hop join hits one table instead of a union).
    */
  def deltaGraphKnnCompacted(spark: SparkSession, dir: String): DataFrame = {
    // ensure the maintained TABLES exist (shared materialization with
    // q_delta_knn_graph — a compaction runs AFTER ingests) without
    // paying that entry's serving beam: the ensure helper touches
    // only the stored/insert commits
    val e = Tables.embeddings(spark, dir)
    val (stored, inserted) = deltaGraphEnsureTables(spark, dir, e)
    val compactPath = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_compacted", dir)
    graft.sources.Scratch.materializeOnce(compactPath) {
      stored.unionByName(inserted)
        .write.mode("overwrite").parquet(compactPath)
    }
    graphSearch(e, graft.sources.Scratch.readParquetOnce(spark, compactPath))
  }

  /** MULTI-INGEST compounding for the NSW graph — the ORDER-DEPENDENT
    * case, which is why it is the strongest chained proof: unlike the
    * stateless IVF assignment, insert 2's beam runs over the edges
    * insert 1 created (stored ∪ insert-1 backlinks), so
    * insert(insert(G0, b1), b2) is NOT trivially a union — it is a
    * genuine two-step recurrence the DuckDB twin re-derives as two
    * chained unrolled insert beams. Base = 6/10 id-prefix (blocked
    * build), ingest 1 = ids [0.6n, 0.8n) beamed over the base edges,
    * ingest 2 = ids [0.8n, n) beamed over base ∪ insert-1 edges; each
    * commit is its own edge file set, the base never reopened. Serving
    * runs the shared beam over all three edge sets with the full
    * corpus, under the full hash gate.
    */
  def delta2GraphKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "delta2 graph ANN")
    val b0 = n * 6 / 10
    val b1 = deltaBaseCount(n) // 8/10
    val base = e.filter(col("vec_id") < b0)
    val e0Path = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_base6", dir)
    graft.sources.Scratch.materializeOnce(e0Path) {
      graphAnnEdgesFor(base, b0, BlockedBuildMaxN)
        .write.mode("overwrite").parquet(e0Path)
    }
    val e0 = graft.sources.Scratch.readParquetOnce(spark, e0Path).select(col("src"), col("dst"))
    val ins1Path = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_ins1", dir)
    graft.sources.Scratch.materializeOnce(ins1Path) {
      deltaGraphInsertEdges(base, e0,
          e.filter(col("vec_id") >= b0 && col("vec_id") < b1))
        .write.mode("overwrite").parquet(ins1Path)
    }
    val e1 = e0.unionByName(
      graft.sources.Scratch.readParquetOnce(spark, ins1Path).select(col("src"), col("dst")))
    val ins2Path = graft.sources.Scratch.corpusDir(spark, "graph_ann_edges_ins2", dir)
    graft.sources.Scratch.materializeOnce(ins2Path) {
      // insert 2 beams over the graph AS INSERT 1 LEFT IT: reachable
      // nodes now include ingest 1's vectors via their backlinks
      deltaGraphInsertEdges(e.filter(col("vec_id") < b1), e1,
          e.filter(col("vec_id") >= b1))
        .write.mode("overwrite").parquet(ins2Path)
    }
    graphSearch(e, e1.unionByName(
      graft.sources.Scratch.readParquetOnce(spark, ins2Path).select(col("src"), col("dst"))))
  }

  /** Sampled inserted nodes measured by the drift router, and the
    * recall floor below which it escalates to a refit. 16 queries ×
    * one beam + one broadcast scan: the decision costs O(sample ·
    * corpus) — o(refit) at any size (the blocked rebuild is ~N^1.5,
    * NND is R·O(N·M²)), and FLAT in the number of accumulated ingests,
    * which is what the router exists to price.
    */
  val DriftSampleQueries = 16
  val DriftRecallFloor = 0.7

  /** DRIFT-MEASURED refit router for the delta graph — the
    * [[graft.operators.Multimodal.routeWide]] discipline applied to
    * ANN maintenance: the delta insert's documented drift trade
    * (inserted nodes link only to what the stored graph could reach at
    * insert time) is not guessed from batch counts but MEASURED — a
    * deterministic sample of inserted nodes runs the serving beam over
    * the maintained edges AND an exact broadcast scan, and the
    * sampled recall@[[K]] decides: ≥ [[DriftRecallFloor]] serves the
    * delta-maintained graph (the gate-certified [[deltaGraphKnn]]
    * result), below it the router LOUDLY escalates to a full rebuild
    * (the size-routed [[graphKnnAutoOn]] builder — the "periodic
    * refit" answer, fired exactly when the measurement says the graph
    * has drifted past usefulness rather than on a calendar). The
    * fixture's single-batch ingest measures ~1.0 recall, so the graded
    * entry exercises the serve-delta arm and shares q_delta_knn_graph's
    * oracle; Round20OpsSpec drives an adversarially-drifted fixture
    * through the same router and proves it escalates.
    */
  def graphKnnDriftRouted(spark: SparkSession, dir: String,
      expectArm: Option[String] = None): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (stored, inserted) = deltaGraphEnsureTables(spark, dir, e)
    graphKnnDriftRoutedOn(spark, e, stored.unionByName(inserted), expectArm,
      Some(denseCountDir(spark, dir, "drift-routed graph ANN")))
  }

  /** Router body over an explicit maintained edge table — the spec's
    * entry point for the drifted fixture.
    */
  private[graft] def graphKnnDriftRoutedOn(spark: SparkSession,
      e: DataFrame, maintainedEdges: DataFrame,
      expectArm: Option[String] = None,
      precountedN: Option[Long] = None): DataFrame = {
    val edges = maintainedEdges.localCheckpoint()
    val n = precountedN.getOrElse(denseCount(e, "drift-routed graph ANN"))
    val b = deltaBaseCount(n)
    val recall = measuredInsertRecall(e, edges, b,
      math.min(DriftSampleQueries.toLong, n - b))
    assertRoutedArm("graph", recall, expectArm)
    if (recall >= DriftRecallFloor) {
      System.err.println(f"[drift-router] sampled insert recall@$K = " +
        f"$recall%.3f >= $DriftRecallFloor — serving the delta-maintained graph")
      graphSearch(e, edges)
    } else {
      System.err.println(f"[drift-router] sampled insert recall@$K = " +
        f"$recall%.3f < $DriftRecallFloor — ESCALATING to a full refit")
      graphKnnAutoOn(spark, e)
    }
  }

  /** The measured statistic: fraction of the sampled inserted nodes'
    * TRUE top-[[K]] neighbors the serving beam finds through the
    * maintained edges. Both sides deterministic (the beam is the
    * serving arithmetic; the exact side is one broadcast scan), so
    * the routing decision is reproducible run-to-run.
    */
  private[graft] def measuredInsertRecall(e: DataFrame, edges: DataFrame,
      b: Long, nSample: Long): Double = {
    if (nSample <= 0) return 1.0
    val sample = e.filter(col("vec_id") >= b && col("vec_id") < b + nSample)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    val approx = beamTop(e, sample, edges, K)
      .select(col("q_id"), col("n_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val exact = e.select(col("vec_id").as("n_id"), col("embedding"))
      .join(broadcast(sample), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("n_id"))
    recallOf(exact, approx)
  }

  /** RETRACTION — the NSW graph under DELETION, the matrix's last
    * cell: tombstoned nodes must stop being RETURNED and stop being
    * TRAVERSABLE (takedown compliance), so serving runs over the
    * stored ∪ inserted edges with every edge touching a tombstone
    * FILTERED OUT — one predicate on the narrow edge scan, the graph
    * never rebuilt (deleted nodes' edges are what made them
    * reachable; dropping both directions removes them from every beam
    * without touching any surviving edge). The structural cost is
    * reduced connectivity — surviving nodes whose best paths ran
    * through deleted hubs lose recall — and that is deliberately NOT
    * repaired here: the drift router ([[graphKnnDriftRouted]]) is the
    * component that MEASURES when accumulated deletions (like
    * accumulated inserts) have degraded the graph past its floor and
    * prices the rebuild. Oracle: the delta-graph chain (base build +
    * insert beam over the pre-deletion graph — history is immutable)
    * with the serving beam running over the tombstone-filtered edge
    * set. Fixture tombstones: vec_id ≡ 7 (mod 10) excluding the
    * entry/query ids.
    */
  def retractGraphKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (stored, inserted) = deltaGraphEnsureTables(spark, dir, e)
    def keep(c: Column): Column = c % 10 =!= 7 || c < NumQueries
    graphSearch(e, stored.unionByName(inserted)
      .filter(keep(col("src")) && keep(col("dst"))))
  }

  /** In-memory delta-graph body for specs and probes — builds the base
    * edge table fresh instead of reading the stored one;
    * value-identical to [[deltaGraphKnn]] (the build is deterministic).
    */
  private[graft] def deltaGraphKnnOn(spark: SparkSession, e: DataFrame): DataFrame = {
    val n = denseCount(e, "delta graph ANN")
    val b = deltaBaseCount(n)
    val base = e.filter(col("vec_id") < b)
    val stored = graphAnnEdgesFor(base, b, BlockedBuildMaxN).localCheckpoint()
    graphSearch(e,
      stored.unionByName(
        deltaGraphInsertEdges(base, stored, e.filter(col("vec_id") >= b))))
  }

  /** The insert's link selection: batch vectors beam-search the stored
    * graph (corpus = the BASE vectors the stored edges point into) for
    * their top-[[GraphM]] links; emitted as both edge directions.
    */
  private[graft] def deltaGraphInsertEdges(base: DataFrame,
      storedEdges: DataFrame, batch: DataFrame): DataFrame = {
    val links = beamTop(base,
      batch.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      storedEdges, GraphM)
    links.select(explode(array(
        struct(col("q_id").as("src"), col("n_id").as("dst")),
        struct(col("n_id").as("src"), col("q_id").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** Batch beam search over an arbitrary prebuilt edge table — the
    * shared serving half of both graph-ANN variants.
    */
  private[graft] def graphSearch(e: DataFrame, rawEdges: DataFrame): DataFrame = {
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    beamTop(e, queries, rawEdges, K)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The beam core shared by the serving search ([[graphSearch]]) and
    * the delta NSW INSERT ([[deltaGraphInsertEdges]], which link-
    * selects with topN = [[GraphM]] instead of K): entries crossed
    * with the query set, [[GraphHops]] expand-score-prune rounds, then
    * the per-query top-`topN`. One implementation holds the
    * oracle-locked arithmetic (scores, tie-breaks, dedup) for both
    * consumers.
    */
  private def beamTop(e: DataFrame, queries: DataFrame,
      rawEdges: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = rawEdges.persist(StorageLevel.MEMORY_AND_DISK)
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val score = cosine(col("q_emb"), col("embedding")).as("sim")
    var beam = corpus.filter(col("n_id") < GraphEntries)
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("n_id"), score)
      .localCheckpoint()
    val rankW = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    for (_ <- 1 to GraphHops)
      beam = beamExpand(edges, corpus, queries, beam).localCheckpoint()
    edges.unpersist()
    corpus.unpersist()
    beam.filter(col("q_id") =!= col("n_id"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .filter(col("rank") <= topN)
  }

  val NndRounds = 4 // neighbor-of-neighbor refinement rounds
  val ConvergenceCheckMinN = 100000L // engage NN-descent early-exit above this
  val NndRhoPct = 50 // ρ-sample percentage per proposal side above the gate

  /** NN-descent neighbor-graph build (Dong et al., WWW'11): start from
    * [[GraphM]] deterministic pseudo-random out-neighbors per node,
    * then each round proposes neighbors-of-neighbors as candidates,
    * scores only the pairs never scored before, and keeps each node's
    * top-[[GraphM]] — the EXPONENT fix over the blocked ~N^1.5 build:
    * every round is O(N·M²) candidate rows through hash-shuffle joins
    * (no centroid cross join, no within-block quadratic term), so
    * doubling the corpus doubles the round cost. Rounds are capped at
    * `rounds` with the standard convergence early-exit (a round
    * contributing < N/100 fresh pairs ends the loop — deterministic,
    * since candidate sets are; engaged only above
    * [[ConvergenceCheckMinN]], where a skipped round repays the
    * per-round count). The trade is R
    * materialized iterations and probabilistic (not block-guaranteed)
    * proximity coverage; SimilaritySpec floors recall on the same
    * clustered fixture as the blocked build. Long-range ring families
    * are unioned exactly as in [[graphAnnEdges]] — NN-descent
    * converges toward pure proximity, which beam search cannot cross
    * alone on clustered data.
    *
    * ρ-SAMPLING (Dong et al. §2.3, the incremental-search trick): above
    * the same [[ConvergenceCheckMinN]] gate, each round joins only a
    * deterministic ρ = [[NndRhoPct]]% hash-sample of each side's
    * neighbor lists — per-round candidate volume drops from M² to
    * (ρM)² per node (4× at ρ=0.5) while successive rounds sample
    * DIFFERENT subsets (the hash is salted by round), so coverage
    * accumulates across rounds instead of being lost. This bounds the
    * super-linear tail the accumulated visited-set anti-join and
    * candidate dedup put on large corpora (the 1M probe measured
    * ~N^1.27 unsampled). Below the gate nothing is sampled — the
    * fixture gate results and plan are untouched; `rho` forces a
    * percentage explicitly (SimilaritySpec floors the SAMPLED build's
    * recall on the clustered fixture this way). Deterministic either
    * way — the sample is a pure hash of (src, dst, round).
    *
    * Lineage per round is truncated with
    * localCheckpoint (the [[graft.operators.Dedup.clusterLabels]]
    * iteration pattern); the scored-pair accumulator is the standard
    * NN-descent "visited" set, carried as data, never on the driver.
    */
  private[graft] def nnDescentEdges(spark: SparkSession, e: DataFrame,
      rounds: Int = NndRounds, rho: Option[Int] = None): DataFrame =
    nnDescentEdgesFor(spark, e, denseCount(e, "NN-descent"), rounds, rho)

  private def nnDescentEdgesFor(spark: SparkSession, e: DataFrame, n: Long,
      rounds: Int, rho: Option[Int]): DataFrame = {
    // NOT persisted: an A/B at sf0.1 measured the pinned form SLOWER
    // (cache build + InMemoryRelation scans beat by the plain columnar
    // re-scan of the small vector file; q_knn_graph_nnd 5.5→9.2 s with
    // the pin) — the 2R+2 re-scans are cheaper than the cache at any
    // size where the scan is already wide, and beamTop's serving pin
    // covers the one consumer measured to benefit
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding"))
    // Pair and corpus frames at production N must never be elected for
    // broadcast: AQE's runtime size estimate sits below its threshold
    // for compressed two-long pair rows (and mis-sizes checkpointed
    // inputs), but the in-memory hash relation is GBs — the 1M-vector
    // round-12 probe OOM'd an 8 GB driver twice this way (once on the
    // visited-set anti-join, once inside scorePairs). Above the same
    // gate as the convergence check, force the shuffle strategy on
    // every join side that scales with N; below it the broadcasts are
    // genuinely small and the gate/bench plans are untouched.
    val bigCorpus = n >= ConvergenceCheckMinN
    def pairSide(df: DataFrame): DataFrame =
      if (bigCorpus) df.hint("merge") else df
    def scorePairs(cand: DataFrame): DataFrame =
      pairSide(cand)
        .join(pairSide(corpus.select(col("n_id").as("x"), col("embedding").as("ex"))), "x")
        .join(pairSide(corpus.select(col("n_id").as("y"), col("embedding").as("ey"))), "y")
        .select(col("x"), col("y"), cosine(col("ex"), col("ey")).as("sim"))
    // deterministic pseudo-random init: GraphM hash-derived neighbors
    // per node, canonicalized x < y so each unordered pair scores once
    val init = e.select(col("vec_id"),
        explode(array((0 until GraphM).map(j =>
          pmod(mix31(col("vec_id"), j * 31 + 7), lit(n))): _*)).as("nbr"))
      .filter(col("vec_id") =!= col("nbr"))
      .select(least(col("vec_id"), col("nbr")).as("x"),
        greatest(col("vec_id"), col("nbr")).as("y"))
      .distinct()
    var scored = scorePairs(init).localCheckpoint()
    val pw = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    def topM: DataFrame = scored
      .select(explode(array(
          struct(col("x").as("src"), col("y").as("dst"), col("sim")),
          struct(col("y").as("src"), col("x").as("dst"), col("sim")))).as("p"))
      .select(col("p.src"), col("p.dst"), col("p.sim"))
      .withColumn("r", row_number().over(pw))
      .filter(col("r") <= GraphM)
      .select(col("src"), col("dst"))
    var round = 0
    var converged = false
    // convergence counting is itself a per-round job; below this size
    // the capped rounds are cheaper than the bookkeeping (measured
    // ~2s/round-set at 5k-40k for zero skipped rounds), so the check
    // engages only where a skipped O(N·M²) round repays it
    val checkConvergence = n >= ConvergenceCheckMinN
    var prevTotal = if (checkConvergence) scored.count() else 0L
    // ρ-sample: keep an edge for THIS round's proposal join iff its
    // (src, dst, round)-salted hash lands under the percentage —
    // different rounds sample different subsets, so missed proposals
    // get another chance next round (Dong et al.'s trade)
    val rhoPct = rho.getOrElse(if (bigCorpus) NndRhoPct else 100)
    def sampleEdges(df: DataFrame, r: Int, salt: Int): DataFrame =
      if (rhoPct >= 100) df
      else df.filter(pmod(
        mix31(mix31(col("src"), r * 131 + salt) + col("dst"), 97), lit(100)) < rhoPct)
    while (round < rounds && !converged) {
      // undirected current-neighbor view → neighbor-of-neighbor
      // proposals; anti-join drops pairs already scored (the visited
      // set), so each round pays cosines only for NEW candidates.
      // topM is pinned EAGERLY per round (round 22): it is referenced
      // through FOUR dataflow branches (both union directions below,
      // then both sides of the proposal self-join), and each branch
      // otherwise re-ran the explode + top-M rank window over the
      // scored blocks — the lexicalCosineOn lazy-cache hazard, NND
      // edition. One checkpoint job per round replaces up to three
      // duplicate window stages; edge values are unchanged (pinning
      // moves no arithmetic).
      val tm = topM.localCheckpoint()
      val und = tm.unionByName(
          tm.select(col("dst").as("src"), col("src").as("dst")))
        .dropDuplicates("src", "dst")
      val cand = sampleEdges(und, round, 1).as("t1")
        .join(pairSide(sampleEdges(und, round, 2)
            .select(col("src").as("mid"), col("dst").as("c")))
          .as("t2"), col("t1.dst") === col("t2.mid"))
        .filter(col("t1.src") =!= col("t2.c"))
        .select(least(col("t1.src"), col("t2.c")).as("x"),
          greatest(col("t1.src"), col("t2.c")).as("y"))
        .distinct()
        .join(pairSide(scored.select(col("x"), col("y"))), Seq("x", "y"),
          "left_anti")
      scored = scored.unionByName(scorePairs(cand)).localCheckpoint()
      // NN-descent's standard termination: stop once a round proposes
      // almost nothing new (< n/100 fresh pairs). The delta comes from
      // a narrow count over the blocks the checkpoint just
      // materialized (no extra materialization of the fresh rows), and
      // at scale a skipped round saves the full O(N·M²) pass.
      if (checkConvergence) {
        val total = scored.count()
        converged = total - prevTotal < math.max(1L, n / 100)
        prevTotal = total
      }
      round += 1
    }
    topM.unionByName(ringEdges(e, n)).dropDuplicates("src", "dst")
  }

  /** One expand-score-prune round of the beam search, factored out so
    * the plan audit can assert the join sides on the pre-checkpoint
    * dataflow (the loop checkpoints each round's result).
    */
  private[graft] def beamExpand(edges: DataFrame, corpus: DataFrame,
      queries: DataFrame, beam: DataFrame): DataFrame = {
    val score = cosine(col("q_emb"), col("embedding")).as("sim")
    val rankW = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    // ONE data-keyed exchange per hop (guide §2.4; round 22 — the old
    // shape paid three: a (q_id, n_id) dedup of the scored neighbors, a
    // second (q_id, n_id) dedup of beam ∪ neighbors, then the rank
    // window's hash(q_id)): candidates = beam ∪ followed edges are
    // UNIONED FIRST as bare (q_id, n_id) pairs, repartitioned by q_id
    // once, and every downstream step reuses that partitioning — the
    // pair dedup (hash(q_id) co-locates every (q_id, n_id) duplicate),
    // the per-query rank window, and the two joins (corpus/queries ride
    // as broadcast/size-decided sides). Values are IDENTICAL: the hop's
    // output was always "top-GraphBeam by (sim desc, n_id) over the
    // distinct (q_id, n_id) of beam ∪ neighbors", and re-scoring a
    // surviving beam pair evaluates the same deterministic cosine over
    // the same rows the pair's stored sim came from (beam ∩ neighbors
    // duplicates previously carried that identical sim on both union
    // sides). Extra work: |beam| ≤ queries × GraphBeam re-scored
    // cosines per hop — O(query batch), nothing that scales with the
    // corpus, against one full exchange of the candidate set saved
    // twice.
    val neighbors = edges
      .join(broadcast(beam.select(col("q_id"), col("n_id").as("src"))), "src")
      .select(col("q_id"), col("dst").as("n_id"))
    beam.select(col("q_id"), col("n_id"))
      .unionByName(neighbors)
      .repartition(col("q_id"))
      .dropDuplicates("q_id", "n_id")
      .join(corpus, "n_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("n_id"), score)
      .withColumn("r", row_number().over(rankW))
      .filter(col("r") <= GraphBeam)
      .drop("r")
  }

  /** Quantized two-stage kNN: the int8 serving path that closes the
    * quantize→search loop. Stage 1 scores EVERY candidate with the
    * integer dot product over the packed int8 table ([[int8Pack]] —
    * 64 bytes + scale + norm per vector, the 4× layout a 100 TB
    * serving tier keeps resident where float32 would not fit) and
    * keeps the top [[QuantRerank]] per query; stage 2 re-ranks only
    * that short list with exact float cosine. Standard quantized-ANN
    * shape: the cheap integer kernel does the bulk elimination, the
    * expensive exact math touches `rerank` rows per query.
    *
    * Ranking key: scale_n · int8dot / ‖n‖ — per-query factors (query
    * scale and norm) are constant within a query's ranking and drop;
    * corpus norms are full-precision (stored alongside the bytes, the
    * standard layout). Approximate vs BRUTE FORCE (int8 rounding can
    * reorder near-ties below the rerank horizon; recall floored in
    * SimilaritySpec) but DETERMINISTIC end-to-end — every stage is
    * exact arithmetic (Math.round = floor(x+0.5), integer dot, double
    * divisions), so since round 12 the full pipeline sits under the
    * DuckDB oracle gate like q_knn_ivf_exact.
    */
  val QuantRerank = 20

  def quantizedKnn(spark: SparkSession, dir: String): DataFrame =
    quantizedKnnOn(spark, Tables.embeddings(spark, dir))

  def quantizedKnnOn(spark: SparkSession, e: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.{int8Dot, int8Pack}
    val scaleCol = aggregate(col("embedding"), lit(0.0),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    val normCol = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val quant = e
      .withColumn("scale", scaleCol)
      .select(col("vec_id").as("n_id"),
        int8Pack(col("embedding"), col("scale")).as("qb"),
        col("scale"), normCol.as("nrm"))
    val qQuant = quant.filter(col("n_id") < NumQueries)
      .select(col("n_id").as("q_id"), col("qb").as("q_qb"))
    val coarse = quant.join(broadcast(qQuant), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (col("scale") * int8Dot(col("q_qb"), col("qb")).cast("double") /
          when(col("nrm") === 0.0, lit(1.0)).otherwise(col("nrm"))).as("qsim"))
    val cw = Window.partitionBy(col("q_id")).orderBy(col("qsim").desc, col("n_id"))
    val shortList = coarse.withColumn("r", row_number().over(cw))
      .filter(col("r") <= QuantRerank)
      .select(col("q_id"), col("n_id"))
    val full = e.select(col("vec_id").as("n_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rw = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    shortList.join(full, "n_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-indexed int8 serving — the standard IVF-PQ-style composition
    * and the fix for [[quantizedKnnOn]]'s one deliberate weakness: its
    * coarse pass scores EVERY corpus vector (int8 makes the scan 4×
    * cheaper, not sublinear). Here the coarse int8-dot runs only
    * inside each query's probed k-means cells, over a MATERIALIZED
    * packed layout (the corpus written partitioned by cell, scanned
    * with plan-time partition pruning — non-probed cells' files are
    * never opened), and the exact full-precision rerank of the int8
    * top-[[QuantRerank]] is unchanged. At 100 TB: the pack+write runs
    * once at ingest; a query batch touches probes/cells of the data
    * AND moves 4×-compressed bytes through the coarse scorer — the
    * two savings compose. Candidate pool is identical to [[ivfKnnOn]]
    * (same deterministic √N-cell Lloyd quantizer), so result quality
    * differs from q_knn_ivf only when int8 rounding pushes a true
    * pool-neighbor out of the quantized shortlist (SimilaritySpec
    * floors recall vs the exact-rerank IVF at 0.9). Every stage is a
    * pure function of the data, so the tier sits under the full DuckDB
    * oracle gate — the [[quantizedIvfKnnExact]] pipeline at production
    * cell sizing.
    */
  def quantizedIvfKnn(spark: SparkSession, dir: String, probes: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (corpus, probeCells0) = ivfAssignments(spark, e, probes,
      Some(denseCountDir(spark, dir, "ivf sizing")))
    quantizedIvfSearch(spark, dir, e, corpus, probeCells0, "ivf_quant_layout")
  }

  /** The shared IVF-int8 serving pipeline behind [[quantizedIvfKnn]]
    * (√N Lloyd cells) and [[quantizedIvfKnnExact]] (fixed
    * [[IvfExactCells]]): pack the tagged corpus to int8, write
    * partitioned by cell, coarse int8-dot inside the partition-pruned
    * probed cells only, exact full-precision rerank of the
    * top-[[QuantRerank]] shortlist.
    */
  private def quantizedIvfSearch(spark: SparkSession, dir: String,
      e: DataFrame, corpus: DataFrame, probeCells0: DataFrame,
      scratch: String): DataFrame = {
    import graft.functions.VectorFunctions.{int8Dot, int8Pack}
    // tiny (queries × probes rows), consumed thrice (cell collect,
    // query pack, coarse join) with the corpus pass in its lineage
    val probeCells = probeCells0.localCheckpoint()
    val scaleCol = aggregate(col("embedding"), lit(0.0),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    val normCol = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val packed = corpus
      .withColumn("scale", scaleCol)
      .select(col("n_id"), int8Pack(col("embedding"), col("scale")).as("qb"),
        col("scale"), normCol.as("nrm"), col("cell"))
    // per-corpus write-once + consolidated files + memoized listing —
    // the ivfKnnMaterialized round-22 treatment (the packed table is a
    // pure function of the corpus; the old form re-wrote it per call)
    val layoutDir = graft.sources.Scratch.corpusDir(spark, scratch, dir)
    graft.sources.Scratch.materializeOnce(layoutDir) {
      writeConsolidated(packed, "cell", layoutDir)
    }
    // probed cells as plan-time pruning literals — queries × probes
    // ints, probe METADATA (the ivfKnnMaterialized convention)
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val layout = graft.sources.Scratch.readParquetOnce(spark, layoutDir)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    // query-side pack: the query's own scale/norm are constant per
    // q_id, so dropping them from qsim is rank-invariant (same
    // shortcut quantizedKnnOn takes)
    val qScale = aggregate(col("q_emb"), lit(0.0),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    val qq = probeCells.select(col("q_id"), col("cell"),
      int8Pack(col("q_emb"), qScale).as("q_qb"))
    val coarse = layout.join(broadcast(qq), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (col("scale") * int8Dot(col("q_qb"), col("qb")).cast("double") /
          when(col("nrm") === 0.0, lit(1.0)).otherwise(col("nrm"))).as("qsim"))
    val cw = Window.partitionBy(col("q_id")).orderBy(col("qsim").desc, col("n_id"))
    val shortList = coarse.withColumn("r", row_number().over(cw))
      .filter(col("r") <= QuantRerank)
      .select(col("q_id"), col("n_id"))
    // exact rerank unchanged — full-precision vectors for the
    // shortlist only
    val full = e.select(col("vec_id").as("n_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rw = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    shortList.join(full, "n_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The IVF-PQ-style composition at the fixed [[IvfExactCells]] cell
    * count: int8 coarse scoring inside each query's probed cells of a
    * materialized packed layout — [[quantizedIvfKnn]]'s exact shape
    * and quantizer ([[ivfExactAssignments]]), differing only in the
    * literal-k sizing; every stage (cells, probe plan, int8 pack via
    * Math.round = floor(x+0.5), integer dot, exact rerank) is a pure
    * function DuckDB re-derives. The two 100 TB savings still compose: probes/cells of
    * the data is opened (partition pruning, plan-asserted) and the
    * coarse scorer moves 4×-compressed bytes. Recall floored vs
    * [[ivfKnnExact]] in SimilaritySpec (identical candidate pool; they
    * differ only where int8 rounding pushes a true pool-neighbor out
    * of the quantized top-[[QuantRerank]]).
    */
  def quantizedIvfKnnExact(spark: SparkSession, dir: String,
      probes: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (corpus, probeCells0) = ivfExactAssignments(spark, e, probes)
    quantizedIvfSearch(spark, dir, e, corpus, probeCells0, "ivf_exact_quant_layout")
  }

  // ——— product quantization (PQ) ———

  /** Subspaces (m) and per-subspace codebook size (k') for [[pqKnn]].
    * 8 × 16 over the 64-dim fixture = 8-dim subvectors, 4 bits/code —
    * 64 bytes of float32 compress to 8 nibbles (64×!). Production
    * sizes m·log2(k') to the byte budget (the classic 8-bit × m=dim/2
    * of Jégou et al.); the pipeline below is size-agnostic.
    */
  val PqSubspaces = 8
  val PqCodebook = 16
  /** ADC shortlist depth — deeper than the int8 tier's
    * [[QuantRerank]]: 4-bit codes rank more coarsely than int8 dots,
    * so true neighbors sit further down the ADC order (recall@5 was
    * 0.56 at depth 20 on the planted-cluster corpus, ≥0.9 at 64).
    * Still O(1) per query — the exact rerank touches 64 rows.
    */
  val PqRerank = 64

  def pqKnn(spark: SparkSession, dir: String): DataFrame =
    pqKnnOn(spark, Tables.embeddings(spark, dir))

  /** PRODUCT-QUANTIZED kNN under the full oracle gate — the remaining
    * classic of the ANN compression family (alongside scalar int8 and
    * IVF): split each vector into [[PqSubspaces]] subvectors, learn a
    * [[PqCodebook]]-centroid codebook PER SUBSPACE with the gated
    * fixed-point Lloyd ([[lloydRounds]] — deterministic, so the whole
    * tier grades like [[ivfKnnExact]]), encode every vector as its m
    * nearest-centroid codes, and score queries by ADC (asymmetric
    * distance): Σ_j ‖q_j − cent_{j,code_j(x)}‖², folded in subspace
    * order (the [[embeddingPoolOn]] order-parity rule). The
    * ADC top-[[QuantRerank]] shortlist is reranked with exact cosine.
    *
    * Scale shape: codebooks are m·k'·(dim/m) doubles of collected
    * model state (broadcast); encoding is one narrow pass per subspace
    * (corpus × broadcast centroids); at serving time a 100 TB corpus
    * holds ONLY the m-byte codes + the broadcast codebooks — the
    * declarative per-(q,n,j) join below is the gate-shaped form of the
    * per-query distance-table lookup a codegen server would run
    * (q×m×k' table, O(m) adds per candidate). Recall is floored in
    * SimilaritySpec; like the int8 tier, errors require a true
    * neighbor to leave the ADC shortlist.
    */
  def pqKnnOn(spark: SparkSession, e: DataFrame): DataFrame = {
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    val sub = dim / PqSubspaces
    require(sub * PqSubspaces == dim,
      s"embedding dim $dim not divisible into $PqSubspaces subspaces")
    // All 8 subspace working sets in ONE narrow pass keyed by j, and
    // the 8 independent Lloyd chains FUSED into one keyed chain: each
    // round's partial sums group by (j, cluster, pos), so no subspace
    // mixes with another and every double is bit-identical to the
    // per-subspace chains the oracle re-derives — but the driver runs
    // (rounds) collect actions instead of 8×(rounds), and one persist
    // instead of eight (the q_knn_pq latency was exactly this stage
    // serialization: ~24 sequential fixture-scale jobs).
    val qAll = e
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(PqSubspaces - 1))).as("j"), col("embedding"))
      .select(col("vec_id"), col("j"),
        transform(slice(col("embedding"), col("j") * lit(sub) + lit(1), lit(sub)),
          v => round(v.cast("double") * KmeansScale, 0).cast("long")).as("qv"))
      .withColumn("xv", transform(col("qv"), v => v.cast("double") / KmeansScale))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloydRoundsKeyed(spark, qAll, PqCodebook)
    val codes = assignStepKeyed(qAll, cents)
      .select(col("vec_id"), col("j"), col("cluster").as("code"))
    val qx = qAll.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("j"), col("xv").as("qx"))
    val dj = codes
      .join(broadcast(cents.select(col("j"), col("cid").as("code"), col("cent"))),
        Seq("j", "code"))
      .join(broadcast(qx), "j")
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("j"),
        sqDistD(col("qx"), col("cent")).as("d"))
    // ADC fold in subspace order — a bare sum() over doubles would be
    // shuffle-order-dependent and break cross-engine exactness
    val adc = dj.groupBy(col("q_id"), col("n_id"))
      .agg(sort_array(collect_list(struct(col("j"), col("d")))).as("ds"))
      .select(col("q_id"), col("n_id"),
        aggregate(transform(col("ds"), p => p.getField("d")), lit(0.0),
          (acc, x) => acc + x).as("adc"))
    val cw = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
    val shortList = adc.withColumn("r", row_number().over(cw))
      .filter(col("r") <= PqRerank)
      .select(col("q_id"), col("n_id"))
    val full = e.select(col("vec_id").as("n_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rw = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    shortList.join(full, "n_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Scalar int8 quantization of the embedding column — the standard
    * 4× storage/serving compression for a 100 TB vector corpus: per
    * vector, scale = max|x|/127 and q_i = round(x_i/scale), stored as
    * one tiny scale plus byte-sized components. Emits the scale, the
    * quantized head, and the reconstruction error so a pipeline can
    * gate quantization on measured quality.
    *
    * Entirely per-row arithmetic (narrow, codegen, no shuffle until
    * the output sort), and gate-exact: every step is IEEE double math
    * both engines reproduce bit-for-bit — abs/max/divide, round-half-
    * away-from-zero to an integer (Spark's HALF_UP equals DuckDB's
    * round for this arithmetic), and an IN-ORDER fold for the error
    * sum (`aggregate` folds the array sequentially, as does DuckDB's
    * list_reduce — order-dependent float sums must never ride a
    * groupBy).
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("emb"))
      .withColumn("scale",
        aggregate(col("emb"), lit(0.0), (acc, v) => greatest(acc, abs(v))) / 127.0)
      .withColumn("qvec",
        when(col("scale") === 0.0,
          transform(col("emb"), _ => lit(0L)))
        .otherwise(transform(col("emb"), v => round(v / col("scale"), 0).cast("long"))))
    x.select(col("vec_id"), col("scale"),
        size(col("emb")).cast("long").as("dim"),
        concat_ws(",",
          transform(slice(col("qvec"), 1, 8), q => q.cast("string")))
          .as("q_head8_csv"),
        sqrt(aggregate(
          zip_with(col("emb"), col("qvec"),
            (v, q) => (v - q.cast("double") * col("scale")) *
                      (v - q.cast("double") * col("scale"))),
          lit(0.0), (acc, d) => acc + d)).as("recon_err"))
      .orderBy(col("vec_id"))
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

  /** Chunk→document embedding mean-pooling: every [[PoolGroup]]
    * consecutive vec_ids form one document and their vectors average
    * element-wise into the document embedding — the standard retrieval
    * step that turns per-chunk encoder outputs into one doc vector.
    *
    * Float portability is by ORDER, not tolerance: members are folded
    * in explicit vec_id order with the FIRST member as the fold init
    * (exactly DuckDB's `list_reduce` seeding — a zero-vector init
    * differs on ±0.0 inputs), so the running sums are bit-identical in
    * both engines and the exploded (group, pos, val) doubles sit under
    * the oracle hash. Cross-row float sums must never ride an
    * order-free aggregate (same rule as the quantization error fold).
    *
    * Scale shape: one hash shuffle on the group key; vectors ride the
    * shuffle packed (one row per chunk, no per-element explosion
    * before the group); the per-group buffer is bounded by chunks/doc
    * (a small constant), never corpus-sized. The output explode to
    * (group, pos, val) is for the differential gate — a production
    * consumer keeps the pooled array column.
    */
  val PoolGroup = 5L

  def embeddingPool(spark: SparkSession, dir: String): DataFrame =
    embeddingPoolOn(Tables.embeddings(spark, dir))

  /** Operator form over any (vec_id, embedding) relation. */
  def embeddingPoolOn(e: DataFrame): DataFrame = {
    val grouped = e
      .groupBy(expr(s"vec_id div $PoolGroup").as("group_id"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("members"), count(lit(1)).as("n"))
    val first = element_at(col("members"), 1).getField("embedding")
    val rest = slice(col("members"), lit(2), size(col("members")) - 1)
    val summed = aggregate(rest,
      transform(first, v => v.cast("double")),
      (acc, m) => zip_with(acc, m.getField("embedding"),
        (a, v) => a + v.cast("double")))
    grouped
      .select(col("group_id"), col("n"), posexplode(summed))
      .select(col("group_id"), (col("pos") + 1).cast("long").as("pos"),
        (col("col") / col("n").cast("double")).as("val"))
      .orderBy(col("group_id"), col("pos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among vectors
    * sharing a coarse cell (the IVF assignment doubles as the LSH-style
    * blocking key, keeping the pair join off the full cross product).
    * Centroid selection is DETERMINISTIC (the first [[dedupCells]]
    * vectors by id) rather than fitted, so the oracle replicates the
    * assignment exactly; cell count scales ~√N with the corpus — the
    * count() is O(1) probe metadata, same class as [[ivfAssignments]]'
    * sizing scan — keeping the within-cell self-join ~N^1.5 total at
    * any corpus size. The centroid table stays a broadcast-safe k·dim
    * floats (√N rows even at 10^12 vectors is ~10^6 · 256 B ≈ 256 MB;
    * for corpora that large, cap the cell count and deepen cells — the
    * centroid table must stay model-state-sized).
    */
  /** Declarative Lloyd's k-means over the embedding column — the
    * semantic-clustering stage a curation pipeline runs before
    * cluster-local work (SemDeDup-style pruning, cluster-balanced
    * sampling, per-topic mixture weights). Fully DETERMINISTIC and
    * oracle-replicable — the same chain [[ivfKnn]]'s coarse quantizer
    * runs: seeds are the
    * first [[KmeansK]] vectors, [[KmeansIters]] fixed Lloyd rounds, and
    * every float that crosses rows is carried as a FIXED-POINT long so
    * the result is independent of partitioning and summation order.
    *
    * Exactness across engines, the three rules:
    *  1. Each embedding is quantized ONCE to longs at 2^20
    *     (round-half-away, Spark HALF_UP = DuckDB round — the
    *     [[embeddingQuantize]] parity). All later math derives from
    *     these integers.
    *  2. Centroid update is sum(long)/(n·2^20): long sums are
    *     associative, so the one float rounding per dimension is a
    *     single deterministic division — order-free, unlike a double
    *     mean. (The fold-in-vec_id-order alternative used by
    *     [[embeddingPoolOn]] is exact too but buffers whole groups;
    *     clusters are N/k-sized, so here partial long sums are the
    *     scalable shape: posexplode → map-side combine → k·dim rows.)
    *  3. Per-row distances accumulate sequentially in element order
    *     from 0.0 — the codegen [[graft.functions.VectorFunctions.sqDistD]]
    *     kernel over the exact doubles qv/2^20, identical fold to
    *     DuckDB's list_sum (the [[embeddingDedup]] parity); assignment
    *     ties break by min(struct(dist, cid)).
    *
    * Scale shape per round: one broadcast of k·dim centroid doubles
    * (model state, same class as `ml.KMeans.clusterCenters`), one
    * map-side-combined hash shuffle of k·dim·partitions partial sums.
    * Centroids are collected per round (k·dim scalars — O(1) model
    * state, the IVF convention) so round t+1's plan does not re-execute
    * round t's shuffle through lineage. Empty clusters drop out of the
    * centroid table (both engines GROUP BY surviving clusters only).
    * Long-sum headroom: |q| ≤ maxAbs·2^20, so overflow needs
    * N_cluster·maxAbs > 2^43 — at 10^12 rows per cluster raise the
    * scale out or switch the sum to DECIMAL.
    */
  val KmeansK = 8
  val KmeansIters = 3
  val KmeansScale = 1048576.0 // 2^20

  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    kmeansAssignOn(spark, Tables.embeddings(spark, dir))

  /** `k` defaults to the oracle-pinned [[KmeansK]]; a production corpus
    * sizes it so clusters stay bounded (~N/target_cluster_size — the
    * SemDeDup paper runs 11k clusters for 1.3B embeddings), because
    * every within-cluster consumer pays O(Σ n_c²).
    */
  def kmeansAssignOn(spark: SparkSession, e: DataFrame, k: Int = KmeansK): DataFrame = {
    val q = quantizedX(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = lloydRounds(spark, q, k)
    // the final assignment feeds both the size agg and the output join
    val last = assignStep(q, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = last.groupBy(col("cluster")).agg(count(lit(1)).as("n_cluster"))
    last.join(sizes, "cluster")
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"),
        col("n_cluster"))
      .orderBy(col("vec_id"))
  }

  /** The fitted centroid MODEL — the (cid, cent) table the final Lloyd
    * assignment scores against, for serving/streaming consumers
    * ([[graft.streaming.EmbeddingStreams.streamedKmeansAssign]]). The
    * returned frame is backed by collected k·dim model state, so it
    * stays valid after this call's working set is unpersisted.
    */
  def kmeansCentroids(spark: SparkSession, e: DataFrame, k: Int = KmeansK): DataFrame = {
    val q = quantizedX(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try lloydRounds(spark, q, k) finally { q.unpersist(); () }
  }

  /** Runs the [[KmeansIters]]-1 assign/update rounds and returns the
    * centroids the FINAL assignment uses. Centroids collect to the
    * driver per round (k·dim scalars — O(1) model state, the ml.KMeans
    * convention) so each round's plan is shallow instead of
    * lineage-stacked.
    */
  /** The single-chain Lloyd is the keyed chain over one constant key —
    * one implementation holds the gated fixed-point arithmetic (the
    * round-12 review flagged the two copies as a divergence hazard).
    * A constant group key changes no partial sum, mean, or tie-break.
    */
  private def lloydRounds(spark: SparkSession, q: DataFrame, k: Int): DataFrame =
    lloydRoundsKeyed(spark, q.withColumn("j", lit(0)), k).drop("j")

  /** [[lloydRounds]] generalized over an independent-chains key `j`
    * (PQ subspaces): per (j, cid) the arithmetic is identical to the
    * unkeyed chain on that subspace alone — partial sums group by
    * (j, cluster, pos), means divide per (j, cluster) — so fusing is a
    * pure scheduling change (one collect per round for ALL chains).
    */
  private def lloydRoundsKeyed(spark: SparkSession, q: DataFrame, k: Int): DataFrame = {
    var cents = q.filter(col("vec_id") < k)
      .select(col("j"), col("vec_id").as("cid"),
        transform(col("qv"), v => v.cast("double") / KmeansScale).as("cent"))
    for (_ <- 1 until KmeansIters) {
      val assigned = assignStepKeyed(q, cents)
      val sums = q.join(assigned, Seq("j", "vec_id"))
        .select(col("j"), col("cluster"), posexplode(col("qv")))
        .groupBy(col("j"), col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("j"), col("cluster"))
        .agg(sort_array(collect_list(struct(col("pos"),
          (col("s").cast("double") / (col("n").cast("double") * KmeansScale))
            .as("m")))).as("pcs"))
        .select(col("j"), col("cluster").as("cid"),
          transform(col("pcs"), p => p.getField("m")).as("cent"))
      val rows = sums.collect()
      // LocalRelation, not a single-partition RDD hop: the k·dim
      // model rows feed the next round's broadcast directly — at very
      // large k the old parallelize(rows, 1) made the broadcast build
      // read one partition single-threaded
      cents = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), sums.schema)
    }
    cents
  }

  private def assignStepKeyed(q: DataFrame, cents: DataFrame): DataFrame =
    q.join(broadcast(cents), "j")
      .withColumn("d", sqDistD(col("xv"), col("cent")))
      .groupBy(col("j"), col("vec_id"))
      .agg(min(struct(col("d"), col("cid"))).as("m"))
      .select(col("j"), col("vec_id"), col("m.cid").as("cluster"), col("m.d").as("dist"))

  /** One assignment pass: corpus × broadcast(centroids), codegen
    * distance, min(struct(d, cid)) tie-break — the keyed pass over one
    * constant key (see [[lloydRounds]]).
    */
  private def assignStep(q: DataFrame, cents: DataFrame): DataFrame =
    assignStepKeyed(q.withColumn("j", lit(0)),
      cents.withColumn("j", lit(0))).drop("j")

  /** The quantized working set every round reads (persisted by
    * callers): fixed-point longs `qv` plus `xv` = qv/2^20 — EXACT
    * doubles (power-of-2 division) for the codegen assignment kernel.
    * N×(dim+1) longs + dim doubles per row, far below the
    * shingle-pipeline intermediates whose persists lost the round-10
    * A/B; session hygiene (Verify/Bench clearCache) bounds lifetimes.
    */
  private def quantizedX(e: DataFrame): DataFrame =
    quantized(e)
      .withColumn("xv", transform(col("qv"), v => v.cast("double") / KmeansScale))

  /** vec → fixed-point longs at 2^20 (rule 1 above). */
  private def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"),
        v => round(v.cast("double") * KmeansScale, 0).cast("long")).as("qv"))

  /** kNN classification over the labeled embedding table — the
    * label-propagation primitive (auto-labeling a new batch from a
    * labeled corpus, quality-tier transfer, weak supervision): each
    * query vector takes the majority label of its [[K]] nearest
    * neighbors (excluding itself), ties broken toward the smaller
    * label. Reuses [[bruteForceKnnOn]]'s exact top-k (broadcast query
    * side, one per-query rank) — at scale the same classification runs
    * over any of the sublinear kNN tiers (IVF/graph/quantized) since
    * the vote is just a groupBy on their identical output shape.
    * true_label rides along for accuracy audits.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val labels = e.select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = bruteForceKnnOn(spark, e)
      .join(labels.withColumnRenamed("vec_id", "n_id"), "n_id")
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label"))
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "true_label"), "q_id")
      .select(col("q_id"), col("label").as("pred_label"), col("n_votes"),
        col("true_label"))
      .orderBy(col("q_id"))
  }

  /** Cluster-balanced mixture sampling: the [[graft.operators.Dedup.temperatureMixture]]
    * flattening applied to SEMANTIC clusters instead of language tags —
    * per-cluster keep-rate ∝ 1/√n normalized so the smallest topic
    * keeps everything (the DataComp-style rebalance toward rare
    * content, driven by the fitted k-means assignment rather than
    * metadata). Same exactness recipe as the language form: 1/√n and
    * the normalizing division are IEEE-exact in both engines, the
    * sampling decision is an md5-derived hash bucket per vec_id, and
    * the output is per-cluster counts — one broadcast of k rates, one
    * narrow filter, one partial-agged count. Scale: identical to the
    * language mixture (the corpus never shuffles before the filter);
    * the clustering cost is [[kmeansAssignOn]]'s.
    */
  def clusterMixture(spark: SparkSession, dir: String): DataFrame = {
    val assigned = kmeansAssignOn(spark, Tables.embeddings(spark, dir))
    val sizes = assigned.select(col("cluster"), col("n_cluster")).distinct()
      .withColumn("w", lit(1.0) / sqrt(col("n_cluster").cast("double")))
    val maxW = sizes.agg(max(col("w")).as("max_w"))
    val rates = sizes.crossJoin(broadcast(maxW))
      .select(col("cluster"), col("n_cluster"), (col("w") / col("max_w")).as("rate"))
    val bucket = pmod(
      graft.functions.TextFunctions.md5Hash32(
        concat(col("vec_id").cast("string"), lit("#cmix"))), lit(1000000))
    assigned.select(col("vec_id"), col("cluster"))
      .join(broadcast(rates), "cluster")
      .filter(bucket.cast("double") < col("rate") * 1000000.0)
      .groupBy(col("cluster"), col("n_cluster"), col("rate"))
      .agg(count(lit(1)).as("n_sampled"), min(col("vec_id")).as("first_vec"))
      .orderBy(col("cluster"))
  }

  /** SemDeDup-style semantic dedup: k-means clusters as the blocking
    * key, cosine pairs only WITHIN a cluster, and a rank-based keep
    * policy — for every within-cluster pair with cosine ≥ threshold,
    * the lower-ranked member is dropped; survivors are the semantic
    * representatives. Rank follows the SemDeDup paper's choice: order
    * by distance to the final centroid DESCENDING (keep the outlier,
    * prune toward the dense duplicated core), vec_id tie-break. The
    * per-vector drop rule (∃ higher-ranked neighbor with sim ≥ τ)
    * needs no connected components — one blocked self-join and an
    * aggregate, O(Σ n_c²) pair work like [[embeddingDedup]], but with
    * ITERATED clusters as blocks and a curation DECISION as output.
    */
  def semanticDedup(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame =
    semanticDedupOn(spark, Tables.embeddings(spark, dir), threshold)

  /** Operator form over any (vec_id, embedding) relation. `k` as in
    * [[kmeansAssignOn]] — the pair stage below is O(Σ n_c²), so k is
    * THE scale knob: at fixed k the stage grows N²/k, sized correctly
    * it stays ~N·target_cluster_size.
    */
  def semanticDedupOn(spark: SparkSession, e: DataFrame,
      threshold: Double = 0.4, k: Int = KmeansK): DataFrame = {
    val assigned = kmeansAssignOn(spark, e, k)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("dist").desc, col("vec_id"))
    val ranked = assigned.withColumn("rank", row_number().over(w))
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      // both sides of the within-cluster self-join read this — persist,
      // or the whole Lloyd chain executes twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = ranked.as("a")
    val b = ranked.as("b")
    val dropped = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.rank") < col("b.rank"))
      .filter(round(cosine(col("a.embedding"), col("b.embedding")), 6) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    ranked.join(dropped.withColumn("is_dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("rank").cast("long").as("rank"),
        when(col("is_dropped").isNotNull, lit(0L)).otherwise(lit(1L)).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** INCREMENTAL SemDeDup — the semantic-dedup family's ingest form
    * (the [[deltaIvfKnn]] discipline on the curation DECISION): prior
    * ingests left a STORED fitted quantizer (the [[kmeansCentroids]]
    * Lloyd model over the id-prefix base) and the base's
    * cluster-partitioned decision table (vec_id, cluster, dist,
    * embedding — written once, frozen). A new batch absorbs WITHOUT
    * refitting or revisiting stored decisions:
    *
    *  1. stateless cell assignment of the batch against the stored
    *     centroids (the q_stream_kmeans kernel — one broadcast join);
    *  2. ONE join of batch vectors against the stored members of the
    *     batch's TOUCHED clusters only (partition-pruned read of the
    *     stored table) scoring both the rank arithmetic and the
    *     cosine drop test in the same pass;
    *  3. a batch-internal window + self-join for batch-vs-batch ranks
    *     and drops (batch-sized, never stored×stored — those pairs
    *     were adjudicated at their own ingest).
    *
    * Rank is the SemDeDup order (centroid distance DESC, vec_id) over
    * the UNION cluster population, computed for batch rows by COUNTING
    * stored members ranked above (n_above folds out of the same join
    * as the drop test) plus the batch-internal row_number — so the
    * output EQUALS the full recompute (base-fitted centroids,
    * assignment over all, pairwise drop rule) restricted to batch
    * vec_ids, and the DuckDB oracle re-derives exactly that (the
    * deltaIvfSql pattern: Lloyd over the id-prefix base, the decision
    * chain over all, batch filter). Frozen semantics stated plainly:
    * stored keep/drop flags never flip — a batch arrival that would
    * have outranked a stored member re-adjudicates NOTHING (the drop
    * rule consults higher-ranked members regardless of their own kept
    * flag, matching the batch operator's a.rank < b.rank join, so no
    * stored flag is needed in the decision). Periodic refits re-fit
    * the quantizer as clusters drift — the deltaIvfKnn note.
    *
    * Scale shape: ingest cost is O(batch · k) scoring + O(Σ_touched
    * |c_stored| · |c_batch|) decision pairs — linear in the touched
    * clusters' stored occupancy, never Σ n_c² (the full run's cost),
    * never a Lloyd chain; k stays THE knob ([[semanticDedupOn]]) so
    * production sizes per-cluster occupancy constant and the join is
    * ~|batch| · target_cluster_size. Probed vs the full recompute in
    * ScalingProbe delta_semdedup.
    */
  def deltaSemDedup(spark: SparkSession, dir: String,
      threshold: Double = 0.4): DataFrame = {
    val (cents, storedBase, b) = semdedupStoredState(spark, dir)
    deltaSemDedupFrom(cents, storedBase,
      Tables.embeddings(spark, dir).filter(col("vec_id") >= b), threshold)
  }

  /** The stored semdedup state (fitted centroids + frozen
    * cluster-partitioned base decision table), materialized once per
    * corpus and shared by every delta consumer — the batch entry above
    * and the streaming serving twin
    * ([[graft.streaming.EmbeddingStreams.streamedDeltaSemDedup]]).
    * Returns (centroids, stored decision table, base cut).
    */
  private[graft] def semdedupStoredState(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, Long) = {
    val e = Tables.embeddings(spark, dir)
    val n = denseCountDir(spark, dir, "delta semdedup")
    val b = deltaBaseCount(n)
    val base = e.filter(col("vec_id") < b)
    val centPath = graft.sources.Scratch.corpusDir(spark, "semdedup_delta_cents", dir)
    val basePath = graft.sources.Scratch.corpusDir(spark, "semdedup_delta_base", dir)
    // each guard covers exactly the path it writes: a future caller
    // materializing centPath alone can no longer leave basePath
    // unwritten behind a guard that reports built
    graft.sources.Scratch.materializeOnce(centPath) {
      kmeansCentroids(spark, base).write.mode("overwrite").parquet(centPath)
    }
    graft.sources.Scratch.materializeOnce(basePath) {
      writeConsolidated(
        semdedupAssign(graft.sources.Scratch.readParquetOnce(spark, centPath), base),
        "cluster", basePath)
    }
    (graft.sources.Scratch.readParquetOnce(spark, centPath),
      graft.sources.Scratch.readParquetOnce(spark, basePath), b)
  }

  /** Recompute-state form (specs, probes): fits the base model and
    * derives the stored decision table inline — value-identical to the
    * stored-table path.
    */
  private[graft] def deltaSemDedupOn(spark: SparkSession, e: DataFrame,
      threshold: Double = 0.4): DataFrame = {
    val n = denseCount(e, "delta semdedup")
    val b = deltaBaseCount(n)
    val base = e.filter(col("vec_id") < b)
    val cents = kmeansCentroids(spark, base)
    deltaSemDedupFrom(cents, semdedupAssign(cents, base),
      e.filter(col("vec_id") >= b), threshold)
  }

  /** Assignment against FIXED centroids with the decision table's
    * columns: (vec_id, cluster, dist, embedding) — dist rounded to 6
    * exactly as [[kmeansAssignOn]] reports it, because the SemDeDup
    * rank orders on the ROUNDED value in both the batch operator and
    * the oracle.
    */
  private[graft] def semdedupAssign(cents: DataFrame, e: DataFrame): DataFrame =
    assignStep(quantizedX(e), cents)
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")

  private[graft] def deltaSemDedupFrom(cents: DataFrame, storedBase: DataFrame,
      batch: DataFrame, threshold: Double): DataFrame = {
    // THE INGEST: stateless assignment — one broadcast join, map-only
    val assigned = semdedupAssign(cents, batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // prune the stored read to the batch's touched clusters (a
      // partition filter on the stored layout); tiny cluster list
      val touched = assigned.select(col("cluster")).distinct()
      val stored = storedBase.join(broadcast(touched), "cluster")
      // the SemDeDup order: (dist DESC, vec_id) — `a above b` is the
      // a.rank < b.rank predicate without materializing union ranks
      def above(a: String, b: String): Column =
        (col(s"$a.dist") > col(s"$b.dist")) ||
          (col(s"$a.dist") === col(s"$b.dist") &&
            col(s"$a.vec_id") < col(s"$b.vec_id"))
      val simAB = round(cosine(col("a.embedding"), col("b.embedding")), 6)
      // one pass over batch × stored-members-of-touched-clusters scores
      // BOTH the rank count and the drop test
      val vsStored = assigned.as("b").join(stored.as("a"),
          col("a.cluster") === col("b.cluster"))
        .groupBy(col("b.vec_id").as("vec_id"))
        .agg(sum(when(above("a", "b"), 1L).otherwise(0L)).as("n_stored_above"),
          max(when(above("a", "b") && simAB >= threshold, 1L)
            .otherwise(0L)).as("hit_stored"))
      // batch-internal rank + drop (batch-sized window and self-join)
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("dist").desc, col("vec_id"))
      val batchRank = assigned.withColumn("n_batch_above",
        (row_number().over(w) - 1).cast("long"))
      val hitBatch = assigned.as("a").join(assigned.as("b"),
          col("a.cluster") === col("b.cluster") && above("a", "b"))
        .filter(simAB >= threshold)
        .select(col("b.vec_id").as("vec_id")).distinct()
        .withColumn("hit_batch", lit(1L))
      batchRank
        .join(vsStored, Seq("vec_id"), "left")
        .join(hitBatch, Seq("vec_id"), "left")
        // cluster re-cast: the stored layout's partition column reads
        // back as int, the oracle emits BIGINT
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          (lit(1L) + coalesce(col("n_stored_above"), lit(0L)) +
            col("n_batch_above")).as("rank"),
          when(coalesce(col("hit_stored"), lit(0L)) === 1L ||
            col("hit_batch").isNotNull, lit(0L)).otherwise(lit(1L)).as("kept"))
        .orderBy(col("vec_id"))
    } finally { assigned.unpersist(); () }
  }

  def embeddingDedup(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val nCells = dedupCells(e.count())
    val centroids = e.filter(col("vec_id") < nCells)
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
