package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def byQuery(rows: Array[(Long, Long, Long, Double)]) =
    rows.groupBy(_._1)

  test("bruteForceKnn: exactly K descending neighbors per query, sims in [-1,1]") {
    val rows = Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect() // q_id, rank, n_id, sim
    val perQ = byQuery(rows)
    assert(perQ.size === Similarity.NumQueries)
    perQ.foreach { case (q, ns) =>
      assert(ns.length === Similarity.K)
      assert(ns.map(_._2).sorted.toSeq === (1L to Similarity.K))
      val sims = ns.sortBy(_._2).map(_._4)
      assert(sims.toSeq === sims.sortBy(-_).toSeq, s"query $q sims not descending")
      sims.foreach(s => assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
      assert(!ns.exists(_._3 == q), "self excluded")
    }
  }

  test("ivfKnn: approximate sims never beat exact top-1") {
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    val approx = byQuery(Similarity.ivfKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    assert(approx.nonEmpty)
    approx.foreach { case (q, ns) =>
      val bestExact = exact(q).map(_._4).max
      ns.foreach { case (_, _, _, sim) => assert(sim <= bestExact + 1e-9) }
    }
  }

  test("ivfKnn: recall@5 >= 0.8 on clustered data (quantizer quality)") {
    // A corpus with real cluster structure — the shape a 100 TB
    // embedding table has (documents cluster by topic). 12 planted
    // clusters, 60 members each; queries (vec_id < 10) land in
    // clusters 0..9 via the interleaved assignment.
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val ivf = byQuery(Similarity.ivfKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (ivf.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, f"avg recall $avg%.2f below quantizer floor")
  }

  test("ivfKnn: recall on the (structureless) fixture beats the scanned fraction") {
    // the synthetic fixture embeddings carry no cluster signal, so the
    // information-theoretic ceiling for ANY unbiased quantizer is
    // ~probes/cells of the corpus; assert we are at least at that line
    // (regression guard for the plumbing, not a quality claim)
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val ivf = byQuery(Similarity.ivfKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (ivf.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.35, f"avg recall $avg%.2f below scanned-fraction line")
  }

  test("ivfKnnExact: recall@5 >= 0.8 on clustered data (deterministic quantizer quality)") {
    // same planted-cluster corpus as the ivfKnn quality test: the
    // fixed-point Lloyd quantizer must be a REAL coarse quantizer,
    // not just an oracle-friendly one
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val ivf = byQuery(Similarity.ivfKnnExactOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (ivf.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, f"avg recall $avg%.2f below quantizer floor")
  }

  test("ivfKnnExact: deterministic across runs (pure function of data)") {
    val a = Similarity.ivfKnnExact(spark, sfDir).collect().toSeq
    val b = Similarity.ivfKnnExact(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("ivfKnnExactMaterialized: identical to ivfKnnExact and partition-pruned scan") {
    // same deterministic quantizer + same search ⇒ the cell layout
    // must reproduce the in-memory result row for row, AND the probe
    // must reach the parquet scan as a PARTITION filter
    val inMem = Similarity.ivfKnnExact(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val layout = Similarity.ivfKnnExactMaterialized(spark, sfDir)
    val mat = layout.as[(Long, Long, Long, Double)].collect().toSeq
    assert(mat === inMem)
    val plan = layout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n${plan.take(1500)}")
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("cell"), s"partition filter does not prune cell: $pf")
  }

  test("pqKnn: recall@5 on clustered data (codebook quality) and determinism") {
    // the planted-cluster corpus of the other quantizer-quality tests:
    // 8×16 codebooks + ADC + rerank must recover most true neighbors
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val pq = byQuery(Similarity.pqKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (pq.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, f"avg recall $avg%.2f below PQ floor")
    val a = Similarity.pqKnn(spark, sfDir).collect().toSeq
    val b = Similarity.pqKnn(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("quantizedIvfKnnExact: recall vs exact-rerank IVF, pruned packed scan") {
    // identical candidate pool to ivfKnnExact (same Lloyd cells +
    // probes); int8 rounding may only push a true pool-neighbor out of
    // the quantized shortlist, so recall vs the exact-rerank tier must
    // stay high — and the packed layout must scan partition-pruned
    val exact = byQuery(Similarity.ivfKnnExact(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val layout = Similarity.quantizedIvfKnnExact(spark, sfDir)
    val quant = byQuery(layout.as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (quant.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, f"avg recall $avg%.2f below int8-within-cells floor")
    val plan = layout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n${plan.take(1500)}")
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("cell"), s"partition filter does not prune cell: $pf")
  }

  test("ivfKnnMaterialized: identical to ivfKnn and partition-pruned scan") {
    // same fitted model (fixed seed, deterministic fit sample) + same
    // search ⇒ the materialized layout must reproduce the in-memory
    // result row for row
    val inMem = Similarity.ivfKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val layout = Similarity.ivfKnnMaterialized(spark, sfDir)
    val mat = layout.as[(Long, Long, Long, Double)].collect().toSeq
    assert(mat === inMem)
    // the probe must reach the parquet scan as a PARTITION filter —
    // pruned at planning, non-probed cells never opened
    val plan = layout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n${plan.take(1500)}")
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("cell"), s"partition filter does not prune cell: $pf")
  }

  test("graphKnn: approximate sims never beat exact top-1") {
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    val approx = byQuery(Similarity.graphKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    assert(approx.size === Similarity.NumQueries)
    approx.foreach { case (q, ns) =>
      assert(ns.length === Similarity.K)
      val bestExact = exact(q).map(_._4).max
      ns.foreach { case (_, _, _, sim) => assert(sim <= bestExact + 1e-9) }
      assert(!ns.exists(_._3 == q), "self excluded")
    }
  }

  test("graphKnn: recall@5 >= 0.8 on clustered data (graph navigability)") {
    // same planted-cluster corpus as the IVF quality test; the beam
    // must CROSS clusters via the ring shortcuts to reach queries
    // whose cluster holds no entry point
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val graph = byQuery(Similarity.graphKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (graph.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    info(f"graphKnn clustered recall@5 = $avg%.3f")
    assert(avg >= 0.8, f"avg recall $avg%.2f below navigability floor")
  }

  test("graphKnnNnd: recall@5 >= 0.8 on clustered data (NN-descent convergence)") {
    // same planted-cluster corpus as the blocked-build test: after
    // NndRounds of neighbor-of-neighbor refinement from a random init
    // the proximity graph must be navigable to the same floor
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val graph = byQuery(Similarity.graphKnnNndOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (graph.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    info(f"graphKnnNnd clustered recall@5 = $avg%.3f")
    assert(avg >= 0.8, f"avg recall $avg%.2f below NN-descent floor")
  }

  test("graphKnnNnd: rho-sampled build holds the same recall floor") {
    // the ρ-sampling path large corpora take (per-round proposal
    // volume cut to (ρM)², different sample each round) must stay
    // navigable to the SAME floor — forced on here at fixture scale
    // with the production NndRhoPct
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(12)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val points = (0 until 720).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => x + 0.3f * rnd.nextGaussian().toFloat))
    }
    val e = points.toDF("vec_id", "embedding")
    val exact = byQuery(Similarity.bruteForceKnnOn(spark, e)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val graph = byQuery(
        Similarity.graphKnnNndOn(spark, e, rho = Some(Similarity.NndRhoPct))
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (graph.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    info(f"graphKnnNnd rho-sampled clustered recall@5 = $avg%.3f")
    assert(avg >= 0.8, f"avg recall $avg%.2f below sampled NN-descent floor")
  }

  test("graphKnn: recall on the (structureless) fixture stays above the plumbing floor") {
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val graph = byQuery(Similarity.graphKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, x) =>
      (graph.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    info(f"graphKnn fixture recall@5 = $avg%.3f")
    assert(avg >= 0.35, f"avg recall $avg%.2f below plumbing floor")
  }

  test("quantizedIvfKnn: recall vs exact-rerank IVF, partition-pruned packed scan") {
    // same fitted quantizer ⇒ same candidate pool as ivfKnn; the int8
    // coarse pass can only lose a pool-neighbor that falls out of the
    // quantized top-20, so recall against the IVF result (not brute
    // force — IVF's own fixture recall is the pool's property) must
    // stay near 1
    val ivf = byQuery(Similarity.ivfKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val layout = Similarity.quantizedIvfKnn(spark, sfDir)
    val quant = byQuery(layout.as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = ivf.map { case (q, x) =>
      (quant.getOrElse(q, Set.empty) & x).size.toDouble / x.size }
    val avg = recalls.sum / recalls.size
    info(f"quantizedIvfKnn recall@5 vs ivfKnn = $avg%.3f")
    assert(avg >= 0.9, f"avg recall $avg%.2f below int8-shortlist floor")
    // the probe must prune the PACKED layout's scan at plan time (the
    // rerank's embeddings scans also print PartitionFilters — empty —
    // so check every scan's segment, not just the first)
    val plan = layout.queryExecution.executedPlan.toString
    val pfs = plan.split("PartitionFilters:").drop(1).map(_.split("]")(0))
    assert(pfs.exists(_.contains("cell")),
      s"no cell partition filter in any scan: ${pfs.mkString(" | ")}")
  }

  test("quantizedKnn: recall@5 vs exact brute force (int8 + rerank)") {
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    val quant = byQuery(Similarity.quantizedKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
    assert(quant.size === Similarity.NumQueries)
    quant.foreach { case (q, ns) =>
      assert(ns.length === Similarity.K)
      val bestExact = exact(q).map(_._4).max
      ns.foreach { case (_, _, _, sim) => assert(sim <= bestExact + 1e-9) }
      assert(!ns.exists(_._3 == q), "self excluded")
    }
    val recalls = exact.map { case (q, x) =>
      val xs = x.map(_._3).toSet
      (quant(q).map(_._3).toSet & xs).size.toDouble / xs.size }
    val avg = recalls.sum / recalls.size
    info(f"quantizedKnn recall@5 = $avg%.3f")
    // int8 rounding only loses a true neighbor if it falls out of the
    // quantized top-20 — rare even on dense random sims
    assert(avg >= 0.8, f"avg recall $avg%.2f below quantization floor")
  }

  test("int8 pack/dot: quantized cosine tracks exact cosine within the rounding bound") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions._
    val e = Seq(
      (0L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (1L, Array(-1.0f, 0.5f, 0.25f, -0.125f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector -> zero bytes
    ).toDF("vec_id", "embedding")
    val scale = aggregate(col("embedding"), lit(0.0),
      (acc, v) => greatest(acc, abs(v.cast("double")))) / 127.0
    val q = e.select(col("vec_id"), col("embedding"),
      int8Pack(col("embedding"), scale).as("qb"), scale.as("s"))
    val rows = q.collect()
    val qb = rows.map(r => r.getLong(0) -> (r.getAs[Array[Byte]]("qb"), r.getDouble(3))).toMap
    assert(qb(2L)._1.forall(_ == 0), "zero vector must pack to zero bytes")
    assert(qb(0L)._1.max <= 127 && qb(0L)._1.min >= -127)
    // dot(q0, q1)*s0*s1 approximates dot(e0, e1)
    val approx = qb(0L)._1.zip(qb(1L)._1).map { case (a, b) => a.toInt * b.toInt }.sum *
      qb(0L)._2 * qb(1L)._2
    val exact = (0.5 * -1.0) + (-0.25 * 0.5) + (0.125 * 0.25) + (1.0 * -0.125)
    assert(math.abs(approx - exact) < 0.02, s"approx $approx vs exact $exact")
  }

  test("embeddingDedup: canonical pair order and threshold respected") {
    val pairs = Similarity.embeddingDedup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, sim) =>
      assert(a < b)
      assert(sim >= 0.4)
    }
  }

  test("blocked graph build refuses to run above its viability ceiling") {
    // The blocked ~N^1.5 build DNF'd the 1M-vector probe (BASELINE.md
    // r12); the require must stop it BEFORE any quadratic work. The
    // ceiling is exercised via the maxN parameter so the spec doesn't
    // need a 200k-row fixture to prove the wiring.
    val rnd = new scala.util.Random(7)
    val e = (0 until 100)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.graphAnnEdges(spark, e, maxN = 50L)
    }
    assert(ex.getMessage.contains("nnDescentEdges"),
      "gate message must point at the scale-safe alternative")
    assert(Similarity.BlockedBuildMaxN == 200000L)
    // below the ceiling the build still runs
    assert(Similarity.graphAnnEdges(spark, e).count() > 0)
  }

  test("mix31 matches the reference xor-mult mixer (DuckDB-portable arithmetic)") {
    // reference implementation of the oracle-portable 31-bit mixer —
    // any drift here silently breaks the q_knn_graph/_nnd hash gate
    def ref(x: Long, salt: Long): Long = {
      val M = 2147483648L; val C = 73244475L
      val h0 = (x + salt) % M
      val h1 = ((h0 ^ (h0 >>> 16)) * C) % M
      val h2 = ((h1 ^ (h1 >>> 16)) * C) % M
      h2 ^ (h2 >>> 16)
    }
    val xs = Seq(0L, 1L, 42L, 499L, 719L, 1999L)
    val df = xs.toDF("x")
    for (salt <- Seq(1L, 2L, 101L, 102L, 7L, 38L)) {
      val got = df.select(Similarity.mix31(col("x"), salt)).as[Long].collect()
      assert(got.toSeq === xs.map(ref(_, salt)),
        s"mix31 diverged from reference at salt=$salt")
    }
    // spot-pin one absolute value so BOTH implementations can't drift
    // together unnoticed (verified against the DuckDB SQL twin)
    assert(ref(42L, 7L) == 753431816L)
  }
}
