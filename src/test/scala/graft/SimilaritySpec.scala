package graft

import graft.operators.Similarity
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

  test("ivfKnn: recall@5 vs exact is within the single-probe regime") {
    val exact = byQuery(Similarity.bruteForceKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val ivf = byQuery(Similarity.ivfKnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect())
      .map { case (q, r) => q -> r.map(_._3).toSet }
    val recalls = exact.map { case (q, e) =>
      (ivf.getOrElse(q, Set.empty) & e).size.toDouble / e.size }
    val avg = recalls.sum / recalls.size
    // measured 0.84 avg on this fixture; 0.6 floor guards regressions
    // without flaking (single-probe IVF loses boundary neighbors by design)
    assert(avg >= 0.6, f"avg recall $avg%.2f below floor")
  }

  test("embeddingDedup: canonical pair order and threshold respected") {
    val pairs = Similarity.embeddingDedup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, sim) =>
      assert(a < b)
      assert(sim >= 0.4)
    }
  }
}
