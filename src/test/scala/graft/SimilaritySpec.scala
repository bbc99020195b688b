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

  test("embeddingDedup: canonical pair order and threshold respected") {
    val pairs = Similarity.embeddingDedup(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, sim) =>
      assert(a < b)
      assert(sim >= 0.4)
    }
  }
}
