package graft

import graft.operators.Dedup
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextShingleExpressions
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("exactDedup partitions the corpus: copies sum to doc count") {
    val total = Tables.documents(spark, sfDir).count()
    val dedup = Dedup.exactDedup(spark, sfDir)
    assert(dedup.agg(sum($"n_copies")).as[Long].head() === total)
    assert(dedup.count() <= total)
  }

  test("ngramJaccardPairs (prefix-filtered) equals brute-force all-pairs") {
    // Brute force: collect every doc's hashed shingle set, compare all
    // C(n,2) pairs in-process with the same rounding as the operator.
    val sets = Tables.documents(spark, sfDir)
      .select($"doc_id", TextShingleExpressions.shingleHashSetCol(
        lower(trim($"text")), Dedup.ShingleK).as("set"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
    val want = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
    } yield {
      val (ida, a) = sets(i); val (idb, b) = sets(j)
      val inter = (a.toSet & b.toSet).size
      val jac = inter.toDouble / (a.length + b.length - inter)
      (ida, idb, BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).filter(_._3 >= 0.4).toSeq.sorted
    val got = Dedup.ngramJaccardPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty, "fixture should contain near-duplicates")
  }

  test("minhashLshPairs: estimates recomputable from signatures, all >= 0.5") {
    val sig = Dedup.minhashSignatures(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(i => r.getLong(i)).toVector)
      .toMap
    val pairs = Dedup.minhashLshPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, est) =>
      val matches = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      assert(est === matches.toDouble / Dedup.NumHashes)
      assert(est >= 0.5)
    }
  }

  test("clustersFromPairs: 1000-node path graph collapses to one cluster (O(log) rounds)") {
    // worst case for label propagation: a single long chain — plain
    // min-label propagation needs ~1000 rounds; pointer jumping must
    // finish well inside the 20-round cap or the loud require() fires
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.clustersFromPairs(chain).collect()
    assert(clusters.length === 1)
    assert(clusters.head.getLong(0) === 0L)   // min-label representative
    assert(clusters.head.getLong(1) === 1000L) // all members
    // and a disconnected forest keeps its components separate
    val forest = chain.union(Seq((5000L, 5001L), (5001L, 5002L)).toDF("id_a", "id_b"))
    val reps = Dedup.clustersFromPairs(forest).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(reps.toSet === Set((0L, 1000L), (5000L, 3L)))
  }

  test("simhash: near-identical docs get near-identical fingerprints") {
    val fp = Dedup.simhash(spark, sfDir).as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the fixture has no byte-exact duplicates, but it does have strong
    // near-dups (shingle Jaccard >= 0.9): their 32-bit fingerprints must
    // be within a few flipped bits
    val near = Dedup.ngramJaccardPairs(spark, sfDir)
      .filter($"jaccard" >= 0.9).as[(Long, Long, Double)].collect()
    assert(near.nonEmpty, "fixture should contain strong near-duplicates")
    near.foreach { case (a, b, _) =>
      assert(hamming(fp(a), fp(b)) <= 8,
        s"docs $a,$b: fingerprints too far apart")
    }
    // determinism: a second evaluation bit-matches
    val fp2 = Dedup.simhash(spark, sfDir).as[(Long, Long)].collect().toMap
    assert(fp === fp2)
  }
}
