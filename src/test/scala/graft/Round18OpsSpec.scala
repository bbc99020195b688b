package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 operators: the radius-parameterized banding engine, delta
  * (incremental) media near-dup/dedup, chunk-level audio near-dup for
  * partial-overlap detection, and the near-dup-folded media cascade.
  */
class Round18OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** Diverse hashes with planted variants at Hamming 0–8 — wider than
    * Round17OpsSpec's 0–5 fixture so radii past 3 have both in-radius
    * pairs to find and out-of-radius pairs that MUST be excluded.
    */
  private lazy val planted: Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(20260818L)
    val base = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt().toLong & 0xffffffffL,
        rnd.nextInt().toLong & 0xffffffffL)
    }
    val variants = (0 until 45).map { j =>
      val (_, hi, lo) = base(rnd.nextInt(base.size))
      val flips = j % 9 // 0..8 planted flip counts
      var v = (hi << 32) | lo
      (0 until flips).foreach(_ => v ^= 1L << rnd.nextInt(64))
      (300L + j, v >>> 32, v & 0xffffffffL)
    }
    base ++ variants
  }

  private def brutePairs(maxDist: Int): Seq[(Long, Long, Long)] =
    (for {
      a <- planted; b <- planted if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= maxDist
    } yield (a._1, b._1, d.toLong)).sorted

  test("neardupFromHashesAt: radius 4 and 7 instances == brute force; recall holes refused") {
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    // radius 4, two admissible splits: 5 single-block bands and the
    // C(6,2)=15 two-block tables — both must equal brute force (the
    // popcount verify makes any admissible split EXACT)
    val want4 = brutePairs(4)
    assert(want4.exists(_._3 == 4), "fixture planted no distance-4 pairs")
    for ((blocks, subset) <- Seq((5, 1), (6, 2))) {
      val got = graft.operators.Multimodal
        .neardupFromHashesAt(ah, 4, blocks, subset)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == want4, s"($blocks,$subset) at radius 4 != brute force")
    }
    // radius 7: C(9,2)=36 tables (9-2=7)
    val want7 = brutePairs(7)
    assert(want7.exists(_._3 > 4), "fixture planted no distance>4 pairs")
    val got7 = graft.operators.Multimodal
      .neardupFromHashesAt(ah, 7, 9, 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got7 == want7, "(9,2) at radius 7 != brute force")
    // pigeonhole violations must refuse loudly, not silently lose recall
    intercept[IllegalArgumentException](
      graft.operators.Multimodal.neardupFromHashesAt(ah, 3, 4, 2))
    intercept[IllegalArgumentException](
      graft.operators.Multimodal.neardupFromHashesAt(ah, 4, 4, 1))
  }

  test("deltaNeardupFromHashes == full-batch pairs restricted to the batch side") {
    // the deltaDedupOn spec precedent: an incremental join changes
    // WORK, never results — the delta probe on a (base, batch) split
    // must equal the full-batch pair list filtered to pairs touching
    // the batch, with exact type tags
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val base = ah.filter(col("doc_id") % 5 =!= 0)
    val batch = ah.filter(col("doc_id") % 5 === 0)
    val got = graft.operators.Multimodal.deltaNeardupFromHashes(base, batch)
      .as[(Long, Long, Long, String)].collect().toSeq
    val isNew = (id: Long) => id % 5 == 0
    val want = brutePairs(graft.operators.Multimodal.ImageNeardupMaxDist)
      .filter(p => isNew(p._1) || isNew(p._2))
      .map(p => (p._1, p._2, p._3,
        if (isNew(p._1) && isNew(p._2)) "new_new" else "new_existing"))
    assert(want.nonEmpty && want.exists(_._4 == "new_new") &&
      want.exists(_._4 == "new_existing"), "split fixture degenerate")
    assert(got == want, "delta pair list != restricted full-batch list")
    // an empty batch owes an empty delta (and must not error)
    val none = graft.operators.Multimodal
      .deltaNeardupFromHashes(ah, ah.filter(lit(false)))
    assert(none.count() == 0L)
  }

  test("deltaImageDedupOn: frozen stored reps, new classes elect min batch doc") {
    // class A: base docs 100,101 + batch doc 5 (smaller than the
    // stored rep!) — frozen-rep semantics must keep 100, never
    // rewrite history to 5; class B: batch-only docs 200,201 — elects
    // 200; class C: base-only — must not emit (no new rows)
    val base = Seq((100L, 7L, 7L), (101L, 7L, 7L), (300L, 9L, 9L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val batch = Seq((5L, 7L, 7L), (200L, 8L, 8L), (201L, 8L, 8L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val got = graft.operators.Multimodal.deltaImageDedupOn(base, batch)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 100L, 3L), (200L, 200L, 2L), (201L, 200L, 2L)))
  }

  test("banding engine instances: (4,1) == neardupFromHashes, (6,3) == wide tier") {
    // the two measured tiers must literally BE instances of the
    // generic engine — same values on the planted fixture
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val want = brutePairs(graft.operators.Multimodal.ImageNeardupMaxDist)
    val narrow = graft.operators.Multimodal.neardupFromHashes(ah)
      .as[(Long, Long, Long)].collect().toSeq
    val wide = graft.operators.Multimodal.neardupFromHashesWide(ah)
      .as[(Long, Long, Long)].collect().toSeq
    assert(narrow == want && wide == want)
  }
}
