package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 operators: the Manku wide banding tier (diverse-hash
  * visual near-dup escalation), the widened/bandable audio
  * fingerprint family, the chunked long-clip fingerprint path, the
  * multimodal end-to-end cascade, and batch proximity search.
  */
class Round17OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** Diverse 64-bit hashes with PLANTED near-duplicates — the shape
    * the corpus fixture can never produce (its pixel synth caps at
    * 256 distinct hashes): 400 ~uniform random hashes, plus 40
    * variants of random sources at Hamming distance 0–5. Distances
    * 4–5 MUST be excluded by both tiers (banding recall completeness
    * is only claimed at ≤ 3, but precision — the popcount verify — is
    * what kills anything a band collision over-admits).
    */
  private lazy val planted: Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(20260815L)
    val base = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt().toLong & 0xffffffffL,
        rnd.nextInt().toLong & 0xffffffffL)
    }
    val variants = (0 until 40).map { j =>
      val (_, hi, lo) = base(rnd.nextInt(base.size))
      val flips = j % 6 // 0..5 bit flips, positions anywhere in 0..63
      var v = (hi << 32) | lo
      (0 until flips).foreach(_ => v ^= 1L << rnd.nextInt(64))
      (400L + j, v >>> 32, v & 0xffffffffL)
    }
    base ++ variants
  }

  /** Brute-force doc-pair oracle over the planted fixture. */
  private lazy val expectedPairs: Seq[(Long, Long, Long)] = {
    val maxD = graft.operators.Multimodal.ImageNeardupMaxDist
    (for {
      a <- planted; b <- planted if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= maxD
    } yield (a._1, b._1, d.toLong)).sorted
  }

  test("neardupFromHashesWide == 4-band tier == brute force on planted diverse hashes") {
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val narrow = graft.operators.Multimodal.neardupFromHashes(ah)
      .as[(Long, Long, Long)].collect().toSeq
    val wide = graft.operators.Multimodal.neardupFromHashesWide(ah)
      .as[(Long, Long, Long)].collect().toSeq
    assert(expectedPairs.nonEmpty && expectedPairs.exists(_._3 > 0),
      "fixture degenerate: no cross-class near-dup pairs planted")
    assert(narrow == expectedPairs, "4-band tier diverged from brute force")
    assert(wide == expectedPairs, "wide tier diverged from brute force")
  }

  test("routeWide: band-skewed hashes escalate to the wide tier, uniform ones do not") {
    // uniform-ish (the planted fixture): candidate volume per hash is
    // tiny => stay on the 4-band tier
    val uni = planted.toDF("doc_id", "ahash_hi", "ahash_lo")
    assert(!graft.operators.Multimodal.routeWide(uni),
      "uniform fixture escalated to the wide tier")
    // band-skewed: 20k DISTINCT hashes that all share band 0 (low 16
    // bits of lo) — the dark-image/blank-thumbnail shape. The 4-band
    // tier would owe C(20k,2) ≈ 2·10^8 candidate enumerations
    // (> 2^13 per hash); the router must measure that from occupancy
    // alone (no candidate is ever enumerated) and escalate.
    val rnd = new scala.util.Random(7L)
    val skewed = (0 until 20000).map { i =>
      (i.toLong, rnd.nextInt().toLong & 0xffffffffL,
        ((i.toLong << 16) | 0xbeefL) & 0xffffffffL)
    }.toDF("doc_id", "ahash_hi", "ahash_lo")
    assert(graft.operators.Multimodal.routeWide(skewed),
      "band-skewed fixture did not escalate to the wide tier")
  }

  test("imageNeardupAuto routes the repeat-heavy corpus to the 4-band tier and matches") {
    // d <= 256 on the fixture => the router must take the 4-band arm;
    // value identity with the direct entry is the routing contract
    // (the graphKnnAuto precedent)
    val auto = graft.operators.Multimodal.imageNeardupAuto(spark, sfDir).collect()
    val direct = graft.operators.Multimodal.imageNeardup(spark, sfDir).collect()
    assert(auto.nonEmpty && auto.toSeq == direct.toSeq)
  }

  test("fingerprintWavChunks: long clip past the 2^24 whole-clip bound, exact per-chunk bits") {
    import graft.operators.Multimodal.RealCodecs
    // 2^24 samples (~17.5 min at 16 kHz, a 33 MB WAV): the whole-clip
    // fingerprints must refuse loudly, the chunked path must not
    val n = 1 << 24
    val wav = RealCodecs.syntheticWavAm(7L, n, 16000)
    intercept[IllegalArgumentException](RealCodecs.fingerprintWav(wav))
    intercept[IllegalArgumentException](RealCodecs.fingerprintWavWide(wav))
    val chunks = RealCodecs.fingerprintWavChunks(wav, 1 << 20)
    assert(chunks.size == 16 && chunks.forall(_._2 == (1 << 20)),
      s"expected 16 full 2^20-sample chunks: ${chunks.take(4)}")
    // independent replay of one chunk's bits from the closed-form
    // sample definition (the DuckDB-oracle convention, in-JVM): chunk
    // c covers global samples [c*W, (c+1)*W); frame mean vs CHUNK mean
    val c = 3
    val w = 1 << 20
    def sample(i: Int): Long = {
      val base = (7L * 13 + i.toLong * 17) % 16384 - 8192
      val env = 1 + (7L + i.toLong * 16 / n) % 4
      math.abs(base * env)
    }
    val fs = new Array[Long](16); val fn = new Array[Long](16)
    var total = 0L
    (0 until w).foreach { j =>
      val a = sample(c * w + j)
      val f = (j.toLong * 16 / w).toInt
      fs(f) += a; fn(f) += 1; total += a
    }
    var want = 0L
    (0 until 16).foreach(f => if (fs(f) * w > total * fn(f)) want |= 1L << f)
    assert(chunks(c)._3 == want,
      f"chunk $c fingerprint ${chunks(c)._3}%x != closed-form $want%x")
    // short tail chunk: a clip that is not a multiple of the window
    val odd = RealCodecs.fingerprintWavChunks(
      RealCodecs.syntheticWavAm(11L, 1300, 16000), 512)
    assert(odd.map(_._2) == Seq(512, 512, 276),
      s"tail chunk sizing wrong: ${odd.map(_._2)}")
  }

  test("imageDupClusters semantics: CC over planted pairs == union-find reference") {
    // the graded fixture collapses to ONE component (the cyclic pixel
    // classes chain — hash-matched but a thin value check), so the
    // multi-component semantics are pinned here: pointer-jumping CC
    // over the planted near-dup pairs must equal an in-JVM union-find
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    // the graded hash-granularity path (CC over distinct hashes, docs
    // re-entering at the final aggregation) AND the generic doc-level
    // CC must both equal the reference — proving the granularity
    // restructure preserved component semantics exactly
    val got = graft.operators.Multimodal.imageDupClustersOn(ah)
      .as[(Long, Long)].collect().toSeq
    // the distributed arm forced on the same fixture (driverGate = -1):
    // both routes must agree — the size gate can never change values
    val gotDist = graft.operators.Multimodal.imageDupClustersOn(ah, -1L)
      .as[(Long, Long)].collect().toSeq
    val docLevel = graft.operators.Dedup.clustersFromPairs(
        graft.operators.Multimodal.neardupFromHashes(ah)
          .select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toSeq
    // union-find over the brute-force pair oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    expectedPairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = expectedPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.groupBy(find).map { case (rep, ms) =>
      (rep, ms.size.toLong) }.toSeq.sorted
    assert(want.size > 1, "planted fixture degenerate: one component")
    assert(got == want, "hash-level CC diverged from union-find reference")
    assert(gotDist == want, "forced-distributed arm diverged from reference")
    assert(docLevel == want, "doc-level CC diverged from union-find reference")
  }

  test("imageDupClusters driver arm: spread gray-code chain collapses to one component") {
    // gray codes: consecutive codes differ in exactly ONE bit, so
    // g(0)..g(n-1) chain into a single component at Hamming 1. The
    // 10 code bits are SPREAD to positions 6 apart (a bit permutation
    // — all pairwise distances preserved) so the band buckets stay
    // populated evenly instead of piling every hash into the all-zero
    // hi bands. driverGate = MaxValue FORCES the driver union-find
    // arm, so this test's arm coverage is deterministic, not an
    // accident of the pair count (dense gray codes have ~300 in-radius
    // neighbors each — at the old 100k scale that was 37M pairs
    // silently routed to the DISTRIBUTED arm; the driver-arm claim
    // was vacuous and the banding bill enormous).
    val n = 1024
    val chain = (0 until n).map { i =>
      val g = i ^ (i >> 1)
      val spread = (0 until 10).foldLeft(0L) { (acc, j) =>
        acc | (((g >> j) & 1).toLong << (j * 6))
      }
      (i.toLong, spread >>> 32, spread & 0xffffffffL)
    }.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val got = graft.operators.Multimodal
      .imageDupClustersOn(chain, driverGate = Long.MaxValue)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, n.toLong)),
      s"gray-code chain did not collapse to one $n-member component: " +
        s"${got.take(3)}... (${got.size} rows)")
  }

  test("driverUnionFind: million-hop parent chain labels iteratively (stack regression)") {
    // min-linking without rank degenerates to an O(n) parent chain
    // when a path's edges arrive root-to-leaf: processing (i, i+1)
    // DESCENDING makes every union link a fresh root (parent[i+1]=i)
    // with no compression opportunity, so the first find() of the
    // label pass walks the full 2^20-hop chain — a recursive find
    // overflows the JVM stack here; the iterative walk+compress must
    // not. This drives the union-find DIRECTLY: the banded path
    // cannot produce a million-node pure chain without quadratic
    // bucket blowup (see above), which is exactly why the old
    // banding-level "deep chain" claim was vacuous.
    val n = (1 << 20) + 3
    val pairs = Array.tabulate(n - 1)(k => { val i = n - 2 - k; (i.toLong, i + 1L) })
    val labels = graft.operators.Dedup.driverUnionFind(pairs)
    assert(labels.size == n && labels.forall(_._2 == 0L),
      "deep-chain labels wrong — union-find broke on a 2^20-hop chain")
  }

  test("corpus CC label table: materialized read-back == recompute (value identity)") {
    // q_dup_clusters and q_dedup_keep_best both consume the converged
    // label fixed point; the scratch table must equal re-running the
    // pointer-jumping loop or the two entries could silently diverge
    val viaTable = graft.operators.Dedup.duplicateClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val recomputed = graft.operators.Dedup.clustersFromPairs(
        graft.operators.Dedup.materializedPairs(spark, sfDir)
          .select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toSeq
    assert(viaTable.nonEmpty && viaTable == recomputed)
  }

  test("audio wide-fingerprint table: materialized read-back == recompute (value identity)") {
    // the Round16OpsSpec discipline for every scratch-materialized
    // artifact: the once-per-corpus parquet must be value-identical to
    // recomputing the decode+fingerprint pipeline, or consumers and
    // the oracle could silently diverge
    val fromTable = graft.operators.Multimodal
      .audioFingerprintWide(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val recomputed = graft.operators.Multimodal
      .audioFpWideOf(spark,
        graft.tables.Tables.documents(spark, sfDir).select(col("doc_id")))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(fromTable.nonEmpty && fromTable == recomputed)
    // the key is genuinely bandable on the fixture: more than one
    // distinct fingerprint and at least one set bit in the hi half
    // (bits 32-63 — a 16-bit-wide key would leave hi always zero)
    assert(fromTable.map(r => (r._3, r._4)).distinct.size > 1)
    assert(fromTable.exists(_._3 != 0L), "hi half never set — key not 64-bit")
  }

  test("deltaShardAssign: existing layout frozen byte-for-byte, new batch appended per shard") {
    val ids = graft.tables.Tables.documents(spark, sfDir).select(col("doc_id"))
    val old = ids.filter(col("doc_id") % 10 < 8)
    val nw = ids.filter(col("doc_id") % 10 >= 8)
    val base = graft.operators.Dedup.shardAssignOn(old)
      .as[(Long, Long, Long)].collect().toSeq
    val delta = graft.operators.Dedup
      .deltaShardAssignOn(graft.operators.Dedup.shardAssignOn(old), nw)
      .as[(Long, Long, Long)].collect().toSeq
    val oldIds = base.map(_._1).toSet
    // THE contract: ingest must not move a single existing row — the
    // writer's already-written shard files stay valid
    assert(delta.filter(r => oldIds(r._1)) == base,
      "delta ingest moved existing assignments")
    // the combined layout still PARTITIONS each shard: positions
    // exactly 0..|shard|-1, and every new doc placed exactly once
    val byShard = delta.groupBy(_._2)
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.size).toSeq,
        s"shard $s positions not contiguous after ingest")
    }
    val newRows = delta.filterNot(r => oldIds(r._1))
    assert(newRows.map(_._1).toSet ==
      nw.as[Long].collect().toSet, "new batch not fully placed")
    // appended rows all rank AFTER the shard's existing rows
    val baseMax = base.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).max }
    newRows.foreach { case (id, s, p) =>
      assert(p > baseMax.getOrElse(s, -1L),
        s"new doc $id placed inside the frozen region of shard $s")
    }
    // layout-identity guard: a base built with a DIFFERENT shard count
    // must refuse loudly — its mod rule would mis-place every new row.
    // LARGER count: shard ids overflow the range check (deterministic)
    val mismatched = graft.operators.Dedup.shardAssignOn(old, 16)
    intercept[IllegalArgumentException](
      graft.operators.Dedup.deltaShardAssignOn(mismatched, nw))
    // SMALLER count: every id sits inside 0..7 so the range check
    // alone cannot see it — the mod-rule spot-check must refuse
    val smaller = graft.operators.Dedup.shardAssignOn(old, 4)
    intercept[IllegalArgumentException](
      graft.operators.Dedup.deltaShardAssignOn(smaller, nw))
  }

  test("proximityBatchOn == per-phrase proximitySearchOn over the fixture batch") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val k = graft.operators.Retrieval.ProximityK
    val batch = graft.operators.Retrieval.ProximityBatch
    val got = graft.operators.Retrieval
      .proximityBatchOn(spark, docs, batch, k)
      .as[(Long, Long, Long)].collect().toSeq
    val want = batch.flatMap { case (qid, phrase) =>
      graft.operators.Retrieval.proximitySearchOn(docs, phrase, k)
        .as[(Long, Long)].collect().map { case (d, p) => (qid, d, p) }
    }.sorted
    assert(want.nonEmpty, "fixture batch found nothing — weak fixture")
    assert(got == want, s"batch diverged from the per-phrase loop")
  }
}
