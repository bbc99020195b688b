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

  /** 44-byte RIFF/PCM wrapper around raw 16-bit mono samples — the
    * planted-copy fixtures' shared WAV builder (one definition so a
    * header-format fix can never reach one test and miss the other).
    */
  private def wavOf(samples: Array[Short]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(16000); bb.putInt(32000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    bb.array()
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

  test("audioChunkNeardup: a copied segment inside two long clips is detected at its offset") {
    import graft.operators.Multimodal.{AudioChunkSamples, RealCodecs}
    // two synthetic long clips with DIFFERENT acoustic content, clip B
    // carrying a verbatim copy of clip A's chunks [2, 5) at its chunks
    // [6, 9) — the partial-overlap shape whole-clip fingerprints
    // average away (asserted below)
    val cs = AudioChunkSamples
    def sample(d: Long, i: Int): Short = {
      val base = (d * 13 + i * 29) % 16384 - 8192
      val env = 1 + (d * 3 + i / 256) % 4
      (base * env).toShort
    }
    val a = Array.tabulate(10 * cs)(i => sample(1L, i))
    val b = Array.tabulate(12 * cs)(i => sample(2L, i))
    System.arraycopy(a, 2 * cs, b, 6 * cs, 3 * cs) // the planted copy
    val chA = RealCodecs.fingerprintWavChunks(wavOf(a), cs)
    val chB = RealCodecs.fingerprintWavChunks(wavOf(b), cs)
    // copied chunks fingerprint IDENTICALLY regardless of surroundings
    // (each chunk is compared against its OWN mean — the design point)
    assert((0 until 3).forall(k => chA(2 + k)._3 == chB(6 + k)._3))
    // ...while the whole-clip wide keys are band-invisible to each other
    val (_, _, wahi, walo) = RealCodecs.fingerprintWavWide(wavOf(a))
    val (_, _, wbhi, wblo) = RealCodecs.fingerprintWavWide(wavOf(b))
    assert(java.lang.Long.bitCount(wahi ^ wbhi) +
      java.lang.Long.bitCount(walo ^ wblo) >
      graft.operators.Multimodal.ImageNeardupMaxDist,
      "fixture degenerate: whole-clip keys already near-dup")
    val ch = (chA.map(c => (1L, c._1.toLong, c._2.toLong, c._3)) ++
      chB.map(c => (2L, c._1.toLong, c._2.toLong, c._3)))
      .toDF("doc_id", "chunk", "n_samples", "afp").localCheckpoint()
    val got = graft.operators.Multimodal.audioChunkNeardupOn(ch)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // in-test reference: best offset-consistent aligned run over the
    // exact chunk fingerprints (accidental same-offset collisions, if
    // any, legitimately extend the run — the reference counts them too)
    val matches = for {
      ca <- chA; cb <- chB if ca._3 == cb._3
    } yield (cb._1 - ca._1).toLong
    val byOff = matches.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bestN = byOff.values.max
    val bestOff = byOff.filter(_._2 == bestN).keys.min
    assert(bestN >= 3L, s"planted 3-chunk run not dominant: $byOff")
    assert(got == Seq((1L, 2L, bestOff, bestN)),
      s"chunk near-dup missed the planted segment: $got vs offset=$bestOff n=$bestN")
    assert(bestOff == 4L, s"planted offset 4 not the best: $byOff")
  }

  test("mediaPipelineNear: cross-modality components, keep-rep, layout == reference") {
    // planted multimodal corpus: docs 0,1 share a joint key; doc 2 is
    // an IMAGE near-dup of their class; doc 3 an AUDIO near-dup of
    // doc 2 — the four must chain into ONE component ACROSS modalities
    // (the fold's point: neither single-modality operator sees this);
    // docs 4,5 an isolated exact class; doc 6 a singleton
    val a = (0x12345678L, 0x9abcdef0L)
    val rows = Seq(
      (0L, a._1, a._2, 0x11111111L, 0x22222222L),
      (1L, a._1, a._2, 0x11111111L, 0x22222222L),
      (2L, a._1, a._2 ^ 3L, 0x33333333L, 0x44444444L),
      (3L, 0x0f0f0f0fL, 0xf0f0f0f0L, 0x33333333L, 0x44444445L),
      (4L, 0xaaaaaaaaL, 0x55555555L, 0x66666666L, 0x99999999L),
      (5L, 0xaaaaaaaaL, 0x55555555L, 0x66666666L, 0x99999999L),
      (6L, 0x77777777L, 0x88888888L, 0xbbbbbbbbL, 0xccccccccL))
    val img = rows.map(r => (r._1, r._2, r._3))
      .toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val aud = rows.map(r => (r._1, r._4, r._5))
      .toDF("doc_id", "afp_hi", "afp_lo").localCheckpoint()
    // in-JVM reference: exact joint classes → rep graph connected by
    // either modality's Hamming ball → union-find → keep-rep
    val classes = rows.groupBy(r => (r._2, r._3, r._4, r._5)).values
      .map(ds => (ds.map(_._1).min, ds.size.toLong)).toSeq
    val maxD = graft.operators.Multimodal.ImageNeardupMaxDist
    def near(x: (Long, Long), y: (Long, Long)) =
      java.lang.Long.bitCount(x._1 ^ y._1) +
        java.lang.Long.bitCount(x._2 ^ y._2) <= maxD
    val byRep = rows.map(r => r._1 -> r).toMap
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((r1, _) <- classes; (r2, _) <- classes if r1 < r2) {
      val (d1, d2) = (byRep(r1), byRep(r2))
      if (near((d1._2, d1._3), (d2._2, d2._3)) ||
          near((d1._4, d1._5), (d2._4, d2._5))) {
        val (ra, rb) = (find(r1), find(r2))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val wantKeep = classes.groupBy(c => find(c._1))
      .map { case (comp, cs) => (comp, cs.map(_._2).sum) }.toSeq.sorted
    assert(wantKeep.size >= 3, s"fixture degenerate: $wantKeep")
    assert(find(3L) == 0L, "cross-modality chain broken in the reference")
    val got = graft.operators.Pipeline.mediaPipelineNearOn(img, aud)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).sorted == wantKeep,
      s"keepers diverged: ${got.map(r => (r._1, r._2)).sorted} vs $wantKeep")
    // the layout stage must be EXACTLY shardAssignOn over the keepers
    val wantLayout = graft.operators.Dedup.shardAssignOn(
        wantKeep.toDF("doc_id", "n_docs"))
      .select(col("doc_id"), col("n_docs"), col("shard"), col("pos"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.sorted == wantLayout.sorted, "layout diverged from shardAssignOn")
  }

  test("streamed delta image near-dup == batch delta restricted to new-vs-existing") {
    // the serving twin (stream-static band probe, zero state) must be
    // value-identical to the batch delta operator's new_existing cut —
    // proving the first-shared-band emission dedup exactly replaces
    // the batch path's distinct()
    val stream = graft.streaming.DocumentStreams
      .streamedDeltaImageNeardup(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = graft.operators.Multimodal.deltaImageNeardup(spark, sfDir)
      .filter(col("pair_type") === "new_existing")
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("fingerprintWavWindows: stride==chunk degenerates to the chunker; half-stride catches unaligned copies") {
    import graft.operators.Multimodal.{AudioChunkSamples, RealCodecs}
    val cs = AudioChunkSamples
    val st = cs / 2
    // per-doc envelope PERIODS (256 vs 160) keep the two clips'
    // background fingerprints genuinely distinct — a 16-bit energy key
    // is coarse enough that same-period synthetic clips collide on
    // background chunks, which is fixture noise, not detection
    def sample(d: Long, i: Int): Short = {
      val base = (d * 13 + i * 29) % 16384 - 8192
      val env = 1 + (d + i / (if (d == 1L) 256 else 160)) % 4
      (base * env).toShort
    }
    // degeneracy: stride == chunkSamples IS the boundary chunker
    val probe = wavOf(Array.tabulate(3 * cs + 100)(i => sample(3L, i)))
    assert(RealCodecs.fingerprintWavWindows(probe, cs, cs) ==
      RealCodecs.fingerprintWavChunks(probe, cs))
    // planted copy aligned to a STRIDE boundary but NOT a chunk
    // boundary: clip A's samples [2cs, 5cs) land at B's [6cs + st,
    // 9cs + st) — the boundary chunker's windows all straddle copy
    // edges, the strided windows fully inside must match
    val a = Array.tabulate(10 * cs)(i => sample(1L, i))
    val b = Array.tabulate(12 * cs)(i => sample(2L, i))
    System.arraycopy(a, 2 * cs, b, 6 * cs + st, 3 * cs)
    def nearOn(cha: Seq[(Int, Int, Long)], chb: Seq[(Int, Int, Long)]) =
      graft.operators.Multimodal.audioChunkNeardupOn(
        (cha.map(c => (1L, c._1.toLong, c._2.toLong, c._3)) ++
          chb.map(c => (2L, c._1.toLong, c._2.toLong, c._3)))
          .toDF("doc_id", "chunk", "n_samples", "afp").localCheckpoint())
        .as[(Long, Long, Long, Long)].collect().toSeq
    val chunked = nearOn(RealCodecs.fingerprintWavChunks(wavOf(a), cs),
      RealCodecs.fingerprintWavChunks(wavOf(b), cs))
    val strided = nearOn(RealCodecs.fingerprintWavWindows(wavOf(a), cs, st),
      RealCodecs.fingerprintWavWindows(wavOf(b), cs, st))
    // the chunker is BLIND to the copy: a 3-chunk run would score
    // n_aligned >= 3; anything at or below 2 is coincidence-grade
    // background collision of the coarse 16-bit key
    assert(chunked.forall(_._4 < 3L),
      s"boundary chunker saw the chunk-unaligned copy: $chunked")
    // A's copied region covers strided windows w = 4..8 (start 2cs,
    // len 3cs); in B they sit at w = 13..17 — offset 9, 5 aligned
    assert(strided.exists(r => r._3 == 9L && r._4 >= 5L),
      s"strided windows missed the stride-aligned copy: $strided")
  }

  test("deltaImageDupClusters: label maintenance == full recompute (bridge/merge/isolated)") {
    // hi families 8+ bits apart so only the PLANTED lo-distances link;
    // the batch exercises every maintenance case: E bridges the
    // previously-ISOLATED base hash A (absent from the stored label
    // table — the remap alone would miss it); F joins the existing
    // {C,D} component; L MERGES two separate base components {J},{K};
    // G stays isolated; B stays an untouched base singleton
    val base = Seq(
      (100L, 0L, 1L), (101L, 0L, 0xf0L),            // A isolated, B isolated
      (102L, 255L, 0L), (103L, 255L, 3L),           // {C,D}
      (106L, 65280L, 0L), (107L, 65280L, 63L))      // {J}, {K} separate
      .toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val batch = Seq(
      (200L, 0L, 3L),                                // E: bridges A
      (201L, 255L, 2L),                              // F: joins {C,D}
      (202L, 65280L, 7L),                            // L: merges J & K
      (203L, 16711680L, 0L))                         // G: isolated
      .toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val inc = graft.operators.Multimodal.deltaImageDupClustersOn(base, batch)
      .as[(Long, Long)].collect().toSeq
    val full = graft.operators.Multimodal
      .imageDupClustersOn(base.unionByName(batch))
      .as[(Long, Long)].collect().toSeq
    assert(inc == Seq((100L, 2L), (102L, 3L), (106L, 3L)),
      s"maintained clusters wrong: $inc")
    assert(inc == full, "incremental path diverged from full recompute")
    // and on the wider planted fixture split by doc id
    val ah = planted.toDF("doc_id", "ahash_hi", "ahash_lo").localCheckpoint()
    val inc2 = graft.operators.Multimodal.deltaImageDupClustersOn(
        ah.filter(col("doc_id") % 5 =!= 0), ah.filter(col("doc_id") % 5 === 0))
      .as[(Long, Long)].collect().toSeq
    val full2 = graft.operators.Multimodal.imageDupClustersOn(ah)
      .as[(Long, Long)].collect().toSeq
    assert(inc2.nonEmpty && inc2 == full2)
  }

  test("deltaDupClusters (text): label maintenance == full recompute on the corpus") {
    // the SAME maintenance engine as the visual twin, on doc-granularity
    // text pairs: maintained clusters over base labels + delta bridges
    // must equal the full pointer-jumping recompute
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val inc = graft.operators.Dedup.deltaDupClustersOn(docs)
      .as[(Long, Long)].collect().toSeq
    val full = graft.operators.Dedup.duplicateClustersOn(docs)
      .as[(Long, Long)].collect().toSeq
    assert(inc.nonEmpty && inc == full,
      s"text label maintenance diverged: ${inc.take(5)} vs ${full.take(5)}")
  }

  test("graded delta cluster entries (materialized base labels) == their full twins") {
    // the stored-label read-back path must stay value-identical to the
    // full recompute entries — the scratch-artifact discipline plus
    // the maintenance theorem in one assertion per family
    val incImg = graft.operators.Multimodal.deltaImageDupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val fullImg = graft.operators.Multimodal.imageDupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(incImg.nonEmpty && incImg == fullImg)
    val incTxt = graft.operators.Dedup.deltaDupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    val fullTxt = graft.operators.Dedup.duplicateClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(incTxt.nonEmpty && incTxt == fullTxt)
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
