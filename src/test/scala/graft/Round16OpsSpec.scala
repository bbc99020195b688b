package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 additions: spec-side error bounds for the rows-only sketch
  * tier (the gate can hash-match exact queries only, so the sketches'
  * correctness is pinned HERE, against the exact twins on the same
  * fixture, each round — bounded, not just trusted).
  */
class Round16OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** approx_count_distinct at rsd=0.02 has a 2% standard error; 5σ
    * (10% relative) is a deterministic-fixture margin no correct HLL
    * implementation misses (the estimate is a pure function of the
    * hashed key set — no run-to-run variance to flake on).
    */
  test("approxDistinct: every HLL estimate within 5x rsd of the exact count") {
    val exact = graft.operators.Relational.distinctAgg(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.operators.Relational.approxDistinctAgg(spark, sfDir)
      .collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (supps, parts) = exact(r.getString(0))
      def within(est: Long, truth: Long, what: String): Unit =
        assert(math.abs(est - truth).toDouble <= 0.10 * truth,
          s"flag ${r.getString(0)} $what: HLL $est vs exact $truth " +
            "outside the 10% (5x rsd=0.02) envelope")
      within(r.getLong(1), supps, "supps")
      within(r.getLong(2), parts, "parts")
    }
  }

  /** The mergeable-sketch rollup must bound the same way AFTER the
    * union re-aggregation (a broken merge path typically collapses or
    * doubles estimates — far outside 10%), and its n_rows passthrough
    * is exact arithmetic, equal not approximate.
    */
  test("hllSketchRollup: unioned estimates within 10% of exact; n_rows exact") {
    val exact = graft.operators.Relational.distinctAgg(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val rolled = graft.operators.Relational.hllSketchRollup(spark, sfDir)
      .collect()
    assert(rolled.nonEmpty && rolled.length == exact.size)
    rolled.foreach { r =>
      val (supps, nRows) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - supps).toDouble <= 0.10 * supps,
        s"flag ${r.getString(0)}: unioned sketch ${r.getLong(1)} vs " +
          s"exact $supps outside the 10% envelope")
      assert(r.getLong(2) == nRows,
        s"flag ${r.getString(0)}: n_rows drifted through the rollup")
    }
  }

  /** The batch resolver (ONE slot-count join for all phrases) must
    * agree phrase-for-phrase with the single-phrase adjacency-join
    * resolver — two different algorithms over the same postings, so a
    * slot-count bug (repeated terms, anchors below 0, cross-phrase
    * bleed) can't hide behind a shared code path.
    */
  test("phraseBatch: per-phrase results equal the single-phrase resolver") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val batch = graft.operators.Retrieval.PhraseBatch
    val got = graft.operators.Retrieval.phraseBatchOn(spark, docs, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(got.values.exists(_.nonEmpty), "fixture batch found nothing")
    batch.foreach { case (qid, phrase) =>
      val single = graft.operators.Retrieval.phraseSearchOn(docs, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.getOrElse(qid, Set.empty) == single,
        s"phrase $qid ($phrase): batch and single resolvers disagree")
    }
    // the repeated-term phrase must really exercise its case
    assert(batch.exists { case (_, p) => p.distinct.size < p.size })
  }

  test("proximitySearch: matches an independent in-JVM windowed scan") {
    val phrase = graft.operators.Retrieval.PhraseQuery
    val k = graft.operators.Retrieval.ProximityK
    val got = graft.operators.Retrieval.proximitySearch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "fixture phrase must have proximity hits")
    // independent scan: ordered chains with gaps in (0, k]
    val expected = graft.tables.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().flatMap { r =>
        val toks = r.getString(1).toLowerCase.split("[^a-z]").filter(_.nonEmpty)
        def chains(fromPos: Int, rest: Seq[String]): Boolean =
          rest.isEmpty || (1 to k).exists { g =>
            val p = fromPos + g
            p < toks.length && toks(p) == rest.head && chains(p, rest.tail)
          }
        toks.indices.collect {
          case i if toks(i) == phrase.head && chains(i, phrase.tail) =>
            (r.getLong(0), i.toLong)
        }
      }.toSet
    assert(got == expected, "band-join result differs from direct scan")
    // proximity must be a strict superset of exact-adjacency hits here
    val exact = graft.operators.Retrieval.phraseSearch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(got), "NEAR/k lost an exact-adjacency match")
  }

  /** The linear-output dedup decision must agree with an in-JVM
    * regroup of the hash table: min-doc representative, exact class
    * sizes, and one row per image (the partition property).
    */
  test("imageDedup: min-doc representative and class sizes partition the corpus") {
    val Multimodal = graft.operators.Multimodal
    val ah = Multimodal.imageAhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val classes = ah.groupBy(_._2).map { case (h, ms) =>
      h -> (ms.map(_._1).min, ms.size.toLong) }
    val ded = Multimodal.imageDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ded.length == ah.length, "not one row per image")
    val hashOf = ah.toMap
    ded.foreach { case (doc, rep, n) =>
      val (expRep, expN) = classes(hashOf(doc))
      assert(rep == expRep && n == expN,
        s"doc $doc: got (rep=$rep, n=$n), expected ($expRep, $expN)")
    }
    // the representative relation is consistent: reps map to themselves
    val reps = ded.filter { case (doc, rep, _) => doc == rep }
    assert(reps.length == classes.size, "rep count != class count")
  }

  /** The r15-verdict double-build fix, PPJoin edition: q_neardup_auto's
    * exact route and q_ngram_jaccard consume one shared pair
    * materialization. Certify (a) the routed entry is row-identical to
    * the direct query (what lets it share the oracle), and (b) the
    * second consumer's plan READS the scratch parquet instead of
    * re-running the prefix-filter join.
    */
  test("nearDupPairsAuto: exact route shares q_ngram_jaccard's materialized pairs") {
    val direct = graft.operators.Dedup.ngramJaccardPairs(spark, sfDir)
      .collect().map(_.toSeq)
    val auto = graft.operators.Dedup.nearDupPairsAuto(spark, sfDir)
      .collect().map(_.toSeq)
    assert(direct.nonEmpty && direct.toSeq == auto.toSeq)
    val plan = graft.operators.Dedup.ngramJaccardPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    // assert on ReadSchema, not the Location path: FileScan locations
    // truncate at spark.sql.maxMetadataStringLength, so a long
    // warehouse prefix would elide any path substring (the
    // q_image_neardup audit precedent); only the pair read-back scans
    // this exact 3-column schema
    assert(plan.contains(
        "ReadSchema: struct<id_a:bigint,id_b:bigint,jaccard:double>"),
      s"q_ngram_jaccard did not read the shared materialization:\n${plan.take(800)}")
    assert(!plan.contains("shingle"),
      "a consumer re-ran the shingle pipeline instead of reading back")
  }

  /** The audio fingerprint must agree with a closed-form recompute
    * that never touches the RIFF codec path — same differential
    * discipline as the PNG features: synthesis is the fixture, DECODE
    * is what's under test.
    */
  test("audioFingerprint: bits match the closed-form sample definition") {
    val F = graft.operators.Multimodal.AudioFpFrames
    val got = graft.operators.Multimodal.audioFingerprint(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, n, afp) =>
      assert(n == 1000 + id % 500, s"doc $id: wrong sample count")
      val amps = (0L until n).map { i =>
        val f = i * F / n
        math.abs(((id * 13 + i * 17) % 16384 - 8192) * (1 + (id + f) % 4))
      }
      val total = amps.sum
      var exp = 0L
      (0 until F).foreach { f =>
        val idx = (0L until n).filter(i => i * F / n == f)
        val fs = idx.map(i => amps(i.toInt)).sum
        if (fs * n > total * idx.length) exp |= 1L << f
      }
      assert(afp == exp, s"doc $id: fp $afp != closed-form $exp")
    }
    // the fingerprint must actually discriminate (not constant)
    assert(got.map(_._3).distinct.length > 1, "fingerprint is constant")
  }

  /** Same fix, BPE edition: merges, tokenize, and the streaming deploy
    * all consume one materialized model instead of re-running the
    * training loop. Certify value identity against a fresh train AND
    * that the tokenize plan reads the model parquet.
    */
  test("bpe: dir-based entries share one materialized model; values equal a fresh train") {
    val Tok = graft.operators.Tokenizer
    val freshMerges = Tok.bpeMergesOn(spark,
      graft.tables.Tables.documents(spark, sfDir)).collect().map(_.toSeq)
    val shared = Tok.bpeMerges(spark, sfDir).collect().map(_.toSeq)
    assert(freshMerges.nonEmpty && freshMerges.toSeq == shared.toSeq)
    val plan = Tok.bpeTokenize(spark, sfDir)
      .queryExecution.executedPlan.toString
    // ReadSchema, not the truncatable Location path: only the model
    // read-back scans (word, seq) — a retrain would show the corpus
    // scan + merge-replace pipeline instead
    assert(plan.contains("ReadSchema: struct<word:string,seq:string>"),
      s"tokenize did not read the shared model:\n${plan.take(800)}")
    val rules = Tok.learnRules(spark, sfDir)
    assert(rules.map(r => (r.merge_round, r.t1, r.t2, r.pair_count)).toSeq ==
      freshMerges.map(r => (r(0), r(1), r(2), r(4))).toSeq,
      "streaming deploy rules drifted from the trained merges")
  }

  /** The shard layout must PARTITION the corpus: one row per doc,
    * every shard's positions exactly 0..|shard|-1 (a gap or repeat
    * means a training loader skips or double-reads a sample), and the
    * assignment roughly balanced (mix31 equidistributes ids — a
    * degenerate hash would pile everything into few shards).
    */
  test("shardAssign: contiguous per-shard positions partition the corpus") {
    val rows = graft.operators.Dedup.shardAssign(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs, "not one row per document")
    assert(rows.map(_._1).distinct.length == rows.length, "doc repeated")
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet.subsetOf(
      (0L until graft.operators.Dedup.NumShards.toLong).toSet))
    byShard.foreach { case (s, ms) =>
      assert(ms.map(_._3).sorted.toSeq == (0L until ms.length.toLong),
        s"shard $s positions not contiguous 0..${ms.length - 1}")
    }
    val sizes = byShard.values.map(_.length)
    assert(sizes.max < 3 * sizes.min + 8,
      s"shard sizes badly skewed: ${sizes.toList.sorted}")
  }
}
