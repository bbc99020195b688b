package graft

import graft.operators.{Dedup, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance and idempotence properties — the
  * reference's differential philosophy (sequential vs distributed must
  * byte-match, map_reduce.ex:5-19) generalized: results must not depend
  * on HOW the data was sharded. The reference itself violates this
  * (its distributed path reduces per intermediate file, SURVEY §2.1
  * quirks); our operators must not.
  */
class InvarianceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select($"doc_id", $"text")

  test("word count is invariant under input partitioning") {
    val baseline = TextAnalysis.wordCount(spark, sfDir).collect().toSeq
    for (n <- Seq(1, 2, 7, 16)) {
      val words = Tables.documents(spark, sfDir).repartition(n)
        .select(explode(graft.functions.TextFunctions.upperTokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"word")
      assert(words.collect().toSeq === baseline, s"diverged at $n partitions")
    }
  }

  test("minhash signatures are invariant under input partitioning") {
    val baseline = Dedup.minhashSignaturesOn(docs).collect().toSeq
    val shuffled = Dedup.minhashSignaturesOn(docs.repartition(13)).collect().toSeq
    assert(shuffled === baseline)
  }

  test("BPE merge rules are invariant under input partitioning") {
    // the trainer collects an argmax per round — any hidden order
    // dependence (a non-total tie-break, a float partial) would pick
    // different rules under a different sharding
    val baseline = operators.Tokenizer.bpeMergesOn(spark, docs).collect().toSeq
    val shuffled = operators.Tokenizer.bpeMergesOn(spark, docs.repartition(13)).collect().toSeq
    assert(shuffled === baseline)
  }

  test("k-center selection is invariant under input partitioning") {
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val baseline = operators.Similarity.kCenterSelectOn(spark, e).collect().toSeq
    val shuffled = operators.Similarity.kCenterSelectOn(spark, e.repartition(7)).collect().toSeq
    assert(shuffled === baseline)
  }

  test("batch proximity search is invariant under input partitioning") {
    // the frontier rounds join on (query_id, doc_id) — any dependence
    // on the postings' physical layout (e.g. a non-deterministic
    // localCheckpoint interaction) would diverge here
    val batch = operators.Retrieval.ProximityBatch
    val k = operators.Retrieval.ProximityK
    val baseline = operators.Retrieval
      .proximityBatchOn(spark, docs, batch, k).collect().toSeq
    val shuffled = operators.Retrieval
      .proximityBatchOn(spark, docs.repartition(13), batch, k).collect().toSeq
    assert(shuffled === baseline)
  }

  test("shard layouts (full and delta) are invariant under input partitioning") {
    // positions are claimed to be a pure function of the id SET — the
    // window rank must not leak physical row order through skey ties
    val ids = Tables.documents(spark, sfDir).select($"doc_id")
    val baseline = Dedup.shardAssignOn(ids).collect().toSeq
    assert(Dedup.shardAssignOn(ids.repartition(13)).collect().toSeq === baseline)
    val old = ids.filter($"doc_id" % 10 < 8)
    val nw = ids.filter($"doc_id" % 10 >= 8)
    val delta = Dedup.deltaShardAssignOn(Dedup.shardAssignOn(old), nw)
      .collect().toSeq
    val deltaShuffled = Dedup.deltaShardAssignOn(
      Dedup.shardAssignOn(old.repartition(7)), nw.repartition(5))
      .collect().toSeq
    assert(deltaShuffled === delta)
  }

  test("delta media near-dup and label maintenance are invariant under input partitioning") {
    // the incremental family's collect points (the mini-CC's driver
    // union-find, the contraction joins) must not leak partition
    // layout into labels or pair lists
    val ah = graft.operators.Multimodal.ahashTable(spark, sfDir)
    val base = ah.filter($"doc_id" % 10 < 8)
    val batch = ah.filter($"doc_id" % 10 >= 8)
    val baseline = graft.operators.Multimodal
      .deltaNeardupFromHashes(base, batch).collect().toSeq
    val shuffled = graft.operators.Multimodal
      .deltaNeardupFromHashes(base.repartition(13), batch.repartition(3))
      .collect().toSeq
    assert(shuffled === baseline)
    val clustersA = graft.operators.Multimodal
      .deltaImageDupClustersOn(base, batch).collect().toSeq
    val clustersB = graft.operators.Multimodal
      .deltaImageDupClustersOn(base.repartition(7), batch.repartition(2))
      .collect().toSeq
    assert(clustersA.nonEmpty && clustersB === clustersA)
  }

  test("delta ANN maintenance is invariant under input partitioning") {
    // the round-19 incremental tiers: the Lloyd fit's partial sums,
    // the stateless batch assignment, and the insert beam's candidate
    // dedup/tie-breaks must not leak partition layout into results
    val e = Tables.embeddings(spark, sfDir)
    val ivfA = operators.Similarity.deltaIvfKnnOn(spark, e).collect().toSeq
    val ivfB = operators.Similarity.deltaIvfKnnOn(spark, e.repartition(13))
      .collect().toSeq
    assert(ivfA.nonEmpty && ivfB === ivfA)
    val gA = operators.Similarity.deltaGraphKnnOn(spark, e).collect().toSeq
    val gB = operators.Similarity.deltaGraphKnnOn(spark, e.repartition(7))
      .collect().toSeq
    assert(gA.nonEmpty && gB === gA)
  }

  test("delta substring dedup and delta semdedup are invariant under input partitioning") {
    // the late-round-19 delta forms: the batch gram explode's semi
    // joins + islands window, and the semdedup rank-count arithmetic,
    // must not leak partition layout into spans or keep decisions
    val sA = Dedup.deltaSubstringDedupOn(docs).collect().toSeq
    val sB = Dedup.deltaSubstringDedupOn(docs.repartition(13)).collect().toSeq
    assert(sA.nonEmpty && sB === sA)
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val dA = operators.Similarity.deltaSemDedupOn(spark, e).collect().toSeq
    val dB = operators.Similarity.deltaSemDedupOn(spark, e.repartition(7))
      .collect().toSeq
    assert(dA.nonEmpty && dB === dA)
  }

  test("delta media cascade is invariant under input partitioning") {
    val img = graft.operators.Multimodal.ahashTable(spark, sfDir)
    val aud = graft.operators.Multimodal.audioFpWideTable(spark, sfDir)
      .select($"doc_id", $"afp_hi", $"afp_lo")
    val isNew = $"doc_id" % 10 >= 8
    def run(ib: DataFrame, ab: DataFrame, in: DataFrame,
        an: DataFrame): Seq[org.apache.spark.sql.Row] = {
      val baseLayout = operators.Pipeline.mediaPipelineNearOn(ib, ab)
        .localCheckpoint()
      val baseReps = ib.join(ab, Seq("doc_id"))
        .groupBy($"ahash_hi", $"ahash_lo", $"afp_hi", $"afp_lo")
        .agg(min($"doc_id").as("rep"), count(lit(1)).as("n_class"))
      operators.Pipeline.deltaMediaPipelineOn(baseLayout, baseReps,
        graft.operators.Multimodal.bands4(
          ib.select($"ahash_hi", $"ahash_lo").distinct()),
        graft.operators.Multimodal.bands4(ab
          .select($"afp_hi".as("ahash_hi"), $"afp_lo".as("ahash_lo"))
          .distinct()),
        in, an).collect().toSeq
    }
    val a = run(img.filter(!isNew), aud.filter(!isNew),
      img.filter(isNew), aud.filter(isNew))
    val b = run(img.filter(!isNew).repartition(13),
      aud.filter(!isNew).repartition(5),
      img.filter(isNew).repartition(7), aud.filter(isNew).repartition(3))
    assert(a.nonEmpty && b === a)
  }

  test("event paths are invariant under input partitioning") {
    val ev = Tables.events(spark, sfDir)
    val baseline = operators.EventAnalytics.eventPathsOn(spark, ev).collect().toSeq
    val shuffled = operators.EventAnalytics.eventPathsOn(spark, ev.repartition(11)).collect().toSeq
    assert(shuffled === baseline)
  }

  test("exact dedup is idempotent: deduping the survivors changes nothing") {
    val once = Dedup.exactDedup(spark, sfDir)
    val survivors = docs.join(once.select($"keep_id".as("doc_id")), "doc_id")
    val twice = Dedup.exactDedupOn(survivors)
    assert(twice.filter($"n_copies" > 1).count() === 0L,
      "dedup left duplicates among its own survivors")
    assert(twice.count() === once.count())
  }
}
