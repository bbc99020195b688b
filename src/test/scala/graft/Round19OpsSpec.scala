package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 operators: delta ANN index maintenance (IVF assignment +
  * NSW insert), the delta media cascade composition, persisted delta
  * band index, delta BM25 postings maintenance, and the fused
  * single-pass shard-append identity guard.
  */
class Round19OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("deltaShardAppend refuses a batch re-ingesting base doc_ids") {
    val old = (0L until 400L).toDF("doc_id")
    val base = graft.operators.Dedup.shardAssignOn(old)
    // wholesale replay (yesterday's batch again): the batch-side
    // sample hits the base with probability 1
    val replay = (100L until 200L).toDF("doc_id")
    val ex = intercept[IllegalArgumentException](
      graft.operators.Dedup.deltaShardAppend(base, replay).collect())
    assert(ex.getMessage.contains("re-ingests"),
      s"wrong guard fired: ${ex.getMessage}")
    // a genuinely-new batch still appends
    val fresh = (400L until 450L).toDF("doc_id")
    assert(graft.operators.Dedup.deltaShardAppend(base, fresh).count() == 50L)
  }

  test("stored base band index == recomputed bands; delta probe over it matches") {
    import graft.operators.Multimodal
    val ah = Multimodal.ahashTable(spark, sfDir)
    val base = ah.filter(col("doc_id") % 10 < 8)
    val batch = ah.filter(col("doc_id") % 10 >= 8)
    val stored = Multimodal.baseBandIndex(
      spark, "delta_band_index_img", sfDir, base)
    val recomputed = Multimodal.bands4(
      base.select(col("ahash_hi"), col("ahash_lo")).distinct())
    val key = Seq("ahash_hi", "ahash_lo", "cb", "kv")
    assert(stored.count() == recomputed.count() &&
      stored.join(recomputed, key, "left_anti").count() == 0L,
      "stored band index diverged from the recomputed projection")
    // the probe over the STORED index == the recompute-index probe
    val viaStored = Multimodal
      .deltaBandHashPairsFromIndex(stored, batch)
      .orderBy("hi_a", "lo_a", "hi_b", "lo_b")
      .collect().toSeq
    val viaRecompute = Multimodal.deltaBandHashPairs(base, batch)
      .orderBy("hi_a", "lo_a", "hi_b", "lo_b")
      .collect().toSeq
    assert(viaStored == viaRecompute,
      "stored-index delta probe diverged from the recompute-index probe")
    assert(viaStored.nonEmpty, "delta fixture found no pairs — weak fixture")
    // plan shape: TWO band explosions, BOTH over the batch side (the
    // probe and its union into the index for new_new candidates) —
    // the base side arrives as a parquet read-back, never re-banded:
    // every Generate sits above the batch-split filter, and the
    // stored cb/kv columns appear in a parquet ReadSchema
    val plan = Multimodal.deltaBandHashPairsFromIndex(stored, batch)
      .queryExecution.executedPlan.toString
    val nGen = plan.linesIterator.count(_.contains("Generate explode"))
    assert(nGen == 2,
      s"expected 2 band explosions (batch probe + batch-in-index), got $nGen:\n${plan.take(1500)}")
    assert(plan.contains("cb:int"),
      s"stored band index not read from parquet (no cb in a ReadSchema):\n${plan.take(1500)}")
  }

  test("delta BM25: maintained index == full rebuild on an arbitrary split") {
    import graft.operators.Retrieval
    val docs = graft.tables.Tables.documents(spark, sfDir)
    // mod-3 split, NOT the graded mod-10 rule — the merge algebra must
    // hold for any disjoint base/batch cut, not just the fixture's
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val tfB = Retrieval.postings(base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dl = tfB.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfq = tfB.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val stats = dl.agg(sum(col("dl")).as("tot_dl"),
        count(lit(1)).as("n_docs"))
      val delta = Retrieval.deltaBm25From(tfB, dl, dfq, stats, batch)
        .collect().toSeq
      val full = Retrieval.bm25On(docs).collect().toSeq
      assert(delta.nonEmpty, "delta BM25 returned nothing — weak fixture")
      assert(delta == full,
        "delta-maintained BM25 diverged from the full rebuild")
    } finally { tfB.unpersist(); () }
  }

  test("delta BM25 plan: batch is the only tokenization; stored tables read back") {
    import graft.operators.Retrieval
    // graded entry once: materializes the stored four-table index
    assert(Retrieval.deltaBm25(spark, sfDir).count() > 0)
    val root = graft.sources.Scratch.corpusDir(spark, "bm25_index", sfDir)
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val plan = Retrieval.deltaBm25From(
        spark.read.parquet(s"$root/postings"),
        spark.read.parquet(s"$root/dl"),
        spark.read.parquet(s"$root/df"),
        spark.read.parquet(s"$root/stats"),
        docs.filter(col("doc_id") % 10 >= 8), checkpoint = false)
      .queryExecution.executedPlan.toString
    // the ONLY tokenization lineage is the batch's: every explode in
    // the plan sits above the batch-split filter (the persisted batch
    // postings print once per consumer, so a count would overstate;
    // the absence of the BASE split filter is the real claim — no
    // base-text lineage anywhere), and the stored stats table arrives
    // as a parquet read-back (tot_dl in a ReadSchema), never an
    // aggregation over base postings
    assert(plan.contains(">= 8"),
      s"batch split filter missing from the delta plan:\n${plan.take(1500)}")
    assert(!plan.contains("< 8"),
      s"base-side text lineage leaked into the delta plan:\n${plan.take(1500)}")
    assert(plan.contains("tot_dl"),
      s"stored stats not read back from parquet:\n${plan.take(1500)}")
  }

  test("streamed delta audio near-dup == batch audio delta restricted to new-vs-existing") {
    // the acoustic serving twin runs the SAME stream-static band-probe
    // engine as the image one — finite replay must equal the batch
    // delta operator's new_existing cut on the wide fingerprint key
    val stream = graft.streaming.DocumentStreams
      .streamedDeltaAudioNeardup(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val batch = graft.operators.Multimodal.deltaAudioNeardup(spark, sfDir)
      .filter(col("pair_type") === "new_existing")
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
