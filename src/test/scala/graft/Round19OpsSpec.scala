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
}
