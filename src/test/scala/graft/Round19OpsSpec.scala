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
}
