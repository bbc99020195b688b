package graft

import graft.operators.Dedup
import graft.streaming.DocumentStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 surface: the streaming near-dup decision join — arrivals
  * banded and verified against the accumulated band-bucket signature
  * store, the back half of the incremental dedup pipeline whose ingest
  * is q_stream_minhash.
  */
class Round9OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("streamed near-dup pairs equal the batch LSH pair set") {
    val streamed = DocumentStreams.streamedNearDupPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashLshPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty) // the fixture corpus has planted near-dups
  }

  test("re-delivered documents are idempotent in the bucket store") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = DocumentStreams.nearDupPairStream(docs).toDF()
      .writeStream.format("memory").queryName("r9_neardup_redelivery")
      .outputMode("append").start()
    try {
      val a = 1L -> "the quick brown fox jumps over the lazy dog again and again"
      val b = 2L -> "the quick brown fox jumps over the lazy dog again and again!"
      input.addData(a)
      q.processAllAvailable()
      input.addData(a) // re-delivery before the pair exists: no effect
      q.processAllAvailable()
      input.addData(b) // second member arrives -> the pair emits once
      q.processAllAvailable()
      input.addData(a, b) // full re-drop: nothing new emits
      q.processAllAvailable()
      val out = spark.table("r9_neardup_redelivery")
        .as[(Long, Long, Double)].collect().toSeq
      assert(out.size === 1, s"expected exactly one emission, got $out")
      assert(out.head._1 === 1L && out.head._2 === 2L)
      assert(out.head._3 >= 0.5)
    } finally q.stop()
  }
}
