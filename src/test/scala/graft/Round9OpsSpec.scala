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

  test("streamed attribution join equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val events = graft.tables.Tables.events(spark, sfDir)
    val p = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"), $"value")
    val c = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val batch = p.join(c, $"c_user" === $"user_id" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 1 hour"))
      .select($"purchase_id", $"user_id", $"click_id",
        date_format($"p_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"), $"value")
      .as[(Long, Long, Long, String, Double)].collect().toSet
    val streamed = graft.streaming.EventStreams.streamedAttribution(spark, sfDir)
      .as[(Long, Long, Long, String, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("pair-file bucket count scales with the pair count, floor 4") {
    assert(Dedup.pairBuckets(0L) === 4L)
    assert(Dedup.pairBuckets(25L) === 4L)
    assert(Dedup.pairBuckets(20L * 1000 * 1000) === 4L)
    assert(Dedup.pairBuckets(100L * 1000 * 1000) === 20L)
    assert(Dedup.pairBuckets(1000L * 1000 * 1000) === 200L)
  }

  test("pair-graph cache is keyed per corpus (no thrash on alternation)") {
    val other = "/root/testdata/sf0.01"
    val d1 = Dedup.pairsDir(spark, sfDir)
    val d2 = Dedup.pairsDir(spark, other)
    assert(d1 !== d2)
    val n1 = Dedup.materializedPairs(spark, sfDir).count()
    val n2 = Dedup.materializedPairs(spark, other).count()
    // alternating back must read the first corpus's file, not rebuild
    // over it — both per-corpus directories coexist on disk (the
    // conf-derived paths may carry a file: scheme)
    assert(Dedup.materializedPairs(spark, sfDir).count() === n1)
    assert(new java.io.File(new java.net.URI(d1).getPath).exists())
    assert(new java.io.File(new java.net.URI(d2).getPath).exists())
    assert(n2 !== 0L)
  }

  test("bloom-prefiltered decontamination is lossless vs the exact scan") {
    val exact = Dedup.decontamination(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    val bloomed = Dedup.decontaminationBloom(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    assert(bloomed === exact)
    assert(bloomed.nonEmpty)
  }

  test("lmTypicality: hand-computed bigram frequencies on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b", "b a", "a b"
      (2L, "a b"),     // bigram:  "a b"
      (3L, "x")        // no bigrams -> absent from output
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lmTypicalityOn(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // corpus counts: "a b" = 3, "b a" = 1
    assert(got === Seq(
      (1L, 3L, 7L, 7.0 / 3.0), // 3 + 1 + 3
      (2L, 1L, 3L, 3.0)))
  }

  test("embeddingQuantize: components bounded by ±127, error below the int8 bound") {
    val rows = graft.operators.Similarity.embeddingQuantize(spark, sfDir)
      .as[(Long, Double, Long, String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, scale, dim, head, err) =>
      assert(scale >= 0.0)
      head.split(",").foreach(q => assert(math.abs(q.toLong) <= 127L))
      // per-component error <= scale/2, so ||err|| <= sqrt(dim)*scale/2
      assert(err <= math.sqrt(dim.toDouble) * scale / 2 + 1e-12,
        s"error $err above the int8 rounding bound")
    }
  }

  test("TTL near-dup stream: aged-out members stop pairing, fresh ones still do") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    def ts(t: String) = Timestamp.valueOf(t)
    val horizonMs = 60 * 60 * 1000L // 1 hour
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
      .withWatermark("ts", "10 minutes")
    val q = graft.streaming.DocumentStreams.nearDupPairStreamTtl(docs, horizonMs).toDF()
      .writeStream.format("memory").queryName("r9_neardup_ttl")
      .outputMode("append").start()
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      val textB = textA + "!"
      // A arrives at 00:00
      input.addData((1L, textA, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // filler far in the future advances the watermark past A's horizon
      input.addData((99L, "zzz completely unrelated filler text qqq", ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      // A' is a near-dup of A but A has aged out -> no pair
      input.addData((2L, textB, ts("2024-01-01 03:10:00")))
      q.processAllAvailable()
      // B and B' arrive within one horizon of each other -> pair emits
      input.addData((10L, textA + " extra", ts("2024-01-01 03:20:00")))
      q.processAllAvailable()
      input.addData((11L, textA + " extra!", ts("2024-01-01 03:30:00")))
      q.processAllAvailable()
      val out = spark.table("r9_neardup_ttl")
        .as[(Long, Long, Double)].collect().toSeq
      assert(!out.exists(p => p._1 == 1L && p._2 == 2L),
        s"aged-out member still paired: $out")
      assert(out.count(p => p._1 == 10L && p._2 == 11L) === 1,
        s"in-horizon pair missing: $out")
    } finally q.stop()
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
