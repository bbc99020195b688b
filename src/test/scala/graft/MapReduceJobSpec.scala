package graft

import graft.mapreduce.MapReduceJob
import org.scalatest.funsuite.AnyFunSuite

/** The reference application's semantics (reference lib/mr_apps/
  * word_count.ex:3-13) and the distributed-vs-sequential differential
  * check (reference lib/map_reduce.ex:5-19) recast: identical results
  * regardless of partitioning.
  */
class MapReduceJobSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("word count matches reference semantics: [^a-zA-Z] split, uppercase, count") {
    val input = Seq("Hello, world! hello", "ab1AB don't").toDS()
    val result = MapReduceJob.wordCount(spark, input).collect().toMap
    // digits and apostrophes split words (word_count.ex:5)
    assert(result === Map("HELLO" -> 2L, "WORLD" -> 1L, "AB" -> 2L,
      "DON" -> 1L, "T" -> 1L))
  }

  test("distributed == sequential: result invariant under partitioning") {
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select($"text").as[String]
    val seq1 = MapReduceJob.wordCount(spark, texts.repartition(1)).collect().toMap
    val dist = MapReduceJob.wordCount(spark, texts.repartition(8)).collect().toMap
    assert(seq1 === dist)
    assert(seq1.nonEmpty)
  }

  test("RDD lowering (flatMap -> reduceByKey) equals the Dataset lowerings") {
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .select($"text").as[String]
    val viaDataset = MapReduceJob.wordCount(spark, texts).collect().toMap
    val viaRdd = MapReduceJob.runRddReduce[String, String, Long](
      texts.rdd,
      content => content.split("[^a-zA-Z]").iterator
        .filter(_.nonEmpty).map(w => (w.toUpperCase, 1L)),
      _ + _).collect().toMap
    assert(viaDataset === viaRdd)
  }

  test("runReduce (combiner lowering) equals run (general lowering)") {
    val input = Seq("a b a", "b c").toDS()
    def mapper(s: String) = s.split(" ").iterator.map(w => (w, 1L))
    val general = MapReduceJob[String, String, Long, Long](
      mapper, (_, vs) => vs.sum).run(input).collect().toMap
    val combined = MapReduceJob.runReduce[String, String, Long](
      input, mapper, _ + _).collect().toMap
    assert(general === combined)
    assert(general === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }
}
