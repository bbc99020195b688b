package graft

import graft.mapreduce.MapReduceJob
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parity with the reference implementation's golden output:
  * the sequential oracle run over the 8-book Gutenberg corpus checked in
  * at the reference repo root (mr-out-0: 19,436 distinct uppercased
  * words, first line `A 13891` — reference lib/mr_sequential.ex:3-28
  * produced it via split on [^a-zA-Z], uppercase, count, sort).
  */
class ReferenceParitySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val corpusDir = "/root/reference/priv/resources"
  private val goldenPath = "/root/reference/mr-out-0"

  test("word count over the reference corpus reproduces mr-out-0 exactly") {
    assume(new java.io.File(goldenPath).isFile)
    // whole-file rows match the reference's per-file mapper input
    // (worker.ex:105-111: mapper receives the whole file content)
    val texts = graft.sources.TextSources.wholeFiles(spark, corpusDir)
      .select($"content").as[String]
    val counted = MapReduceJob.wordCount(spark, texts)
      .collect().sortBy(_._1)
      .map { case (w, c) => s"$w $c" }
    val golden = scala.io.Source.fromFile(goldenPath).getLines().toVector
    assert(counted.length === golden.length)
    counted.zip(golden).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got === want, s"line ${i + 1}")
    }
  }
}
