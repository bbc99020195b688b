package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 surface: the per-row codegen MinHash signature expression
  * ([[org.apache.spark.sql.graft.MinhashExpressions]]). Pins the parity
  * contract its scaladoc promises: both shingle-hash paths must equal
  * the compositional formulation they replaced — charShingles windows →
  * per-shingle hash (rollingHash oracle path / xxhash64-mod-2³² prod
  * path) → affine-family min over the shingle multiset.
  */
class Round8OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** The rounds-1-7 compositional pipeline, rebuilt from the public
    * building blocks the expression claims parity with.
    */
  private def compositional(prodHash: Boolean): DataFrame = {
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(TextFunctions.charShingles(
          TextFunctions.normalized(col("text")), Dedup.ShingleK)).as("sh"))
    val h =
      if (prodHash) pmod(xxhash64(col("sh")), lit(1L << 32))
      else TextFunctions.rollingFingerprint(col("sh"))
    val aggs = (0 until Dedup.NumHashes).map(i =>
      min(pmod(lit(Dedup.HashA(i)) * col("h") + lit(Dedup.HashB(i)),
        lit(Dedup.HashP))).as(s"mh$i"))
    sh.select(col("doc_id"), h.as("h"))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def viaExpression(prodHash: Boolean): DataFrame = {
    val unpack = (0 until Dedup.NumHashes).map(i =>
      element_at(col("sig"), i + 1).as(s"mh$i"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Dedup.minhashSignatureArray(col("text"), prodHash).as("sig"))
      .select(col("doc_id") +: unpack: _*)
  }

  private def asMap(df: DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap

  test("minhashSig oracle path equals rollingHash over charShingles windows") {
    assert(asMap(viaExpression(prodHash = false)) === asMap(compositional(prodHash = false)))
  }

  test("minhashSig production path equals pmod(xxhash64, 2^32) over charShingles windows") {
    assert(asMap(viaExpression(prodHash = true)) === asMap(compositional(prodHash = true)))
  }
}
