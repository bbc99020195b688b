package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage (SURVEY.md §2.2 scans/sinks row): every
  * DataFrameWriter format round-trips losslessly with an explicit read
  * schema — the generalization of the reference's single text-dir
  * source/append-text sink (reference worker.ex:105-150).
  */
class SourcesSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def sample = Tables.lineitem(spark, sfDir)
    .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
    .limit(500)

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$fmt").toString
    val df = sample
    df.write.mode("overwrite").format(fmt).save(s"$dir/out")
    val schema: StructType = df.schema
    val back = spark.read.format(fmt).schema(schema).load(s"$dir/out")
    assert(back.count() === df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      s"$fmt round-trip not lossless")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("csv round-trip")(roundTrip("csv"))
  test("json round-trip")(roundTrip("json"))
  test("orc round-trip")(roundTrip("orc"))

  test("text sink reproduces the reference's output-line format") {
    // reference worker.ex:137: "#{key} #{count}\n"
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString
    graft.operators.TextAnalysis.wordCount(spark, sfDir)
      .select(concat_ws(" ", $"word", $"cnt").as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$dir/out")
    val back = spark.read.text(s"$dir/out").as[String].collect()
    assert(back.nonEmpty)
    assert(back.forall(_.matches("[A-Z]+ \\d+")))
  }

  test("partitioned sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sfDir)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$dir/out")
    val pruned = spark.read.parquet(s"$dir/out").filter($"o_orderstatus" === "O")
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(!scanned.contains("o_orderstatus=F"),
      "partition F should be pruned from the scan")
    assert(pruned.count() ===
      Tables.orders(spark, sfDir).filter($"o_orderstatus" === "O").count())
  }
}
