package graft

import graft.operators.TextAnalysis
import graft.sources.Sinks
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the driver-graded source/sink-surface queries added in
  * round 2: the text-dir input surface (S1/S2) checked against the
  * reference's golden output, and the partitioned sink round-trip
  * checked for both value parity and actual partition pruning.
  */
class GatedSourceSinkSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val goldenPath = "/root/reference/mr-out-0"

  test("q_text_wordcount (line-oriented read) reproduces mr-out-0 exactly") {
    assume(new java.io.File(goldenPath).isFile)
    val counted = TextAnalysis.textDirWordCount(spark, sfDir)
      .as[(String, Long)].collect()
      .map { case (w, c) => s"$w $c" }
    val golden = scala.io.Source.fromFile(goldenPath).getLines().toVector
    assert(counted.length === golden.length)
    counted.zip(golden).foreach { case (got, want) => assert(got === want) }
  }

  test("q_text_stats: 8 corpus files; token totals agree with word count") {
    val stats = TextAnalysis.textDirStats(spark, sfDir).collect()
    assert(stats.length === 8)
    val totalTokens = stats.map(_.getLong(1)).sum
    val wcTotal = TextAnalysis.textDirWordCount(spark, sfDir)
      .agg(sum($"cnt")).as[Long].head()
    assert(totalTokens === wcTotal)
    stats.foreach { r =>
      assert(r.getString(0).startsWith("pg-"))
      assert(r.getLong(2) > 0 && r.getLong(2) <= r.getLong(1)) // distinct <= tokens
    }
  }

  test("compaction: debris collapses to byte-sized file groups, values intact") {
    val got = Sinks.compactionRoundTrip(spark, sfDir).collect()
    val want = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_keys"))
      .orderBy(col("o_orderstatus")).collect()
    assert(got.toSeq == want.toSeq, "compacted values drifted from the source table")
    def filesPerPartition(root: String): Map[String, Int] = {
      val dir = new java.io.File(root.stripPrefix("file:"))
      assert(dir.isDirectory, s"landing dir missing: $dir")
      dir.listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    }
    val raw = filesPerPartition(Sinks.compactionRawDir(spark))
    val out = filesPerPartition(Sinks.compactionOutDir(spark))
    // fragmentation assertion on the TOTAL (a rare status with few
    // rows can legitimately land in one repartition(32) task and leave
    // a single raw file — per-dir >1 was fixture-sensitive): every dir
    // holds >=1 file and the debris count far exceeds the dir count
    assert(raw.nonEmpty && raw.values.forall(_ >= 1) &&
        raw.values.sum > raw.size * 2,
      s"raw landing not fragmented: $raw")
    // fixture partitions are far below the 128 MB target, so every
    // group count is 1 -> exactly one file per dir at the default
    assert(out.keySet == raw.keySet && out.values.forall(_ == 1),
      s"compaction left multi-file partitions at default target: $out")
    // small-target run: force multi-group partitions and pin the
    // <= n_groups = ceil(bytes/target) per-dir ceiling WITH real write
    // parallelism (more compacted files than partition dirs overall)
    val target = 64L * 1024 // 64 KB target vs ~100s of KB per status
    val got2 = Sinks.compactionRoundTrip(spark, sfDir, target).collect()
    assert(got2.toSeq == want.toSeq, "small-target compaction lost rows")
    // exclude dot-files: java.io sees the local FS's .part-*.crc
    // sidecars that production's ChecksumFileSystem listing hides —
    // counting them inflates the byte total and weakens the ceiling
    val rawBytes = new java.io.File(
        Sinks.compactionRawDir(spark).stripPrefix("file:"))
      .listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
          .map(_.length).sum
      }.toMap
    val out2 = filesPerPartition(Sinks.compactionOutDir(spark))
    out2.foreach { case (dirName, n) =>
      val groups = math.max(1L, (rawBytes(dirName) + target - 1) / target)
      assert(n >= 1 && n <= groups,
        s"$dirName: $n files exceeds its ${groups}-group ceiling")
    }
    // parallelism evidence (the ceiling above is the hard contract):
    // range bounds are SAMPLE-derived, so gids can legally merge into
    // fewer tasks — a hard assert here would be a latent flake if the
    // range sampler or fixture sizes change. Surface it as a loud
    // warning instead: all-merged across every dir means the range
    // partitioner separated nothing, worth a human look, not a red CI.
    if (out2.values.sum <= out2.size)
      alert(s"small-target compaction produced no multi-group partition " +
        s"(range sampler merged every gid): $out2")
  }

  test("partitioned sink round-trip equals the direct aggregate and prunes partitions") {
    val got = Sinks.partitionedRoundTrip(spark, sfDir).collect()
    val want = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(got.toSeq === want.toSeq)
    // the read-back scan must carry the filter as a PARTITION filter
    // (pruned at planning — non-matching partitions never scanned)
    val plan = Sinks.readBack(spark).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n${plan.take(1500)}")
    val pf = plan.split("PartitionFilters:")(1).split("]")(0)
    assert(pf.contains("o_orderstatus"), s"partition filter does not prune o_orderstatus: $pf")
  }
}
