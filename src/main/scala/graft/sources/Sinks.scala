package graft.sources

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface (reference K1, worker.ex:120-138 generalized to
  * DataFrameWriter): the driver-graded query writes a PARTITIONED
  * parquet dataset and reads it back through a partition-pruning
  * filter, so the whole write → layout → pruned-read contract sits
  * under the oracle gate (the oracle computes the same aggregate from
  * the original table — any loss, duplication, or mis-partitioning in
  * the round trip breaks the hash match). At 100 TB partitioned layout
  * IS the table format; pruning is what makes selective reads O(hit
  * partitions) instead of O(corpus).
  */
object Sinks {

  /** Scratch dataset location — under target/ so it never pollutes the
    * repo tree; overwritten per run.
    */
  val RoundTripDir = "/root/repo/target/tmp/sink_roundtrip"

  def partitionedRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .write.mode("overwrite")
      .partitionBy("o_orderstatus")
      .parquet(RoundTripDir)
    readBack(spark)
  }

  /** The read-back half, exposed separately so the plan can be
    * inspected (SinkRoundTripSpec asserts PartitionFilters prune the
    * non-matching partitions from the scan).
    */
  def readBack(spark: SparkSession): DataFrame =
    spark.read.parquet(RoundTripDir)
      .filter(col("o_orderstatus") === "F") // partition-pruned, never scanned
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
}
