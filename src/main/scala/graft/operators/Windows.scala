package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (absent from the reference — SURVEY.md §2.2
  * "Window functions: Absent"): ranking, running aggregates, lag/lead,
  * per-group top-k. One shuffle per distinct partitioning; all windows
  * here share partitionBy(o_custkey) so Catalyst reuses a single
  * Exchange for stacked window specs.
  */
object Windows {

  /** row_number / rank per customer over orders by price — per-group
    * ranking. Deterministic tie-break on o_orderkey so the oracle
    * ranks identically.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running sum + lag delta per customer ordered by date — the
    * cumulative-window shape (rowsBetween unboundedPreceding..current).
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_total",
        round(sum(col("o_totalprice"))
          .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("prev_price",
        round(coalesce(lag(col("o_totalprice"), 1).over(byDate), lit(0.0)), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running_total"),
        col("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** RANGE-frame window: 90-day trailing revenue per customer — the
    * frame is bounded by the ORDER BY *value* (an interval), not row
    * offsets, so ties and gaps in order dates behave correctly.
    * Expressed in SQL form (the Scala DSL's rangeBetween takes only
    * numeric offsets; interval frames need the SQL frame syntax).
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("trailing_90d",
        expr("""round(sum(o_totalprice) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW), 2)"""))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_90d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  /** Per-group top-k via ranking window — the scalable "top 2 orders
    * per segment" (global sort-free; each group ranks inside its own
    * partition).
    */
  def groupTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select(col("c_mktsegment"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }
}
