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

  /** Distribution ranking family — ntile / percent_rank / cume_dist
    * over order value within order status: the quantile-bucketing shape
    * a feature pipeline uses for per-segment score normalization. All
    * three are exact rational arithmetic over (rank, n) so the doubles
    * are bit-identical across engines; the ORDER BY carries a unique
    * key so peer order can never differ.
    */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select(col("o_orderstatus"), col("o_orderkey"), col("quartile"),
        col("pct_rank"), col("cume"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
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

  /** Time-series gap filling: build each series' dense hourly spine
    * (`sequence` between its own min/max — no global calendar), left
    * join the observed aggregates, zero-fill counts, and carry the last
    * observed value forward (`last(..., ignoreNulls)` running window).
    * Scale shape: the spine generation is one row per series expanded
    * narrowly; the only shuffles are the hourly pre-aggregation and the
    * per-series window — both keyed by series, never by raw events.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    val spine = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n"), lit(0L)).as("n_filled"),
        last(col("total"), ignoreNulls = true).over(w).as("carried"))
      .orderBy(col("event_type"), col("hour"))
  }
}
