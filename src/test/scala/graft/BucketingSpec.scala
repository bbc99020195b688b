package graft

import graft.tables.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffled storage: two tables bucketed on the join
  * key co-locate, so the join plans with NO Exchange — the persisted
  * form of the co-located join that matters when the same fact table is
  * joined on the same key every day at 100 TB.
  */
class BucketingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    Tables.orders(spark, sfDir)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sfDir)
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ===
        Tables.orders(spark, sfDir).join(
          Tables.customer(spark, sfDir),
          $"o_custkey" === $"c_custkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
