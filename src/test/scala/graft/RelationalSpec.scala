package graft

import graft.operators.Relational
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("pricingSummary groups account for every qualifying row") {
    val expected = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
    val got = Relational.pricingSummary(spark, sfDir)
      .agg(sum($"count_order")).as[Long].head()
    assert(got === expected)
  }

  test("topK: 10 rows, strictly ordered") {
    val rows = Relational.topK(spark, sfDir)
      .select($"price").as[Double].collect()
    assert(rows.length === 10)
    assert(rows.toSeq === rows.sortBy(-_).toSeq)
  }

  test("intersect and except partition the 'O' customer set") {
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "O").select($"o_custkey").distinct()
    val inter = Relational.intersectCustomers(spark, sfDir)
    val exc = Relational.exceptCustomers(spark, sfDir)
    // q_intersect = O ∩ F; q_except = O \ P. Sanity: both ⊆ O.
    assert(inter.join(o, "o_custkey").count() === inter.count())
    assert(exc.join(o, "o_custkey").count() === exc.count())
  }

  test("semi + anti joins partition customers") {
    val total = Tables.customer(spark, sfDir).count()
    val semi = Relational.semiJoin(spark, sfDir).count()
    val anti = Relational.antiJoin(spark, sfDir).count()
    assert(semi + anti === total)
  }

  test("outer join preserves every customer") {
    assert(Relational.outerJoin(spark, sfDir).count() ===
      Tables.customer(spark, sfDir).count())
  }

  test("broadcast join plan actually broadcasts the dimension side") {
    val plan = Relational.joinBroadcast(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("aggregates are partitioning-invariant") {
    val a = Relational.distinctAgg(spark, sfDir).collect().toSeq
    val sp2 = spark.newSession()
    sp2.conf.set("spark.sql.shuffle.partitions", "1")
    val b = Relational.distinctAgg(sp2, sfDir).collect().toSeq
    assert(a === b)
  }
}
