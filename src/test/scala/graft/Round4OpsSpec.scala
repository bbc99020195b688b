package graft

import graft.operators.{Dedup, Relational}
import graft.streaming.EventStreams
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 surface: TPC-H-shaped multi-join analytics, LATERAL,
  * merge/upsert, triangle counting, streaming DISTINCT.
  */
class Round4OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("tpchQ3: top-10, revenue descending, only BUILDING-segment customers") {
    val rows = Relational.tpchQ3(spark, sfDir)
      .as[(Long, String, String, Double)].collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_._4)
    assert(revs.toSeq === revs.sortBy(-_).toSeq)
    val buildingOrders = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .filter($"c_mktsegment" === "BUILDING"),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey").as[Long].collect().toSet
    rows.foreach { case (ok, _, _, _) => assert(buildingOrders.contains(ok)) }
  }

  test("tpchQ5: nations are exactly ASIA's, revenue positive") {
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_name").as[String].collect().toSet
    val rows = Relational.tpchQ5(spark, sfDir).as[(String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, rev) =>
      assert(asiaNations.contains(n)); assert(rev > 0)
    }
  }

  test("tpchQ10: top-20 by returned revenue, keys unique") {
    val rows = Relational.tpchQ10(spark, sfDir)
      .as[(Long, String, Double, String, Double)].collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_._5)
    assert(revs.toSeq === revs.sortBy(-_).toSeq)
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("lateralTopNations matches the explicit window formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"r_regionkey")
      .orderBy($"bal".desc, $"n_name")
    val want = Tables.nation(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey", $"n_name")
      .agg(round(sum($"c_acctbal"), 2).as("bal"))
      .join(Tables.region(spark, sfDir), $"n_regionkey" === $"r_regionkey")
      .withColumn("rn", row_number().over(w.partitionBy($"r_name")))
      .filter($"rn" <= 2)
      .select($"r_name", $"n_name", $"bal")
      .as[(String, String, Double)].collect().toSet
    val got = Relational.lateralTopNations(spark, sfDir)
      .as[(String, String, Double)].collect()
    assert(got.toSet === want)
    assert(got.groupBy(_._1).values.forall(_.length <= 2))
  }

  test("mergeUpsert partitions every ordering customer with consistent totals") {
    val merged = Relational.mergeUpsert(spark, sfDir)
      .as[(Long, String, Long, Double, String)].collect()
    val allCust = Tables.orders(spark, sfDir)
      .select($"o_custkey").distinct().count()
    assert(merged.length === allCust)
    val totalOrders = Tables.orders(spark, sfDir).count()
    assert(merged.map(_._3).sum === totalOrders)
    // action semantics: 'insert' customers have no pre-cutoff orders
    val preCutoff = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < lit("2001-01-01").cast("timestamp"))
      .select($"o_custkey").as[Long].collect().toSet
    merged.foreach { case (k, action, _, _, _) =>
      if (action == "insert") assert(!preCutoff.contains(k))
      else assert(preCutoff.contains(k))
    }
  }

  test("triangleCounts matches naive canonical-edge enumeration") {
    val e = Dedup.minhashLshPairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // naive: for canonical a<b edges, triangles are (a,b),(b,c),(a,c)
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- e; (b2, c) <- e if b2 == b; if e.contains((a, c))) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    val got = Dedup.triangleCounts(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got === naive.toMap)
  }

  test("streamedDistinct equals the batch distinct key set") {
    val want = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    val got = EventStreams.streamedDistinct(spark, sfDir)
      .as[(Long, String)].collect()
    assert(got.toSet === want)
    assert(got.length === want.size) // append-mode emits each key once
  }
}
