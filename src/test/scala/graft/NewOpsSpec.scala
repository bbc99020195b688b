package graft

import graft.operators.{Relational, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NewOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("asofJoin equals the naive per-event argmax") {
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val orders = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_totalprice")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .groupBy(_._1)
    val want = events.flatMap { case (eid, uid, ts) =>
      orders.getOrElse(uid, Array.empty).filter(!_._2.after(ts)) match {
        case e if e.isEmpty => None
        case qualifying =>
          // latest date; max orderkey within it (the dedup contract)
          val best = qualifying.maxBy(o => (o._2.getTime, o._3))
          Some((eid, uid, best._3, best._4))
      }
    }.sortBy(_._1).toSeq
    val got = Relational.asofJoin(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("tfidf: at most 3 terms per doc, scores descending, rank dense") {
    val rows = Relational // touch import
    val got = TextAnalysis.tfidf(spark, sfDir)
      .as[(Long, String, Double, Long)].collect()
    got.groupBy(_._1).foreach { case (doc, terms) =>
      assert(terms.length <= 3)
      val byRank = terms.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to terms.length))
      val scores = byRank.map(_._3)
      assert(scores.toSeq === scores.sortBy(-_).toSeq, s"doc $doc not descending")
    }
  }

  test("wordBigrams equals naive recomputation") {
    val texts = Tables.documents(spark, sfDir).select($"text").as[String].collect()
    val want = texts.iterator
      .flatMap { t =>
        val toks = t.split("[^a-zA-Z]").filter(_.nonEmpty).map(_.toLowerCase)
        toks.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
      }
      .foldLeft(Map.empty[String, Long]) { (m, b) => m.updated(b, m.getOrElse(b, 0L) + 1) }
      .filter(_._2 >= 3)
    val got = TextAnalysis.wordBigrams(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("pivotAgg cells equal direct grouped sums") {
    val want = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(round(sum($"o_totalprice"), 2).as("s"))
      .as[(String, String, Double)].collect()
      .map { case (p, st, s) => (p, st) -> s }.toMap
    val got = Relational.pivotAgg(spark, sfDir)
      .as[(String, Option[Double], Option[Double], Option[Double])].collect()
    got.foreach { case (p, f, o, pp) =>
      assert(f === want.get((p, "F")))
      assert(o === want.get((p, "O")))
      assert(pp === want.get((p, "P")))
    }
  }

  test("percentileAgg: monotone and within data range") {
    val bounds = Tables.lineitem(spark, sfDir)
      .agg(min($"l_quantity"), max($"l_quantity"))
      .as[(Double, Double)].head()
    Relational.percentileAgg(spark, sfDir)
      .as[(String, Double, Double, Double, Double)].collect()
      .foreach { case (_, p25, p50, p75, p95) =>
        assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
        assert(p25 >= bounds._1 && p95 <= bounds._2)
      }
  }
}
