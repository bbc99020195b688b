package graft

import graft.operators.{Multimodal, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round15OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("phraseSearch: every reported (doc, pos) really starts the phrase there") {
    val phrase = graft.operators.Retrieval.PhraseQuery
    val hits = graft.operators.Retrieval.phraseSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt)) // pos is BIGINT (oracle parity)
    assert(hits.nonEmpty, "fixture phrase must occur in the corpus")
    val texts = graft.tables.Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(hits.map(_._1).distinct: _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    hits.foreach { case (doc, pos) =>
      val toks = texts(doc).toLowerCase.split("[^a-z]").filter(_.nonEmpty)
      assert(toks.slice(pos, pos + phrase.size).toSeq == phrase,
        s"doc $doc pos $pos does not start the phrase")
    }
    // completeness against an independent in-JVM scan of every doc
    val expected = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val toks = r.getString(1).toLowerCase.split("[^a-z]").filter(_.nonEmpty)
        toks.sliding(phrase.size).zipWithIndex
          .collect { case (w, i) if w.toSeq == phrase => (r.getLong(0), i) }
      }.toSet
    assert(hits.toSet == expected, "posting-join result differs from direct scan")
  }

  test("incrementalAgg: delta-apply equals a from-scratch recompute") {
    // THE materialized-view maintenance contract: merging the batch
    // delta into the pre-aggregated base must be indistinguishable
    // from recomputing the aggregate over all history
    val maintained = Relational.incrementalAgg(spark, sfDir).collect()
    val recomputed = graft.tables.Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_value"))
      .withColumn("avg_value", round(col("total_value") / col("n_orders"), 6))
      .orderBy(col("month"), col("status"))
      .collect()
    assert(maintained.length == recomputed.length)
    maintained.zip(recomputed).foreach { case (m, r) =>
      assert(m.getString(0) == r.getString(0) && m.getString(1) == r.getString(1))
      assert(m.getLong(2) == r.getLong(2), s"count drift at ${m.getString(0)}")
      // cent exactness: rounded base + rounded delta re-rounded must
      // be BIT-equal to the rounded full sum, not merely close
      assert(m.getDouble(3) == r.getDouble(3), s"sum drift at ${m.getString(0)}")
      assert(m.getDouble(4) == r.getDouble(4), s"avg drift at ${m.getString(0)}")
    }
    // both sides of the cutoff must actually contribute (otherwise the
    // test degenerates to recompute == recompute)
    val o = graft.tables.Tables.orders(spark, sfDir)
    val cutoff = lit("2001-01-01").cast("timestamp")
    assert(o.filter(col("o_orderdate") < cutoff).limit(1).count() == 1)
    assert(o.filter(col("o_orderdate") >= cutoff).limit(1).count() == 1)
  }

  test("imageNeardup: banding is lossless at the threshold (== all-pairs scan)") {
    // 4 bands ⇒ complete recall at Hamming ≤ 3 (pigeonhole): the
    // banded pair list must EQUAL the brute-force all-pairs filter
    val banded = Multimodal.imageNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ah = Multimodal.imageAhash(spark, sfDir)
    val brute = ah.as("x").join(ah.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .withColumn("dist", expr(
        "CAST(bit_count(x.ahash_hi ^ y.ahash_hi) + bit_count(x.ahash_lo ^ y.ahash_lo) AS BIGINT)"))
      .filter(col("dist") <= Multimodal.ImageNeardupMaxDist)
      .select(col("x.doc_id"), col("y.doc_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(banded.toSet == brute.toSet,
      s"banded ${banded.length} pairs != brute ${brute.length}")
    assert(banded.nonEmpty)
    banded.foreach { case (a, b, d) =>
      assert(a < b, "canonical order")
      assert(d <= Multimodal.ImageNeardupMaxDist)
    }
  }

  test("graphKnnAuto: routes to the blocked build below the ceiling (== graphKnn)") {
    // below BlockedBuildMaxN the routed entry must be row-identical to
    // the blocked query — this is what lets q_knn_graph_auto share
    // q_knn_graph's DuckDB oracle at gate scale
    val direct = graft.operators.Similarity.graphKnn(spark, sfDir)
      .collect().map(_.toSeq)
    val auto = graft.operators.Similarity.graphKnnAuto(spark, sfDir)
      .collect().map(_.toSeq)
    assert(direct.nonEmpty && direct.toSeq == auto.toSeq)
  }

  test("substringDedup paranoid (3-polynomial) tier: identical spans at fixture scale") {
    // the escalation must change only the collision bound, never the
    // result below it — at fixture scale (zero collisions either way)
    // the two tiers are row-identical
    val base = graft.operators.Dedup.substringDedup(spark, sfDir)
      .collect().map(_.toSeq)
    val p3 = graft.operators.Dedup.substringDedupP3(spark, sfDir)
      .collect().map(_.toSeq)
    assert(base.nonEmpty)
    assert(base.toSeq == p3.toSeq)
  }

  test("tpch Q17/Q20/Q21: non-trivial results with the contract shapes") {
    // sf0.01: the brand/size slice is empty at the sf0.001 micro
    // fixture (72 qualifying lineitems exist at the gate scale)
    val sfDir = "/root/testdata/sf0.01"
    val q17 = Relational.tpchQ17(spark, sfDir).collect()
    assert(q17.length == 1 && q17(0).getDouble(0) > 0.0)
    val q20 = Relational.tpchQ20(spark, sfDir).collect()
    assert(q20.nonEmpty)
    assert(q20.map(_.getLong(0)).sorted.toSeq == q20.map(_.getLong(0)).toSeq,
      "Q20 ordered by suppkey")
    val q21 = Relational.tpchQ21(spark, sfDir).collect()
    assert(q21.nonEmpty && q21.length <= 100)
    val waits = q21.map(_.getLong(1))
    assert(waits.toSeq == waits.sortBy(-_).toSeq, "Q21 ordered by numwait desc")
  }
}
