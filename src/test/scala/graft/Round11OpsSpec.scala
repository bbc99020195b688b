package graft

import graft.operators.{EventAnalytics, Retrieval}
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 surface: retrieval (BM25, RRF hybrid fusion, DSIR
  * importance weights) and event analytics (EWMA, MAD outliers,
  * streaming z-score anomalies) — each pinned against a sequential
  * Scala reference on a hand-built fixture, plus the streaming
  * detector against its batch recomputation on the real fixture.
  */
class Round11OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // ——— BM25 ———

  test("bm25: matches a sequential reference on a crafted corpus") {
    // doc 7 repeats 'hash'; doc 8 mentions each query-1 term once in a
    // long doc; doc 9 has none of them
    val docs = Seq(
      (7L, "hash hash hash join table", "en", "srcA", 25L),
      (8L, "hash join batch row row row row row row row scan", "en", "srcA", 50L),
      (9L, "filter merge order sort agg", "en", "srcB", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Retrieval.bm25On(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

    // sequential reference over the same tokenization
    val toks = Map(
      7L -> Seq("hash", "hash", "hash", "join", "table"),
      8L -> Seq("hash", "join", "batch", "row", "row", "row", "row", "row", "row", "row", "scan"),
      9L -> Seq("filter", "merge", "order", "sort", "agg"))
    val tf = toks.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (w, g) => ((d, w), g.size.toLong) } }
    val dl = toks.map { case (d, ts) => d -> ts.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val nDocs = 3L
    val avgdl = dl.values.sum.toDouble / nDocs.toDouble
    def scoreFp(q: Seq[String], d: Long): Long =
      q.flatMap { w =>
        tf.get((d, w)).map { f =>
          val idf = math.log(1.0 + (nDocs.toDouble - df(w).toDouble + 0.5) / (df(w).toDouble + 0.5))
          val tfPart = (f.toDouble * 2.2) /
            (f.toDouble + 1.2 * (0.25 + 0.75 * (dl(d).toDouble / avgdl)))
          math.round(idf * tfPart * Retrieval.Fp)
        }
      }.sum
    val q1 = Seq("hash", "join", "batch")
    val expected = Seq(7L, 8L)
      .map(d => d -> scoreFp(q1, d)).sortBy { case (d, s) => (-s, d) }
    val got1 = out.filter(_._1 == 1).sortBy(_._2)
    assert(got1.map(_._3).toSeq == expected.map(_._1),
      s"rank order mismatch: $got1 vs $expected")
    got1.zip(expected).foreach { case ((_, _, _, score), (_, fp)) =>
      assert(score == fp.toDouble / Retrieval.Fp) }
    // doc 9 has no query-1 terms -> absent from query 1's list
    assert(!out.exists(r => r._1 == 1 && r._3 == 9L))
  }

  // ——— DSIR ———

  test("dsir: matches a sequential log-likelihood-ratio reference") {
    // target sources say 'alpha'; one background doc is alpha-heavy
    // (should outrank), one is all-novel words
    val docs = Seq(
      (0L, "alpha alpha beta", "en", Retrieval.DsirTargetSources.head, 16L),
      (1L, "alpha gamma", "en", Retrieval.DsirTargetSources.last, 11L),
      (2L, "alpha alpha alpha delta", "en", "srcX", 23L),
      (3L, "epsilon zeta eta", "en", "srcY", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Retrieval.dsirWeightsOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))

    val tgt = Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L)
    val bg = Map("alpha" -> 3L, "delta" -> 1L, "epsilon" -> 1L, "zeta" -> 1L, "eta" -> 1L)
    val vocab = (tgt.keySet ++ bg.keySet).toSeq
    val (nT, nB, v) = (tgt.values.sum, bg.values.sum, vocab.size.toLong)
    def lrFp(w: String): Long = math.round(
      (math.log((tgt.getOrElse(w, 0L).toDouble + 1.0) / (nT.toDouble + v.toDouble)) -
        math.log((bg.getOrElse(w, 0L).toDouble + 1.0) / (nB.toDouble + v.toDouble))) * Retrieval.Fp)
    val exp2 = 3L * lrFp("alpha") + 1L * lrFp("delta")
    val exp3 = lrFp("epsilon") + lrFp("zeta") + lrFp("eta")
    assert(exp2 > exp3, "fixture must separate the docs")
    assert(out.map(_._2).toSeq == Seq(2L, 3L), s"selection order: ${out.toSeq}")
    val byDoc = out.map(r => r._2 -> r._4).toMap
    assert(byDoc(2L) == exp2 && byDoc(3L) == exp3,
      s"score_fp mismatch: $byDoc vs ($exp2, $exp3)")
    assert(out.find(_._2 == 2L).get._5 == exp2.toDouble / (4.0 * Retrieval.Fp))
  }

  // ——— RRF fusion ———

  test("rrf fusion: structural invariants and exact contribution sums") {
    val out = SparkEntry.queries("q_rrf_fusion")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, "ranks not contiguous")
      assert(rows.length <= Retrieval.TopK)
      // fused scores strictly follow rank order (ties broken by doc)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(4) >= b.getDouble(4); case _ => true })
    }
    // every rrf is a sum of 1 or 2 exact fixed-point contributions of
    // ranks 1..FusionDepth — reconstructible from n_lists
    val valid = (for {
      ra <- 1 to Retrieval.FusionDepth; rb <- 1 to Retrieval.FusionDepth
    } yield math.round(Retrieval.Fp / (60.0 + ra.toDouble)) +
      math.round(Retrieval.Fp / (60.0 + rb.toDouble))).toSet ++
      (1 to Retrieval.FusionDepth)
        .map(r => math.round(Retrieval.Fp / (60.0 + r.toDouble))).toSet
    out.foreach { r =>
      val fp = math.round(r.getDouble(4) * Retrieval.Fp)
      assert(valid.contains(fp), s"rrf ${r.getDouble(4)} not a valid contribution sum")
    }
  }

  // ——— EWMA ———

  test("ewma: matches a sequential alpha=1/2 reference per user") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      (1L, ts(0), 5L, "click", 1.00, "{}"),
      (2L, ts(1), 5L, "click", 2.00, "{}"),
      (3L, ts(2), 5L, "click", 4.00, "{}"),
      (4L, ts(3), 5L, "click", 8.00, "{}"),
      (5L, ts(0), 6L, "view", 10.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.ewmaOn(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    def ref(cents: Seq[Long]): Seq[Double] = cents.indices.map { i =>
      val taps = (0 to math.min(i, EventAnalytics.EwmaK - 1))
        .map(d => (cents(i - d), 1L << (EventAnalytics.EwmaK - 1 - d)))
      taps.map { case (c, w) => c * w }.sum.toDouble / taps.map(_._2).sum.toDouble
    }
    val got5 = out.filter(_._1 == 5L).sortBy(_._2).map(_._5).toSeq
    assert(got5 == ref(Seq(100L, 200L, 400L, 800L)), s"user 5: $got5")
    // newest event dominates: ewma moves toward the latest value
    assert(got5.last > got5(2))
    val got6 = out.filter(_._1 == 6L).map(_._5).toSeq
    assert(got6 == Seq(1000.0))
  }

  // ——— MAD anomalies ———

  test("madAnomalies: flags exactly the >3-robust-sigma points") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 9 points tightly around 100 cents (median 1.00, MAD from the
    // small spread), one wild outlier at 100.00
    val vals = Seq(0.98, 0.99, 0.99, 1.00, 1.00, 1.00, 1.01, 1.01, 1.02, 100.00)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, base, 1L, "buy", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventAnalytics.madAnomaliesOn(ev).collect()
    assert(out.length == 1 && out.head.getLong(1) == 9L,
      s"expected only the outlier: ${out.toSeq}")
    // med = 100 cents, MAD = 1 cent -> z = 9900 / 1.4826
    assert(out.head.getDouble(5) == 9900.0 / 1.4826)
  }

  // ——— quality model ———

  test("qualityModel: matches a sequential fixed-point reference") {
    val docs = Seq(
      // stopword-rich clean prose -> keep
      (0L, "the cat sat on a mat and it is the best of all the mats in town", "en", "srcA", 64L),
      // numeric/markup debris -> drop
      (1L, "x1 7f 99 000 11 22 33 44 55 zz zz zz zz", "en", "srcA", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.operators.TextAnalysis.qualityModelOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    def fp(x: Double) = math.round(x * 1048576.0)
    def ref(text: String): Long = {
      val toks = text.split("[^a-zA-Z]+").filter(_.nonEmpty).map(_.toLowerCase).toSeq
      val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
      val alphaChars = text.count(_.isLetter).toDouble
      val n = math.max(toks.size, 1).toDouble
      3 * fp(toks.count(stop).toDouble / n) +
        2 * fp(alphaChars / math.max(text.length, 1).toDouble) +
        2 * fp(toks.distinct.size.toDouble / n) +
        fp((alphaChars / n) / 10.0)
    }
    val byDoc = out.map(r => r._1 -> r._2).toMap
    assert(byDoc(0L) == ref("the cat sat on a mat and it is the best of all the mats in town"))
    assert(byDoc(1L) == ref("x1 7f 99 000 11 22 33 44 55 zz zz zz zz"))
    val keep = out.map(r => r._1 -> r._4).toMap
    assert(keep(0L) && !keep(1L), s"threshold should separate the docs: $out")
  }

  // ——— streaming EWMA ———

  test("streamedEwma equals the batch lag-window EWMA on the fixture") {
    val got = graft.streaming.EventStreams.streamedEwma(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val exp = graft.operators.EventAnalytics
      .ewmaOn(graft.tables.Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty && got.length == exp.length)
    assert(got.toSet == exp.toSet,
      s"stream/batch divergence: ${got.toSet.diff(exp.toSet).take(3)}")
  }

  // ——— streaming anomaly ———

  test("streamedAnomaly equals the batch cumulative-moments recompute") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = graft.streaming.EventStreams.streamedAnomaly(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = graft.tables.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * lit(100)).cast("long").as("cents"))
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("sum_prior", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("sumsq_prior", coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .filter(col("n_prior") >= graft.streaming.EventStreams.AnomalyMinPrior &&
        (col("n_prior") * col("cents") - col("sum_prior")) *
          (col("n_prior") * col("cents") - col("sum_prior")) >
          lit(9L) * (col("n_prior") * col("sumsq_prior") - col("sum_prior") * col("sum_prior")))
      .select(col("user_id"), col("event_id"), col("cents"), col("n_prior"), col("sum_prior"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty, "no anomalies in the fixture")
    assert(got.toSet == exp.toSet,
      s"stream/batch divergence: ${got.toSet.diff(exp.toSet).take(3)} / ${exp.toSet.diff(got.toSet).take(3)}")
  }
}
