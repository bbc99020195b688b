package graft

import graft.operators.{Dedup, EventAnalytics}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 surface: the replay-clock gated session stream (shares the
  * batch q_sessions oracle), the exact-substring family (Rabin-Karp
  * window hashes, span dedup, clip, position-exact decontamination),
  * robust winnowing + its MOSS match layer, and the scale-bound fixes
  * (statsAgg repartition invariance, zorderKey domain guard).
  */
class Round14OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  test("streamedSessionsGated equals the batch sessionization row-for-row") {
    // the whole point of the replay clock: EVERY session — including
    // each user's final one — closes inline, so the streaming twin
    // reproduces the batch session_window result exactly (same rows,
    // same rounded money, same formatted start)
    val streamed = EventStreams.streamedSessionsGated(spark, sfDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = EventAnalytics.sessions(spark, sfDir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streamedSessionsGated emits strictly more sessions than the watermark-gated stream") {
    // streamedSessions withholds final sessions the terminal watermark
    // has not closed; the replay clock withholds nothing
    val gated = EventStreams.streamedSessionsGated(spark, sfDir).count()
    val watermarked = EventStreams.streamedSessions(spark, sfDir).count()
    assert(gated >= watermarked)
    val batch = EventAnalytics.sessions(spark, sfDir).count()
    assert(gated === batch)
  }

  test("session gap decisions hold at the microsecond boundary") {
    // two events whose true gap is 1,799,999,800 us (< 30 min) but
    // whose millisecond truncations sit exactly 1,800,000 ms apart —
    // a getTime-based gap would split the session the batch
    // session_window merges (the round-14 review finding)
    val base = 1700000000000000L // epoch micros
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val rows = Seq(
      (1L, ts(base + 900L), 7L, "view", 1.0, "{}"),
      (2L, ts(base + 1800000100L), 7L, "view", 2.0, "{}"),
      // exactly 30 min apart: session_window MERGES the adjacent
      // per-event windows (end == start coalesces) — the `<=` rule
      (3L, ts(base + 5000000000L), 8L, "view", 1.0, "{}"),
      (4L, ts(base + 6800000000L), 8L, "view", 1.0, "{}"),
      // 30 min + 800 us: a true new session whose gap TRUNCATES to
      // exactly 1,800,000 ms — a getTime-based rule would merge it
      (5L, ts(base + 100L), 9L, "view", 1.0, "{}"),
      (6L, ts(base + 1800000900L), 9L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // the streaming source globs for a single FILE named
    // events.parquet (the fixture layout) — stage one part file
    val dir = java.nio.file.Files.createTempDirectory("micro_gap").toString
    rows.repartition(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val batch = EventAnalytics.sessions(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
    val streamed = EventStreams.streamedSessionsGated(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(batch.count(_._1 == 7L) === 1, s"batch split the sub-30min pair: $batch")
    assert(batch.count(_._1 == 8L) === 1, s"batch split the exactly-30min pair: $batch")
    assert(batch.count(_._1 == 9L) === 2, s"batch merged the 30min+800us pair: $batch")
    assert(streamed === batch)
  }

  test("rollingWindowFingerprint slides to the same values as per-substring folds") {
    import graft.functions.TextFunctions
    val L = 7
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"), (3L, "exactly" ), (4L, "αβγδεζη ascii and ünïcode mix αβγδεζη"))
      .toDF("doc_id", "text")
    val slid = docs.select($"doc_id",
        TextFunctions.rollingWindowFingerprint($"text", L).as("hs"),
        TextFunctions.rollingWindowFingerprint2($"text", L).as("hs2"))
      .as[(Long, Seq[Long], Seq[Long])].collect().toSeq
    // independent reimplementation: per-window left-to-right fold over
    // code points (the rollSql form), no Rabin-Karp slide
    def fold(cps: Array[Int], base: Long, mod: Long): Long =
      cps.foldLeft(0L)((acc, c) => (acc * base + c) % mod)
    val texts = docs.as[(Long, String)].collect().toMap
    slid.foreach { case (id, hs, hs2) =>
      val cps = texts(id).codePoints().toArray
      val n = math.max(0, cps.length - L + 1)
      assert(hs.length === n, s"doc $id window count")
      (0 until n).foreach { i =>
        val w = cps.slice(i, i + L)
        assert(hs(i) === fold(w, 31L, 1000000007L), s"doc $id window $i")
        assert(hs2(i) === fold(w, 131L, 999999937L), s"doc $id window $i (poly2)")
      }
    }
  }

  test("substringDedup flags exactly the planted repeated spans, merged maximally") {
    // a 60-char boilerplate block planted in docs 1 and 2 at different
    // offsets; doc 3 is clean; doc 4 repeats a block within itself
    val boiler = "All rights reserved worldwide under all applicable statutes." // 60 chars
    assert(boiler.length === 60)
    val inner = "x" * 45
    // boundary characters DIFFER between the two plants (:…! vs .…,)
    // so the maximal repeat is exactly the 60-char block — same-side
    // neighbors would legitimately extend the span (the operator finds
    // maximal repeats, not planted intent)
    val docs = Seq(
      (1L, s"Unique preamble one:$boiler! And a unique tail here."),
      (2L, s"Different lead-in text before the block.$boiler, plus other words."),
      (3L, "Entirely novel content with no repetition of any long span at all, nothing shared."),
      (4L, s"Self repeat:$inner middle filler words#$inner! end."))
      .toDF("doc_id", "text")
    val L = Dedup.SubstringL
    val spans = Dedup.substringDedupOn(docs, L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byDoc = spans.groupBy(_._1)
    assert(!byDoc.contains(3L), "clean doc flagged")
    // docs 1 and 2: exactly the planted 60-char block (21 windows of 40)
    val texts = docs.as[(Long, String)].collect().toMap
    Seq(1L, 2L).foreach { d =>
      val start = texts(d).indexOf(boiler) + 1L
      val ds = byDoc(d)
      assert(ds.length === 1, s"doc $d spans: $ds")
      val (_, s, e, len, nw) = ds.head
      assert(s === start && len === 60L && e === s + 60 && nw === 21L, s"doc $d: ${ds.head}")
    }
    // doc 4: both copies of the 45-char run flagged (6 windows each)
    val d4 = byDoc(4L)
    assert(d4.length === 2, s"doc 4 spans: $d4")
    assert(d4.forall { case (_, _, _, len, nw) => len === 45L && nw === 6L })
  }

  test("statsAgg is repartition-invariant after the round(6) contract") {
    // the co-moment merge tree changes with the partitioning; the
    // operator's claim is that round(., 6) absorbs every association
    // difference — assert it across partition counts and a hash
    // re-distribution
    val li = graft.tables.Tables.lineitem(spark, sfDir)
    val base = graft.operators.Relational.statsAggOn(li).collect().toSeq
    Seq(li.repartition(1), li.repartition(7),
        li.repartition(32, col("l_orderkey"))).foreach { shuffled =>
      val got = graft.operators.Relational.statsAggOn(shuffled).collect().toSeq
      assert(got === base)
    }
  }

  test("zorderKey raises on keys outside the interleave domain") {
    val lim = 1L << graft.operators.Relational.ZorderBits
    // fixture keys are in-domain: the graded query must evaluate clean
    assert(graft.operators.Relational.zorderKey(spark, sfDir).count() > 0)
    // an out-of-domain key must fail LOUDLY, not alias silently: the
    // guard is the whole point (a key >= 2^20 would fold onto a
    // far-away curve position and quietly destroy clustering)
    val bad = Seq((1L, 1, lim + 5L, 3L)).toDF(
      "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    bad.createOrReplaceTempView("graft_zorder_bad")
    val dir = java.nio.file.Files.createTempDirectory("zorder_bad").toString
    bad.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val ex = intercept[Exception] {
      graft.operators.Relational.zorderKey(spark, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("interleave domain")), s"wrong error: $ex")
  }

  test("substringClip excises exactly the flagged spans, in order") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val texts = docs.as[(Long, String)].collect().toMap
    val spans = Dedup.substringDedupOn(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    val clipped = Dedup.substringClipOn(docs)
      .as[(Long, Long, Long, String)].collect()
    assert(clipped.nonEmpty)
    assert(clipped.map(_._1).toSet === spans.keySet, "clip rows != flagged docs")
    clipped.foreach { case (d, nSpans, removed, text) =>
      val ds = spans(d).sortBy(_._2)
      assert(nSpans === ds.length.toLong)
      assert(removed === ds.map(s => s._3 - s._2).sum)
      // independent reassembly over code points
      val cps = texts(d).codePoints().toArray
      val kept = new StringBuilder
      var p = 1L
      ds.foreach { case (_, s, e, _, _) =>
        kept ++= new String(cps.slice((p - 1).toInt, (s - 1).toInt), 0, (s - p).toInt)
        p = e
      }
      kept ++= new String(cps.slice((p - 1).toInt, cps.length), 0, (cps.length - p + 1).toInt)
      assert(text === kept.toString, s"doc $d clip mismatch")
    }
  }

  test("substringDecontamination flags verbatim train overlap, position-exact") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val out = Dedup.substringDecontaminationOn(docs)
      .as[(Long, String, Long, Long, Double, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, split, nw, nc, frac, nSpans, longest) =>
      assert(split === "val" || split === "test", "train doc in eval output")
      assert(nc >= 0 && nc <= nw)
      assert(math.abs(frac - nc.toDouble / nw) < 1e-12)
      assert((nc == 0) === (nSpans == 0L))
      if (nSpans > 0) assert(longest >= Dedup.SubstringL)
    }
    // every contaminated doc's flagged fraction is explained by REAL
    // substring overlap with a train doc: recompute one doc by hand
    val splits = docs.select($"doc_id",
        (pmod(graft.functions.TextFunctions.md5Hash32($"text"), lit(10)) < 8).as("isTrain"))
      .as[(Long, Boolean)].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    val L = Dedup.SubstringL
    val trainGrams = texts.collect { case (id, t) if splits(id) && t.length >= L =>
      t.sliding(L).toSet
    }.foldLeft(Set.empty[String])(_ ++ _)
    out.filter(_._4 > 0).take(10).foreach { case (d, _, _, nc, _, _, _) =>
      val hitCount = texts(d).sliding(L).count(trainGrams.contains)
      assert(hitCount.toLong === nc, s"doc $d: $hitCount vs $nc")
    }
  }

  test("winnowing: guarantee threshold and expected density hold") {
    import graft.operators.TextAnalysis
    val k = TextAnalysis.WinnowK
    val w = TextAnalysis.WinnowW
    // planted: docs 1 and 2 share exactly a (w + k - 1)-char substring —
    // the guarantee threshold — inside otherwise-distinct text
    val shared = "ABCDEFGHIJKLMNO".take(w + k - 1)
    assert(shared.length === w + k - 1)
    val docs = Seq(
      (1L, s"first document unique prefix $shared and a distinct one tail"),
      (2L, s"second doc other start here $shared totally different ending"),
      // alphabet-disjoint from docs 1-2: sharing ANY 8-gram (even one
      // common word like "document") is true sharing, not false
      (3L, "33333 4444444 55555555 666666 77777777 8888888 9999999 000000"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprintsOn(docs)
      .as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // Schleimer et al.'s theorem: a shared substring of length >= w+k-1
    // must contribute at least one common fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "guarantee violated")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "false sharing")
    // density on the fixture: expected 2/(w+1) of positions, loose band
    val corpus = graft.tables.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val nPositions = corpus.as[(Long, String)].collect()
      .map { case (_, t) => math.max(0, t.codePoints().count().toInt - k + 1) }
      .map(_.toLong).sum
    val nFps = TextAnalysis.winnowFingerprintsOn(corpus).count()
    val density = nFps.toDouble / nPositions
    info(f"winnow density = $density%.3f (theoretical ${2.0 / (w + 1)}%.3f)")
    assert(density > 1.0 / (w + 1) && density < 4.0 / (w + 1),
      f"density $density%.3f outside the 2/(w+1) band")
  }

  test("streamed winnow ingest equals the batch selection exactly") {
    import graft.operators.TextAnalysis
    val streamed = graft.streaming.DocumentStreams.streamedWinnow(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val batch = TextAnalysis.winnowFingerprints(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("winnowPairs: near-identical docs match, a single short shared run does not") {
    import graft.operators.TextAnalysis
    val base = "the winnowed index selects one fingerprint per window of " +
      "consecutive hashes and guarantees detection of long verbatim runs " +
      "across documents in the corpus with bounded density"
    val shared15 = "XYZQWRTPLMKNBVC" // w + k - 1 chars, alphabet-disjoint
    val docs = Seq(
      (1L, base),
      // near-dup of 1: one word substituted mid-text
      (2L, base.replace("bounded", "limited")),
      // shares ONLY the 15-char run with doc 4 — one fingerprint class,
      // far below half of either side's fingerprint set
      (3L, s"completely different material here $shared15 nothing else aligns with anything"),
      (4L, s"some other unrelated sentence body $shared15 trailing words diverge too"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairsOn(docs)
      .as[(Long, Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"unexpected match set: ${pairs.toSeq}")
    assert(pairs.head._4 >= 0.5)
  }

  test("substringDedup span text is genuinely repeated in the corpus") {
    // every flagged span on the fixture must occur at least twice as a
    // substring somewhere (the defining property of the operator)
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text")
    val texts = docs.as[(Long, String)].collect().toMap
    val spans = Dedup.substringDedupOn(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.nonEmpty)
    val all = texts.values.toSeq
    spans.take(40).foreach { case (d, s, e, _, _) =>
      val cps = texts(d).codePoints().toArray
      val frag = new String(cps.slice((s - 1).toInt, (e - 1).toInt),
        0, (e - s).toInt)
      val occ = all.map(t => t.sliding(frag.length).count(_ == frag)).sum
      assert(occ >= 2, s"span ($d,$s,$e) not repeated: '$frag'")
    }
  }
}
