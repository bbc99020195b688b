package graft

import graft.operators.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 surface: the end-to-end curation cascade — each stage's
  * drop decision verified against a hand-built corpus where every
  * document exists to exercise exactly one rule. Document bodies are
  * all-distinct prose (no two share a
  * [[Pipeline.DecontaminationSpanK]]-char span unless the test plants
  * one), each ≥ 30 words, alphabetic and stopword-rich enough to pass
  * the quality gates.
  */
class Round10OpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** The pipeline's hash-split rule (md5-derived 32-bit bucket mod 10,
    * < 8 → train), recomputed here so fixture docs can be STEERED onto
    * a chosen side by suffix search — the test must not depend on
    * lucky hashing.
    */
  private def isTrain(text: String): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 10 < 8
  }

  /** Distinct filler vocabulary: steering suffixes never share more
    * than a dozen trailing chars across docs, far below the 40-char
    * decontamination span.
    */
  private val fillers =
    ("amber birch cedar delta ember fjord grove harbor inlet juniper " +
      "kestrel larch meadow nectar orchid pebble quartz raven spruce " +
      "thistle umber violet willow yarrow zephyr alder").split(" ")

  private def steer(base: String, train: Boolean): String =
    (0 until 676).iterator
      .map(i => s"$base ${fillers(i % 26)} ${fillers(i / 26)} mark")
      .find(t => isTrain(t) == train)
      .getOrElse(fail(s"no suffix steered train=$train"))

  test("curation pipeline: each stage drops exactly its target") {
    val evalText = steer(
      "the ancient lighthouse constructed from granite blocks stands " +
        "proudly above coastal cliffs overlooking northern waters and " +
        "keepers historically climbed winding staircases every evening " +
        "carrying polished lanterns trimming wicks carefully while " +
        "watching patiently for distant vessels navigating treacherous " +
        "channels beyond rocky headlands during stormy weather", train = false)
    // contaminated: copies a > 40-char span straight out of the eval doc
    val leak = evalText.substring(10, 80)
    val contaminated = steer(
      "a remarkable library containing antique navigation charts " +
        "occupies the rearmost chamber and curators frequently explain " +
        "that every document preserves memories of daring voyages " +
        s"across uncharted oceans $leak which seasoned mariners " +
        "visiting harbor taverns would certainly remember forever", train = true)
    val clean = steer(
      "a flourishing garden producing heirloom tomatoes and climbing " +
        "beans stretches behind the whitewashed cottage where diligent " +
        "gardeners arrive during early mornings watering furrows " +
        "pulling stubborn weeds while contented felines slumber " +
        "beneath warming sunshine near weathered wooden gates " +
        "surrounding peaceful courtyards", train = true)
    val docs = Seq(
      (0L, evalText),        // eval side: never packed
      (1L, contaminated),    // train, leaks an eval span → decontaminated
      (2L, clean),           // train, clean → the only packed doc
      (3L, "  " + clean),    // normalized dup of 2 → exact dedup drops
      (4L, "too short to keep") // < 30 words → corpus filter drops
    ).toDF("doc_id", "text")

    val packed = Pipeline.curationPipelineOn(docs).collect()
    assert(packed.length === 1, packed.mkString("; "))
    val row = packed.head
    assert(row.getAs[Long]("first_doc") === 2L)
    assert(row.getAs[Long]("n_docs") === 1L)
    assert(row.getAs[Long]("total_tokens") > 30L)
  }

  test("PII redaction: placeholders replace every injected pattern, counts audit them") {
    val out = graft.operators.TextAnalysis.redactPii(spark, sfDir)
      .select("doc_id", "redacted", "n_emails", "n_phones", "n_ips")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, red, ne, np, ni) =>
      // every injected pattern redacted: nothing email/phone/IP-shaped
      // survives in the output text
      assert(!red.matches(".*" + graft.operators.TextAnalysis.EmailRe + ".*"), s"doc $id: $red")
      assert(!red.matches("(?s).*\\(\\d{3}\\) \\d{3}-\\d{4}.*"), s"doc $id")
      assert(!red.matches("(?s).*\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}.*"), s"doc $id")
      // counts mirror the deterministic injection rule
      assert(ne === 1L, s"doc $id emails")
      assert(np === (if (id % 3 == 0) 1L else 0L), s"doc $id phones")
      assert(ni === (if (id % 2 == 0) 1L else 0L), s"doc $id ips")
      assert(red.contains("<EMAIL>"))
      if (id % 3 == 0) assert(red.contains("<PHONE>"))
      if (id % 2 == 0) assert(red.contains("<IP>"))
    }
  }

  test("dedupKeepBest: keeper is the longest member of its own cluster") {
    import graft.operators.Dedup
    val keep = Dedup.dedupKeepBest(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(keep.nonEmpty) // fixture corpus has planted near-dups
    val labels = Dedup.clusterLabels(
      Dedup.minhashLshPairs(spark, sfDir).select("id_a", "id_b"))
      .as[(Long, Long)].collect()
    val byCluster = labels.groupBy(_._2).map { case (l, m) => l -> m.map(_._1).toSet }
    val words = graft.tables.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(keep.map(_._1).toSet === byCluster.keySet) // one keeper per cluster
    keep.foreach { case (rep, keeper, nMembers, keeperWords) =>
      val members = byCluster(rep)
      assert(members.contains(keeper), s"keeper $keeper not in cluster $rep")
      assert(nMembers === members.size.toLong)
      assert(keeperWords === words(keeper))
      val best = members.maxBy(m => (words(m), -m))
      assert(keeper === best, s"cluster $rep: keeper $keeper vs longest $best")
    }
  }

  test("deltaDedup: exactly the batch pairs touching the new side, correctly typed") {
    import graft.operators.Dedup
    import graft.functions.TextFunctions.md5Hash32
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val delta = Dedup.deltaDedup(spark, sfDir)
      .as[(Long, Long, Double, String)].collect()
    assert(delta.nonEmpty)
    val isNew = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), pmod(md5Hash32(col("text")), lit(10)) >= 8)
      .as[(Long, Boolean)].collect().toMap
    // the incremental probe changes WORK, not results: same pairs as
    // the full batch join restricted to the new side
    val full = Dedup.minhashLshPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val expected = full.filter { case (a, b, _) => isNew(a) || isNew(b) }
      .map { case (a, b, e) =>
        (a, b, e, if (isNew(a) && isNew(b)) "new_new" else "new_existing") }
      .toSet
    assert(delta.toSet === expected)
    // and no existing-vs-existing pair leaks through
    delta.foreach { case (a, b, _, t) =>
      assert(isNew(a) || isNew(b))
      assert(t === (if (isNew(a) && isNew(b)) "new_new" else "new_existing"))
    }
  }

  test("approxPercentile: every sketch value lies within the exact quartile spread") {
    import org.apache.spark.sql.Row
    val exact = graft.operators.Relational.percentileAgg(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.Relational.approxPercentileAgg(spark, sfDir)
      .collect()
    assert(approx.nonEmpty && approx.length === exact.size)
    // GK with accuracy=1000 has rank error <= n/1000; on l_quantity
    // (integers 1..50) that is at most one adjacent integer value —
    // assert each approximate percentile within 1.0 of the exact one
    def d(r: Row, i: Int): Double = r.get(i) match {
      case x: java.lang.Number => x.doubleValue()
    }
    approx.foreach { r =>
      val e = exact(r.getString(0))
      (1 to 4).foreach { i =>
        assert(math.abs(d(r, i) - d(e, i)) <= 1.0 + 1e-9,
          s"flag ${r.getString(0)} col $i: approx ${d(r, i)} vs exact ${d(e, i)}")
      }
    }
  }

  test("streamed decontamination equals the batch scan (stream-static join)") {
    val streamed = graft.streaming.DocumentStreams
      .streamedDecontamination(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect().toSet
    val batch = graft.operators.Dedup.decontamination(spark, sfDir)
      .as[(Long, String, Long, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("curation pipeline: disjoint train and eval docs both survive their stages") {
    val ev = steer(
      "heavy snowfall blanketed the mountain passage overnight and " +
        "travelers discovered morning roadways buried beneath pristine " +
        "drifts so patient carters remained inside village taverns " +
        "alongside sturdy horses recounting elaborate stories about " +
        "previous winters considerably harsher than anything younger " +
        "generations remember", train = false)
    val tr = steer(
      "the industrious baker begins working before daybreak and " +
        "whenever townspeople awaken fragrant loaves emerge golden " +
        "from brick ovens while shop windows radiate warmth attracting " +
        "hurried clerks who pause counting copper coins hoping to " +
        "purchase freshly baked rolls", train = true)
    val docs = Seq((0L, ev), (1L, tr)).toDF("doc_id", "text")
    val packed = Pipeline.curationPipelineOn(docs).collect()
    assert(packed.length === 1)
    assert(packed.head.getAs[Long]("first_doc") === 1L)
    assert(packed.head.getAs[Long]("n_docs") === 1L)
  }

  test("embedding pool: first-member-seeded fold equals a reduceLeft mean, exactly") {
    val rows = graft.operators.Similarity.embeddingPool(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val e = graft.tables.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val groups = e.groupBy(_._1 / graft.operators.Similarity.PoolGroup)
    assert(rows.map(_._1).distinct.length === groups.size)
    // bit-exact against the same fold order on the driver: first
    // member seeds, then left-fold in vec_id order — no tolerance
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    groups.foreach { case (g, members) =>
      val dims = members.head._2.length
      (0 until dims).foreach { d =>
        val exp = members.map(_._2(d).toDouble).reduceLeft(_ + _) / members.length
        assert(byKey((g, d + 1L)) === exp, s"group $g pos ${d + 1}")
      }
    }
  }

  test("temperature mixture: rates flatten the lang skew, smallest lang keeps all") {
    val rows = graft.operators.Dedup.temperatureMixture(spark, sfDir)
      .as[(String, Long, Double, Long, Long)].collect()
    val byLang = rows.map(r => r._1 -> r).toMap
    // normalization anchor: the rarest language is never downsampled
    val minLang = rows.minBy(_._2)
    assert(minLang._3 === 1.0)
    // the dominant language IS downsampled (rate = sqrt(n_min/n_en) < 1
    // and the hash filter removed documents)
    val en = byLang("en")
    assert(en._3 < 1.0 && en._4 < en._2,
      s"en not flattened: rate=${en._3} sampled=${en._4}/${en._2}")
    // rate math, in the operator's exact evaluation order — the
    // algebraically-equal sqrt(n_min)/sqrt(n_l) differs by an ULP
    rows.foreach { case (_, n, rate, _, _) =>
      assert(rate ===
        (1.0 / math.sqrt(n.toDouble)) / (1.0 / math.sqrt(minLang._2.toDouble)))
    }
    // sampling is within-rate: hash-uniformity keeps n_sampled near
    // n_docs·rate (loose band — this is determinism, not statistics)
    rows.foreach { case (lang, n, rate, sampled, _) =>
      assert(sampled <= n, s"$lang oversampled")
      assert(math.abs(sampled - n * rate) <= math.max(6.0, 0.35 * n),
        s"$lang sampled=$sampled far from n·rate=${n * rate}")
    }
  }

  /** In-JVM reference Lloyd over the quantized fixture — the same three
    * determinism rules as kmeansAssignOn, computed sequentially. The
    * distributed result must match EXACTLY (assignment and cluster
    * sizes), not approximately: fixed-point sums make the algorithm a
    * pure function of the data, so any drift is a bug, not noise.
    */
  private def referenceLloyd(): (Map[Long, Int], Map[Int, Array[Double]]) = {
    import graft.operators.Similarity.{KmeansIters, KmeansK, KmeansScale}
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.round(v.toDouble * KmeansScale)).toArray)
      .sortBy(_._1)
    var cents: Map[Int, Array[Double]] = vecs.take(KmeansK)
      .map { case (id, q) => id.toInt -> q.map(_.toDouble / KmeansScale) }.toMap
    var assign = Map.empty[Long, Int]
    for (iter <- 1 to KmeansIters) {
      assign = vecs.map { case (id, q) =>
        val best = cents.toSeq.map { case (cid, c) =>
          var d = 0.0
          var i = 0
          while (i < q.length) {
            val t = q(i) / KmeansScale - c(i); d += t * t; i += 1
          }
          (d, cid)
        }.min
        id -> best._2
      }.toMap
      if (iter < KmeansIters) {
        cents = assign.groupBy(_._2).map { case (cid, members) =>
          val qs = members.keys.toSeq.sorted.map(id => vecs(id.toInt)._2)
          val dim = qs.head.length
          val mean = Array.tabulate(dim) { i =>
            qs.map(_(i)).sum.toDouble / (qs.size.toDouble * KmeansScale)
          }
          cid -> mean
        }
      }
    }
    (assign, cents)
  }

  test("kmeans: distributed fixed-point Lloyd equals the in-JVM reference exactly") {
    val got = graft.operators.Similarity.kmeansAssign(spark, sfDir)
      .as[(Long, Long, Double, Long)].collect()
    val (refAssign, _) = referenceLloyd()
    assert(got.length === refAssign.size)
    got.foreach { case (id, cluster, _, _) =>
      assert(cluster === refAssign(id).toLong, s"vec $id diverged from reference Lloyd")
    }
    val sizes = refAssign.groupBy(_._2).view
      .map { case (c, m) => c.toLong -> m.size.toLong }.toMap
    got.foreach { case (id, cluster, _, n) =>
      assert(n === sizes(cluster), s"vec $id n_cluster mismatch")
    }
    assert(got.map(_._2).distinct.length > 1, "degenerate single cluster")
  }

  test("semdedup: drop rule matches the per-pair recomputation; ranks well-formed") {
    val rows = graft.operators.Similarity.semanticDedup(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.length === rows.length)
    // ranks are a permutation of 1..n within each cluster
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).sorted.toSeq === (1L to members.length).toSeq,
        s"cluster $c ranks not 1..n")
    }
    // recompute the decision rule from raw vectors: dropped iff some
    // higher-ranked same-cluster vector has cosine >= 0.4 (rounded 6,
    // the operator's own comparison)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na * nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = rows.groupBy(_._2)
    rows.foreach { case (id, c, rank, kept) =>
      val higher = byCluster(c).filter(_._3 < rank)
      val shouldDrop = higher.exists(h =>
        BigDecimal(cos(emb(h._1), emb(id))).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.4)
      assert((kept == 0L) === shouldDrop, s"vec $id kept=$kept but rule says drop=$shouldDrop")
    }
    val dropped = rows.count(_._4 == 0L)
    assert(dropped > 0 && dropped < rows.length / 2,
      s"implausible drop count $dropped")
  }

  test("boilerplate removal equals the in-JVM recomputation, reassembly ordered") {
    import graft.operators.TextAnalysis.{BoilerplateMinCount, BoilerplateWindow}
    val got = graft.operators.TextAnalysis.removeBoilerplate(spark, sfDir)
      .as[(Long, Long, Long, String)].collect()
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    def segments(t: String): Seq[String] =
      t.split(" ", -1).grouped(BoilerplateWindow).map(_.mkString(" ")).toSeq
    val counts = texts.values.toSeq.flatMap(segments)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got.length === texts.size)
    got.foreach { case (id, nSegs, nRemoved, clean) =>
      val segs = segments(texts(id))
      assert(nSegs === segs.length.toLong, s"doc $id n_segs")
      val kept = segs.filter(counts(_) < BoilerplateMinCount)
      assert(nRemoved === (segs.length - kept.length).toLong, s"doc $id n_removed")
      assert(clean === kept.mkString(" "), s"doc $id clean_text")
    }
    // the stage actually bites on this corpus
    assert(got.map(_._3).sum > 0, "no boilerplate found — window/threshold dead")
  }

  test("cluster mixture: rate math exact, smallest cluster keeps all, sampling within-rate") {
    val rows = graft.operators.Similarity.clusterMixture(spark, sfDir)
      .as[(Long, Long, Double, Long, Long)].collect()
    val sizes = graft.operators.Similarity.kmeansAssign(spark, sfDir)
      .selectExpr("cluster", "n_cluster").distinct()
      .as[(Long, Long)].collect().toMap
    assert(rows.map(_._1).toSet === sizes.keySet, "cluster set mismatch")
    val minN = rows.map(_._2).min
    rows.foreach { case (c, n, rate, sampled, _) =>
      assert(n === sizes(c))
      // the operator's exact evaluation order (ULP-sensitive)
      assert(rate === (1.0 / math.sqrt(n.toDouble)) / (1.0 / math.sqrt(minN.toDouble)))
      assert(sampled <= n, s"cluster $c oversampled")
    }
    assert(rows.find(_._2 == minN).get._3 === 1.0, "smallest cluster downsampled")
    assert(rows.map(_._4).sum < rows.map(_._2).sum, "nothing was downsampled")
  }

  test("streamed kmeans assignment equals the batch assignment exactly") {
    val streamed = graft.streaming.EmbeddingStreams.streamedKmeansAssign(spark, sfDir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val batch = graft.operators.Similarity.kmeansAssign(spark, sfDir)
      .selectExpr("vec_id", "cluster", "dist")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s === b, s"stream/batch diverged at vec ${s._1}")
    }
  }

  test("knn classify: votes recompute from the gated top-k; ties break to smaller label") {
    val pred = graft.operators.Similarity.knnClassify(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT)").as[(Long, Long)].collect().toMap
    val topk = graft.operators.Similarity.bruteForceKnn(spark, sfDir)
      .selectExpr("q_id", "n_id").as[(Long, Long)].collect()
    assert(pred.length === graft.operators.Similarity.NumQueries)
    pred.foreach { case (qid, predLabel, nVotes, trueLabel) =>
      val votes = topk.filter(_._1 == qid).map(t => e(t._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(predLabel === best._1, s"query $qid wrong majority label")
      assert(nVotes === best._2, s"query $qid wrong vote count")
      assert(trueLabel === e(qid))
    }
  }

  test("scd2: intervals recompute from a sequential per-user reference") {
    val got = graft.operators.EventAnalytics.scd2(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getLong(5), r.getBoolean(6)))
    // formatting delegated to Spark (session-tz-safe); the reference
    // reassembles only the run/interval logic
    val ev = graft.tables.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS m", "event_id", "event_type",
        "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS fmt")
      .as[(Long, Long, Long, String, String)].collect()
    val want = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toVector
      val runs = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Long, String, String)]]) {
        case (acc, r) if acc.nonEmpty && acc.last.head._4 == r._4 =>
          acc.init :+ (acc.last :+ r)
        case (acc, r) => acc :+ Vector(r)
      }
      runs.zipWithIndex.map { case (run, i) =>
        (uid, (i + 1).toLong, run.head._4, run.head._5,
          if (i + 1 < runs.size) Some(runs(i + 1).head._5) else None,
          run.size.toLong, i + 1 == runs.size)
      }
    }
    assert(got.length === want.length)
    assert(got.sortBy(t => (t._1, t._2)) === want.sortBy(t => (t._1, t._2)).toArray.toSeq)
  }

  test("split leakage: pairs = the gated LSH pairs; tags = the hashSplit arithmetic") {
    val got = graft.operators.Dedup.splitLeakage(spark, sfDir)
      .as[(Long, Long, Double, String, String, Boolean)].collect()
    assert(got.nonEmpty, "no near-dup pairs at all — fixture changed?")
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet === pairs)
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    def split(t: String): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.take(8), 16) % 10
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }
    got.foreach { case (a, b, _, sa, sb, leaked) =>
      assert(sa === split(text(a)), s"pair ($a,$b) split_a")
      assert(sb === split(text(b)), s"pair ($a,$b) split_b")
      assert(leaked === (sa != sb), s"pair ($a,$b) leaked flag")
    }
  }

  test("pmi: lift recomputes from raw token counts; survivors = the bigram vocabulary") {
    val got = graft.operators.TextAnalysis.pmiCollocations(spark, sfDir)
      .as[(String, Long, Double)].collect()
    val bigs = graft.operators.TextAnalysis.wordBigrams(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(got.map(_._1).toSet === bigs.keySet, "survivor vocabulary mismatch")
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect()
      .map(_.split("[^a-zA-Z]").filter(_.nonEmpty).map(_.toLowerCase))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = uni.values.sum
    val pairCnt = toks.toSeq.flatMap(a => a.iterator.sliding(2).withPartial(false)
        .map(p => (p(0), p(1)))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBig = pairCnt.values.sum
    got.foreach { case (bg, c, lift) =>
      val Array(w1, w2) = bg.split(" ")
      assert(c === bigs(bg))
      assert(c === pairCnt((w1, w2)), s"$bg pair count")
      // the operator's exact arithmetic: long products, ONE division
      assert(lift === (c * nUni * nUni).toDouble / (nBig * uni(w1) * uni(w2)).toDouble,
        s"$bg lift")
    }
  }

  test("lexical cosine: pairs and scores recompute from a full in-JVM reference") {
    val got = graft.operators.Dedup.lexicalCosine(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._2))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    val tf = docs.map { case (id, text) =>
      id -> text.split("[^a-zA-Z]").filter(_.nonEmpty).map(_.toLowerCase)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val shingles = docs.map { case (id, text) =>
      id -> text.split("[^a-zA-Z]").filter(_.nonEmpty).map(_.toLowerCase)
        .sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }.toMap
    val dfCnt = shingles.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rare = shingles.view.mapValues(_.filter(g =>
      dfCnt(g) <= graft.operators.Dedup.LexMaxDf)).toMap
    val norms = tf.view.mapValues(_.values.map(c => c * c).sum).toMap
    val ids = docs.map(_._1).sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      if rare(i).exists(rare(j)) // candidates share >= 1 rare 4-gram
    } yield {
      val dot = tf(i).keysIterator
        .map(t => tf(i)(t) * tf(j).getOrElse(t, 0L)).sum
      (i, j, dot, dot.toDouble / math.sqrt((norms(i) * norms(j)).toDouble))
    }).filter(_._4 >= graft.operators.Dedup.LexCosineMin).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty, "no lexical near-dup pairs — fixture changed?")
    assert(got.toSeq === want.toSeq)
  }

  test("stratified sample: the aggregator draw equals the sorted-hash reference") {
    val got = graft.operators.Dedup.stratifiedSample(spark, sfDir)
      .as[(String, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang", "text").as[(Long, String, String)].collect()
    def h(text: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((text + "#strat").getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val want = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(r => (h(r._3), r._1)).take(graft.operators.Dedup.StratK)
        .zipWithIndex.map { case (r, i) => (lang, (i + 1).toLong, r._1) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
    // every represented language fills its quota or exhausts its docs
    val perLang = docs.groupBy(_._2).view.mapValues(_.size).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length === math.min(graft.operators.Dedup.StratK, perLang(lang)))
    }
  }
}
