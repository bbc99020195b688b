package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 late additions: contrastive hard-negative mining and the
  * distributed BPE tokenizer trainer. Each operator's oracle twin is
  * the primary gate; these specs pin the properties the oracle cannot
  * see (cross-implementation agreement, BPE theorems, determinism).
  */
class Round12bOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("hard negatives: cross-label only, and agrees with a rank-window reference") {
    import graft.functions.VectorFunctions.cosine
    val out = operators.Similarity.hardNegatives(spark, sfDir).collect()
    assert(out.length == operators.Similarity.NumQueries * operators.Similarity.K)
    // no anchor is ever its own negative, and every negative crosses labels
    val e = tables.Tables.embeddings(spark, sfDir)
    val labels = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (q, n, nl) = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Int]("n_label"))
      assert(n != q)
      assert(labels(n) == nl)
      assert(nl != labels(q), s"anchor $q label ${labels(q)} matched negative $n")
    }
    // independent reference: the brute-force rank-window form (the
    // shape hardNegatives deliberately avoids at scale)
    val anchors = e.filter(col("vec_id") < operators.Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val ref = e.select(col("vec_id").as("n_id"), col("label").as("n_label"), col("embedding"))
      .crossJoin(broadcast(anchors))
      .filter(col("q_label") =!= col("n_label"))
      .select(col("q_id"), col("n_id"), col("n_label"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= operators.Similarity.K)
      .select(col("q_id"), col("rank"), col("n_id"), col("n_label"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
      .collect()
    assert(out.toSeq == ref.toSeq)
  }

  test("BPE: merged rule counts are non-increasing and round 1 is the true char-bigram argmax") {
    val rules = operators.Tokenizer.bpeMerges(spark, sfDir).collect()
    assert(rules.length == operators.Tokenizer.BpeMerges)
    rules.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("t1") + r.getAs[String]("t2"))
    }
    // merging can only remove or split pair mass, never create more
    // than the merged pair had — the argmax sequence is non-increasing
    val counts = rules.map(_.getAs[Long]("pair_count")).toSeq
    assert(counts == counts.sorted.reverse, s"pair counts not non-increasing: $counts")
    // round 1 cross-checked against a direct adjacent-char count over
    // the weighted vocabulary (no seq encoding involved)
    import graft.functions.TextFunctions
    val vocab = tables.Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // split-on-"" can emit a trailing empty element (Java split with
      // limit -1) — drop empties so no phantom (c, "") pair appears
      .withColumn("chars", filter(split(col("word"), ""), x => length(x) > 0))
    val positions = when(size(col("chars")) >= 2,
      sequence(lit(1), size(col("chars")) - 1))
      .otherwise(array().cast("array<int>"))
    val best = vocab
      .select(col("cnt"), explode(transform(positions, i => struct(
        element_at(col("chars"), i).as("t1"),
        element_at(col("chars"), i + 1).as("t2")))).as("p"))
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(sum("cnt").as("pc"))
      .orderBy(col("pc").desc, col("t1"), col("t2"))
      .limit(1).head()
    assert(rules.head.getAs[String]("t1") == best.getString(0))
    assert(rules.head.getAs[String]("t2") == best.getString(1))
    assert(rules.head.getAs[Long]("pair_count") == best.getLong(2))
  }

  test("k-center selection: coverage similarity non-decreasing, matches a join-form reference") {
    import graft.functions.VectorFunctions.cosine
    val out = operators.Similarity.kCenterSelect(spark, sfDir).collect()
    assert(out.length == operators.Similarity.KCenterRounds)
    val ids = out.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length, "a point was selected twice")
    // farthest-point theorem: each admitted point's max-similarity to
    // the selected set can only grow round over round (the coverage
    // radius shrinks monotonically)
    val sims = out.map(_.getAs[Double]("maxsim")).toSeq
    assert(sims == sims.sorted, s"maxsim not non-decreasing: $sims")
    // independent reference: the N×k join + groupBy form (the shuffle
    // shape kCenterSelect deliberately avoids)
    val e = tables.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val seedId = e.agg(min("vec_id")).head().getLong(0)
    var sel = Seq(seedId)
    val refPicks = (1 to operators.Similarity.KCenterRounds).map { _ =>
      val selDf = e.filter(col("vec_id").isin(sel: _*))
        .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"))
      val pick = e.filter(!col("vec_id").isin(sel: _*))
        .crossJoin(broadcast(selDf))
        .select(col("vec_id"), round(cosine(col("embedding"), col("s_emb")), 6).as("sim"))
        .groupBy("vec_id").agg(max("sim").as("maxsim"))
        .orderBy(col("maxsim").asc, col("vec_id"))
        .limit(1).head()
      sel :+= pick.getLong(0)
      (pick.getLong(0), pick.getDouble(1))
    }
    assert(out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("maxsim"))).toSeq
      == refPicks)
  }

  test("streamed BPE tokenize replays to exactly the batch counts") {
    val batch = operators.Tokenizer.bpeTokenize(spark, sfDir).collect().toSeq
    val stream = streaming.DocumentStreams.streamedBpeTokenize(spark, sfDir).collect().toSeq
    assert(stream == batch)
  }

  test("streamed image aHash replays to exactly the batch hashes") {
    val batch = operators.Multimodal.imageAhash(spark, sfDir).collect().toSeq
    val stream = streaming.DocumentStreams.streamedImageAhash(spark, sfDir).collect().toSeq
    assert(stream == batch)
  }

  test("event paths: capped length, ordered by the earliest events") {
    val out = operators.EventAnalytics.eventPaths(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.length <= operators.EventAnalytics.PathLen)
      assert(steps.length ==
        math.min(r.getAs[Long]("n_events"), operators.EventAnalytics.PathLen.toLong))
    }
    // spot-check one user against a direct sorted scan
    val u = out.head.getAs[Long]("user_id")
    val ref = tables.Tables.events(spark, sfDir)
      .filter(col("user_id") === u)
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_type")).collect()
      .map(_.getString(0)).take(operators.EventAnalytics.PathLen).mkString(">")
    assert(out.head.getAs[String]("path") == ref)
  }

  test("z-order: per-bucket key ranges shrink on BOTH columns vs natural order") {
    // the data-skipping claim itself: chunk the table into "files" of
    // contiguous rows and compare min/max spans per chunk — z-order
    // must beat natural (orderkey) order on partkey AND suppkey
    import org.apache.spark.sql.Row
    val li = tables.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    def avgSpan(rows: Array[Row], buckets: Int): (Double, Double) = {
      val per = math.max(1, rows.length / buckets)
      val spans = rows.grouped(per).filter(_.length > 1).map { g =>
        val pk = g.map(_.getAs[Long]("l_partkey"))
        val sk = g.map(_.getAs[Long]("l_suppkey"))
        ((pk.max - pk.min).toDouble, (sk.max - sk.min).toDouble)
      }.toSeq
      (spans.map(_._1).sum / spans.size, spans.map(_._2).sum / spans.size)
    }
    val natural = li.orderBy(col("l_orderkey"), col("l_linenumber")).collect()
    val zed = operators.Relational.zorderKey(spark, sfDir).collect()
    // compare over the same row count (the graded query is limit 2000)
    val (npk, nsk) = avgSpan(natural.take(zed.length), 16)
    val (zpk, zsk) = avgSpan(zed, 16)
    info(f"natural spans pk=$npk%.0f sk=$nsk%.0f; z-order pk=$zpk%.0f sk=$zsk%.0f")
    // SCALE-FREE bound: a contiguous run of a 2-key z-order covers a
    // near-square rectangle of the key plane, so 16 buckets give a
    // per-bucket partkey side of ~domain/√16 at ANY fixture scale —
    // assert against that geometric bound, not a tuned ratio. Natural
    // (orderkey) order scatters partkey across its whole domain, which
    // the npk comparison pins as the strictly-worse baseline.
    val domainPk = {
      val pks = natural.map(_.getAs[Long]("l_partkey"))
      (pks.max - pks.min).toDouble
    }
    assert(zpk <= domainPk / math.sqrt(16.0),
      s"z-order bucket span $zpk above the rectangle bound ${domainPk / 4}")
    assert(zpk < npk, s"z-order did not beat natural order: $zpk vs $npk")
    // suppkey's whole domain is single-digit at this fixture scale
    // (natural span ≈ the domain), so no layout can shrink it much —
    // the honest bound is not-worse
    assert(zsk <= nsk, s"z-order degraded suppkey clustering: $zsk vs $nsk")
  }

  test("TWAP: a weighted mean stays inside each user's value range") {
    val out = operators.EventAnalytics.twap(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ranges = tables.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (u, t) = (r.getAs[Long]("user_id"), r.getAs[Double]("twap"))
      val (lo, hi) = ranges(u)
      // cents rounding can nudge the bound by at most half a cent
      assert(t >= lo - 0.005 && t <= hi + 0.005,
        s"user $u twap $t outside [$lo, $hi]")
    }
  }

  test("BPE tokenize: per-doc counts bracket correctly and merges strictly compress") {
    val out = operators.Tokenizer.bpeTokenize(spark, sfDir).collect()
    assert(out.nonEmpty)
    import graft.functions.TextFunctions
    val charTotals = tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(length(col("tok"))).as("n_chars"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    var totalTokens = 0L; var totalChars = 0L
    out.foreach { r =>
      val (id, nw, nt) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (refWords, refChars) = charTotals(id)
      assert(nw == refWords, s"doc $id word count $nw != $refWords")
      assert(nt >= nw, s"doc $id: tokens $nt below words $nw")
      assert(nt <= refChars, s"doc $id: tokens $nt above chars $refChars")
      totalTokens += nt; totalChars += refChars
    }
    // 8 merges on real text must compress the corpus somewhere
    assert(totalTokens < totalChars, "BPE merges never fired")
  }
}
