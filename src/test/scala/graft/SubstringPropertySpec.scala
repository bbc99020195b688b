package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-14 substring primitives, driving the
  * JVM kernels and the Spark operators with generated corpora instead
  * of the fixed fixtures — boundary shapes (empty strings, non-BMP
  * code points, whole-doc repeats, adjacent spans) that a curated
  * fixture undersamples.
  */
class SubstringPropertySpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatestplus bridge in the
    * offline cache): n draws from fixed seeds, so every CI run tests
    * the identical cases.
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    // mixed alphabet incl. a supplementary code point (surrogate pair
    // in UTF-16 — the case charAt-based hashing would corrupt)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.oneOf("α", "β", "ü"), Gen.const(new String(Character.toChars(0x1F600)))))
  } yield cs.mkString

  test("property: sliding window hashes equal per-substring folds on arbitrary text") {
    def fold(cps: Array[Int], base: Long, mod: Long): Long =
      cps.foldLeft(0L)((acc, c) => (acc * base + c) % mod)
    samples(Gen.zip(textGen, Gen.chooseNum(1, 12)), 60).foreach { case (text, win) =>
      val got = org.apache.spark.sql.graft.ArrayMathExpressions
        .rollingWindowHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(text),
          win, 31L, 1000000007L)
        .toLongArray().toSeq
      val cps = text.codePoints().toArray
      val want = (0 to cps.length - win)
        .map(i => fold(cps.slice(i, i + win), 31L, 1000000007L))
      assert(got === want)
    }
  }

  test("property: substringDedup spans are disjoint, >= L, and cover exactly the repeated windows") {
    // small corpora with FORCED duplication: half the docs repeat a
    // shared block so spans actually occur
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      block <- Gen.listOfN(45, Gen.alphaChar).map(_.mkString)
      n <- Gen.chooseNum(3, 6)
      tails <- Gen.listOfN(n, Gen.listOfN(30, Gen.alphaNumChar).map(_.mkString))
    } yield tails.zipWithIndex.map { case (t, i) =>
      if (i % 2 == 0) (i.toLong, s"$i$t $block ${t.reverse}$i")
      else (i.toLong, s"${t}uniq$i")
    }
    samples(corpusGen, 8).foreach { corpus =>
      val L = Dedup.SubstringL
      val spans = Dedup.substringDedupOn(corpus.toDF("doc_id", "text"), L)
        .as[(Long, Long, Long, Long, Long)].collect()
      val texts = corpus.toMap
      // disjointness + minimum length + window-count consistency
      spans.groupBy(_._1).foreach { case (d, ds) =>
        val sorted = ds.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2, s"doc $d spans overlap/abut")
          case _ =>
        }
        sorted.foreach { case (_, s, e, len, nw) =>
          assert(len === e - s && len >= L)
          assert(nw === len - L + 1,
            s"doc $d: contiguous span must cover every window start")
          assert(e - 1 <= texts(d).codePoints().count())
        }
      }
      // exact coverage: a position is in a span iff its L-window text
      // occurs >= 2 times in the corpus (code-point arithmetic)
      val allGrams = corpus.flatMap { case (_, t) =>
        val cps = t.codePoints().toArray
        (0 to cps.length - L).map(i => new String(cps.slice(i, i + L), 0, L))
      }.groupBy(identity).view.mapValues(_.size).toMap
      corpus.foreach { case (d, t) =>
        val cps = t.codePoints().toArray
        val covered = spans.filter(_._1 == d)
          .flatMap { case (_, s, e, _, _) => (s to e - L) }.toSet
        (0 to cps.length - L).foreach { i =>
          val repeated = allGrams(new String(cps.slice(i, i + L), 0, L)) >= 2
          assert(covered.contains(i + 1L) === repeated,
            s"doc $d pos ${i + 1}: repeated=$repeated covered=${covered.contains(i + 1L)}")
        }
      }
    }
  }

  test("property: winnowing guarantee and density hold on generated corpora") {
    import graft.operators.TextAnalysis
    val k = TextAnalysis.WinnowK
    val w = TextAnalysis.WinnowW
    // two docs over DISJOINT alphabets except a planted shared run of
    // exactly the guarantee length w+k-1
    val gen = for {
      run <- Gen.listOfN(w + k - 1, Gen.oneOf('0' to '9')).map(_.mkString)
      a <- Gen.listOfN(60, Gen.oneOf('a' to 'm')).map(_.mkString)
      b <- Gen.listOfN(60, Gen.oneOf('n' to 'z')).map(_.mkString)
    } yield (run, a, b)
    samples(gen, 12).foreach { case (run, a, b) =>
      val docs = Seq((0L, s"$a$run${a.reverse}"), (1L, s"$b$run${b.reverse}"))
        .toDF("doc_id", "text")
      val fps = TextAnalysis.winnowFingerprintsOn(docs)
        .as[(Long, Long, Long)].collect()
      val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
      // guarantee: the shared >= w+k-1 run forces a common fingerprint
      assert((byDoc(0L) & byDoc(1L)).nonEmpty,
        s"guarantee violated for run '$run'")
      // density: distinct selected positions stay within the winnowing
      // band (1/w .. 4/(w+1)) of window positions per doc
      Seq(0L, 1L).foreach { d =>
        val nPos = (if (d == 0L) s"$a$run${a.reverse}" else s"$b$run${b.reverse}")
          .length - k + 1
        val sel = fps.count(_._1 == d).toDouble
        assert(sel / nPos > 1.0 / (w + 1) && sel / nPos < 4.0 / (w + 1),
          s"doc $d density ${sel / nPos} outside band")
      }
    }
  }

  test("property: clip output equals manual excision on generated corpora") {
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      block <- Gen.listOfN(50, Gen.alphaChar).map(_.mkString)
      t1 <- Gen.listOfN(25, Gen.alphaNumChar).map(_.mkString)
      t2 <- Gen.listOfN(25, Gen.alphaNumChar).map(_.mkString)
    } yield Seq((0L, s"A$t1.$block,$t2"), (1L, s"B$t2~$block;$t1"))
    samples(corpusGen, 6).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val spans = Dedup.substringDedupOn(docs)
        .as[(Long, Long, Long, Long, Long)].collect().groupBy(_._1)
      val clipped = Dedup.substringClipOn(docs)
        .as[(Long, Long, Long, String)].collect().toSeq
      val texts = corpus.toMap
      clipped.foreach { case (d, _, removed, text) =>
        val cps = texts(d).codePoints().toArray
        val cut = spans(d).flatMap { case (_, s, e, _, _) => (s until e) }.toSet
        val manual = cps.indices.collect {
          case i if !cut.contains(i + 1L) => cps(i)
        }
        assert(text === new String(manual.toArray, 0, manual.length))
        assert(removed === cut.size.toLong)
      }
    }
  }
}
