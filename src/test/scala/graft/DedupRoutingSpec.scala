package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** The duplicate-heavy-corpus guard (SURVEY §8): the exact PPJoin
  * operator's cost follows its TRUE result set, which is quadratic on a
  * duplicate-dominated corpus; the band-bucket density probe must route
  * such corpora to the candidate-bounded LSH path and leave diverse
  * corpora on the exact path.
  */
class DedupRoutingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // ~150 near-copies of one base text (a few token edits each): the
  // duplicate-dominated shape where all-pairs output is ~N²/2
  private lazy val dupHeavy = {
    val rnd = new scala.util.Random(99)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = Vector.fill(60)(words(rnd.nextInt(words.size))).mkString(" ")
    (0 until 150).map { i =>
      val chars = base.toCharArray
      chars(rnd.nextInt(chars.length)) = ('a' + rnd.nextInt(26)).toChar
      (i.toLong, new String(chars))
    }.toDF("doc_id", "text")
  }

  test("density probe: high on duplicate-heavy corpus, low on the fixture") {
    val dHeavy = Dedup.duplicateDensity(dupHeavy)
    val dFixture = Dedup.duplicateDensity(
      graft.tables.Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    assert(dHeavy > 10.0, f"planted duplicates should be dense, got $dHeavy%.2f")
    assert(dFixture <= 2.0, f"fixture should be diverse, got $dFixture%.2f")
  }

  test("router: LSH path on duplicate-heavy input, exact path on the fixture") {
    // duplicate-heavy → LSH estimates (64ths), never the exact join
    val lshRes = Dedup.nearDupPairsAutoOn(dupHeavy).limit(500).collect()
    assert(lshRes.nonEmpty)
    lshRes.foreach { r =>
      val j = r.getDouble(2)
      val sixtyFourths = j * Dedup.NumHashes
      assert(math.abs(sixtyFourths - math.round(sixtyFourths)) < 1e-9,
        s"jaccard $j is not an n/${Dedup.NumHashes} estimate — exact path taken on dup-heavy corpus?")
    }
    // fixture → byte-identical to the exact operator
    val auto = Dedup.nearDupPairsAuto(spark, sfDir).collect().toSeq
    val exact = Dedup.ngramJaccardPairs(spark, sfDir).collect().toSeq
    assert(auto === exact)
  }
}
