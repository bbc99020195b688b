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
}
