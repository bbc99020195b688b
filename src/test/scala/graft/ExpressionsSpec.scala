package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ArrayMathExpressions, TextShingleExpressions}
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests for the native codegen expressions against their
  * interpreted reference forms (HOF builtins / plain Scala folds) — the
  * two paths must agree bit-for-bit because the DuckDB oracle rounds at
  * fixed precision.
  */
class ExpressionsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def vec(n: Int): Array[Float] = Array.fill(n)(rnd.nextFloat() * 2 - 1)

  test("codegen cosine == HOF cosine, bitwise") {
    val df = Seq.fill(50)((vec(64), vec(64))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.cosine($"a", $"b").as("fast"),
      VectorFunctions.cosineHof($"a", $"b").as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("sqDist: non-negative, zero on self") {
    val df = Seq.fill(20)(vec(32)).map(v => (v, v)).toDF("a", "b")
    val rows = df.select(VectorFunctions.sqDist($"a", $"b")).as[Double].collect()
    rows.foreach(d => assert(d === 0.0))
  }

  test("rollingHash matches Scala fold, including multibyte code points") {
    val samples = Seq("", "a", "hello world", "héllø wörld", "Ab1 ~ü€")
    val got = samples.toDF("s")
      .select(ArrayMathExpressions.rollingHashCol($"s")).as[Long].collect()
    val want = samples.map(_.codePoints().toArray.foldLeft(0L)(
      (acc, cp) => (acc * 31 + cp) % 1000000007L))
    assert(got.toSeq === want)
  }

  test("md5Prefix32 equals the builtin conv(substring(md5)) form, incl. multibyte") {
    val samples = Seq("", "a", "hello world", "héllø wörld", "Ab1 ~ü€",
      "the quick brown fox jumps over the lazy dog")
    val rows = samples.toDF("s").select(
      org.apache.spark.sql.graft.HashExpressions.md5Prefix32Col($"s").as("fast"),
      conv(substring(md5($"s"), 1, 8), 16, 10).cast("long").as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // range contract: unsigned 32-bit in a long
    rows.foreach(r => assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 32)))
  }

  test("charShingles equals naive sliding window") {
    val samples = Seq("abcdefghij", "short", "", "héllø wörld")
    val k = 4
    val got = samples.toDF("s")
      .select(TextShingleExpressions.charShinglesCol($"s", k)).as[Seq[String]].collect()
    val want = samples.map { s =>
      val cps = s.codePoints().toArray
      val n = math.max(cps.length - k + 1, 1)
      (0 until n).map(i => new String(cps.slice(i, i + k), 0,
        math.min(k, math.max(cps.length - i, 0))))
    }
    got.zip(want).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
  }

  test("shingleHashSet: sorted, deduped, size equals distinct string shingles") {
    val samples = Seq("abcabcabc", "aaaaaaaaaaaa", "the quick brown fox")
    val k = 4
    val rows = samples.toDF("s").select(
      TextShingleExpressions.shingleHashSetCol($"s", k).as("hs"),
      array_distinct(TextShingleExpressions.charShinglesCol($"s", k)).as("ss"))
      .select(col("hs"), size(col("ss")).as("n")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      assert(hs === hs.sorted, "sorted")
      assert(hs.distinct.size === hs.size, "deduped")
      assert(hs.size === r.getInt(1), "size == distinct string shingles")
    }
  }

  test("sortedIntersectSize equals set intersection") {
    val pairs = Seq(
      (Array(1L, 3L, 5L, 7L), Array(2L, 3L, 5L, 8L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array[Long](), Array(1L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)))
    val got = pairs.toDF("a", "b")
      .select(TextShingleExpressions.sortedIntersectSizeCol($"a", $"b"))
      .as[Long].collect()
    val want = pairs.map { case (a, b) => (a.toSet & b.toSet).size.toLong }
    assert(got.toSeq === want)
  }
}
