package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]` examples — the general UDAF contract
  * (SURVEY.md §2.2 UDF/UDAF row; the reference's pluggable reducer,
  * word_count.ex:10-13, is the untyped ancestor). Aggregators run with
  * map-side partial aggregation: `reduce` combines within a partition,
  * `merge` across partitions — exactly the combiner/reducer split of
  * the MapReduce paper §4.3.
  */
object TypedAggregators {

  /** Bounded top-k: the buffer holds at most k (value, tag) pairs, so a
    * group of a billion rows still ships k rows per partition — the
    * aggregation form of TakeOrderedAndProject. Returns the values
    * descending (ties broken by tag ascending).
    */
  final class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, t) => (-v, t) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      trim(b :+ a)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** The bounded per-group top-K selection dataflow in ONE home —
    * group by `key`, keep the k largest `v` (ties to the smaller
    * `tag`) through [[TopK]], explode to (key, rank, tag, v). This is
    * the scale-safe alternative to a key-partitioned rank window:
    * groups can be corpus-sized while the aggregator ships ≤k rows per
    * partition per key map-side. Encoding contract (stated once, here,
    * instead of per call site): `v` must be Double-EXACT for the
    * intended ordering — negate it for smallest-first (−dist, −µs; any
    * long magnitude < 2⁵³ survives the cast), and ties break ascending
    * on `tag`, matching a `row_number() OVER (ORDER BY v DESC, tag)`
    * oracle. Input columns: key, v, tag.
    */
  def topKSelect(spark: SparkSession, rows: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    rows.select(col("key").cast("long"), col("v").cast("double"), col("tag").cast("long"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, v, t) => (v, t) }
      // the group size rides the same single pass — callers needing
      // per-key totals (event paths) must not pay a second shuffle
      .agg(new TopK(k).toColumn.name("top"),
        count(lit(1)).as[Long].name("n_rows"))
      .toDF("key", "top", "n_rows")
      .select(col("key"), col("n_rows"), posexplode(col("top")))
      .select(col("key"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("tag"), col("col._1").as("v"), col("n_rows"))
  }

  /** Misra-Gries frequent-items summary with k counters: any item with
    * true frequency > n/k is GUARANTEED to survive (no false negatives;
    * counts are underestimates). Buffers merge associatively (pairwise
    * counter merge + decrement), so the sketch behaves like any other
    * partial aggregate. Used as pass 1 of the exact heavy-hitters
    * pattern: candidates here, exact counts for just the candidates in
    * pass 2 — the 100 TB alternative to a full groupBy when the key
    * space is huge and only the head matters.
    *
    * The buffer is a MUTABLE hash map updated in place: typed
    * aggregation keeps the buffer as a live object between `reduce`
    * calls and only serializes it at partition boundaries (Kryo), so
    * the hot path is one hash probe + in-place increment per row —
    * round 1's immutable `Map.updated` allocated per input row and
    * rebuilt the whole map on every decrement, which made the sketch
    * slower than the full groupBy it exists to avoid.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    override def reduce(b: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
      val cur = b.getOrElse(item, -1L)
      if (cur >= 0L) b.update(item, cur + 1L)
      else if (b.size < k - 1) b.update(item, 1L)
      else {
        // decrement-all: snapshot keys (size < k) so removal is safe
        val keys = b.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = b(keys(i))
          if (c == 1L) b.remove(keys(i)) else b.update(keys(i), c - 1L)
          i += 1
        }
      }
      b
    }
    override def merge(x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      y.foreachEntry((i, c) => x.update(i, x.getOrElse(i, 0L) + c))
      if (x.size >= k) {
        // keep the k-1 largest after subtracting the k-th largest count
        // (Agarwal et al., "Mergeable Summaries": preserves the error bound)
        val counts = x.values.toArray
        java.util.Arrays.sort(counts)
        val kth = counts(counts.length - k) // k-th largest
        val keys = x.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = x(keys(i)) - kth
          if (c <= 0L) x.remove(keys(i)) else x.update(keys(i), c)
          i += 1
        }
      }
      x
    }
    override def finish(r: mutable.HashMap[String, Long]): Seq[String] = r.keys.toSeq.sorted
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }
}
