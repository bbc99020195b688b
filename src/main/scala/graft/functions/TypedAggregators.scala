package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

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

  /** Misra-Gries frequent-items summary with k counters: any item with
    * true frequency > n/k is GUARANTEED to survive (no false negatives;
    * counts are underestimates). Buffers merge associatively (pairwise
    * counter merge + decrement), so the sketch behaves like any other
    * partial aggregate. Used as pass 1 of the exact heavy-hitters
    * pattern: candidates here, exact counts for just the candidates in
    * pass 2 — the 100 TB alternative to a full groupBy when the key
    * space is huge and only the head matters.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (b.contains(item) || b.size < k - 1) b.updated(item, b.getOrElse(item, 0L) + 1)
      else b.transform((_, c) => c - 1).filter(_._2 > 0) // decrement-all step
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) }
      if (sum.size < k) sum
      else {
        // keep the k-1 largest after subtracting the k-th largest count
        // (Agarwal et al., "Mergeable Summaries": preserves the error bound)
        val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)
          .lift(k - 1).getOrElse(0L)
        sum.transform((_, c) => c - kth).filter(_._2 > 0)
      }
    }
    override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }
}
