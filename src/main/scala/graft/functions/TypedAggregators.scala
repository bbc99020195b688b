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
}
