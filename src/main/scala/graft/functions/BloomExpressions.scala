package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column builders over Spark's runtime-filter Bloom machinery
  * (BloomFilterAggregate / BloomFilterMightContain — the expressions
  * InjectRuntimeFilter plants under AQE), exposed so an operator can
  * build and apply a Bloom prefilter EXPLICITLY where the optimizer
  * has no statistics to justify one (e.g. a semantic small side the
  * planner can't see, like "eval shingles" vs "train shingles" within
  * one relation).
  *
  * BloomFilterMightContain requires its filter input to be a constant
  * or scalar subquery, so the built sketch is collected and embedded
  * as a binary literal — bounded model state (bits ∝ expected items),
  * the same class as broadcast k-means centroids, never corpus rows.
  */
object BloomExpressions {

  /** Aggregate a LongType column into a Bloom filter's serialized bytes. */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(c),
      Literal(math.max(expectedItems, 1L)),
      Literal(math.max(numBits, 64L)), 0, 0).toAggregateExpression())

  /** Membership probe of a LongType column against built sketch bytes.
    * No false negatives — a downstream exact join stays lossless.
    */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ExpressionUtils.expression(c)))
}
