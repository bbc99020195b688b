package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayMathExpressions

/** Vector math over `array<float>` embedding columns. The hot ops
  * (cosine, squared distance) are native codegen'd Catalyst expressions
  * ([[org.apache.spark.sql.graft.ArrayMathExpressions]]) — a fused
  * primitive loop per row. The higher-order-function forms they replace
  * (`zip_with` + `aggregate`) are kept as `*Hof` for differential tests;
  * they compute identical values but evaluate interpreted (boxed per
  * element), which is the difference between a similarity join that
  * scales and one that doesn't.
  */
object VectorFunctions {

  /** Cosine similarity in [-1, 1] — codegen'd fused loop. */
  def cosine(a: Column, b: Column): Column = ArrayMathExpressions.cosineCol(a, b)

  /** Squared euclidean distance (cheaper than sqrt for argmin). */
  def sqDist(a: Column, b: Column): Column = ArrayMathExpressions.sqDistCol(a, b)

  /** Double-array squared distance — same sequential fold as the HOF
    * form, codegen'd (the k-means assignment kernel).
    */
  def sqDistD(a: Column, b: Column): Column = ArrayMathExpressions.sqDistDoubleCol(a, b)

  /** Pack a float embedding into signed int8 bytes at the given scale
    * (4× serving compression; codegen'd).
    */
  def int8Pack(emb: Column, scale: Column): Column =
    ArrayMathExpressions.int8PackCol(emb, scale)

  /** Integer dot product of two int8-packed vectors (codegen'd). */
  def int8Dot(a: Column, b: Column): Column =
    ArrayMathExpressions.int8DotCol(a, b)

  /** Elementwise product summed: dot(a, b) — HOF reference form. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine via HOFs — reference implementation for differential tests. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))
}
