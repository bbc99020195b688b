package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from the
  * codegen'd higher-order builtins (`zip_with`, `aggregate`) so the whole
  * similarity computation stays inside whole-stage codegen — no UDF, no
  * ml.linalg conversion, no serialization cliff. All arithmetic is done
  * in double after casting each element, matching what the DuckDB oracle
  * (`list_cosine_similarity`) computes.
  */
object VectorFunctions {

  /** Elementwise product summed: dot(a, b). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance (cheaper than sqrt for argmin). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
}
