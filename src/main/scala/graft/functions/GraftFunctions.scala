package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the graft native expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works like any
  * builtin. Two routes:
  *
  *  - [[GraftExtensions]]: the production path —
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (or `builder.withExtensions`) injects the functions at session
  *    build time.
  *  - [[GraftFunctions.register]]: runtime path for an existing session
  *    (REPL/tests).
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT, got: $other")
  }

  /** (name, (argc check, builder)) for every exposed function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> { args =>
      require(args.length == 2, "cosine_similarity(a, b)")
      ArrayMathExpressions.CosineSimilarityExpr(args(0), args(1))
    },
    "sq_dist" -> { args =>
      require(args.length == 2, "sq_dist(a, b)")
      ArrayMathExpressions.SqDistExpr(args(0), args(1))
    },
    "rolling_hash" -> { args =>
      require(args.length == 1, "rolling_hash(s)")
      ArrayMathExpressions.RollingHashExpr(args(0))
    },
    "shingle_hash_set" -> { args =>
      require(args.length == 2, "shingle_hash_set(s, k)")
      TextShingleExpressions.ShingleHashSetExpr(args(0), intArg(args(1), "k"))
    },
    "char_shingles" -> { args =>
      require(args.length == 2, "char_shingles(s, k)")
      TextShingleExpressions.ShinglesExpr(args(0), intArg(args(1), "k"))
    },
    "sorted_intersect_size" -> { args =>
      require(args.length == 2, "sorted_intersect_size(a, b)")
      TextShingleExpressions.SortedIntersectSizeExpr(args(0), args(1))
    },
    "md5_hash32" -> { args =>
      require(args.length == 1, "md5_hash32(s)")
      HashExpressions.Md5Prefix32Expr(args(0))
    })

  private def info(name: String) =
    new ExpressionInfo("org.apache.spark.sql.graft.GraftFunctions", name)

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("org.apache.spark.sql.graft.GraftFunctions", name),
          builder))
    }
}
