package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hash expression for the dedup hot path. The builtin
  * composition `conv(substring(md5(s), 1, 8), 16, 10)` computes the
  * same value but materializes a 32-char hex UTF8String per row, then
  * re-parses it — measured ~4× slower than this expression over the
  * shingle stream (the md5 path was 10s vs 2.2s for xxhash64 at sf0.1
  * before this; the gap was string plumbing, not MD5 itself).
  *
  * Value contract: first 8 hex chars of md5 = first 4 digest bytes,
  * big-endian, as an unsigned 32-bit value in a long — bit-identical
  * to the DuckDB oracle's `('0x'||substr(md5(s),1,8))::BIGINT`.
  */
object HashExpressions {

  case class Md5Prefix32Expr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_prefix32"

    override protected def nullSafeEval(input: Any): Any =
      md5Prefix32(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.HashExpressions.md5Prefix32($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // MessageDigest.getInstance is a provider lookup — per-thread reuse,
  // not per-row. reset() returns the instance to its initial state.
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Codegen/eval entry point: unsigned big-endian first 4 MD5 bytes. */
  def md5Prefix32(s: UTF8String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def md5Prefix32Col(c: Column): Column =
    ExpressionUtils.column(Md5Prefix32Expr(ExpressionUtils.expression(c)))
}
