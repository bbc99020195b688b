package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen MinHash signature: the full NumHashes-member signature
  * of a document computed in ONE pass over its k-shingles, per row.
  *
  * The signature is a pure per-document function — min over the shingle
  * MULTISET equals min over the shingle set — so nothing about it needs
  * an explode, a distinct, or a groupBy shuffle. The previous
  * formulation (explode shingles → hash → groupBy(doc_id).agg(64 mins))
  * shuffled one row per (doc, shingle) occurrence; this expression ships
  * zero intermediate rows and keeps the whole computation inside
  * whole-stage codegen. It also makes the STREAMING signature ingest
  * stateless: state only enters the streaming dedup pipeline at the
  * band-bucket decision join, where it belongs.
  *
  * Parity contract (the DuckDB oracle reproduces both stages):
  *  - shingle windows are the k-code-point substrings with the short-doc
  *    rule n = max(len - k + 1, 1) — identical to
  *    [[TextShingleExpressions.charShingles]];
  *  - oracle path (`prodHash = false`): h = rolling polynomial
  *    (h·31 + codepoint) mod 1e9+7 over the window — identical to
  *    [[ArrayMathExpressions.rollingHash]];
  *  - production path (`prodHash = true`): h = xxhash64(shingle) mod 2³²
  *    (Spark's seed-42 xxhash64 over the UTF-8 bytes) — identical to
  *    pmod(xxhash64(sh), 2^32);
  *  - member i = min over shingles of (A(i)·h + B(i)) mod P with the
  *    [[graft.operators.Dedup]] family constants (A < 2³¹, h < 2³² keep
  *    A·h + B below 2⁶³ — no overflow, same arithmetic as DuckDB BIGINT).
  */
object MinhashExpressions {

  case class MinhashSigExpr(child: Expression, k: Int, prodHash: Boolean)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override protected def nullSafeEval(input: Any): Any =
      MinhashExpressions.minhashSig(input.asInstanceOf[UTF8String], k, prodHash)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.MinhashExpressions.minhashSig($c, $k, $prodHash)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Family constants copied out of the Dedup object once (primitive
  // arrays for the hot loop; Dedup remains the source of truth that the
  // oracle SQL generator interpolates).
  private lazy val A: Array[Long] = graft.operators.Dedup.hashA.toArray
  private lazy val B: Array[Long] = graft.operators.Dedup.hashB.toArray
  private lazy val P: Long = graft.operators.Dedup.HashP

  /** Codegen entry point. One pass: for each k-code-point window compute
    * the 32-bit shingle hash, then fold it into the NumHashes running
    * mins (3 long ops per member). Cost per document ≈ shingles ×
    * NumHashes multiply-mods — all register arithmetic, no allocation
    * beyond the 64-slot result.
    */
  def minhashSig(s: UTF8String, k: Int, prodHash: Boolean): ArrayData = {
    val a = A; val b = B; val p = P
    val n = a.length
    val bytes = s.getBytes
    // start byte offset of each code point + end sentinel (same walk as
    // TextShingleExpressions.codePointOffsets)
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      offs(nChars) = i
      nChars += 1
      val c = bytes(i)
      i += (if ((c & 0x80) == 0) 1
            else if ((c & 0xE0) == 0xC0) 2
            else if ((c & 0xF0) == 0xE0) 3
            else 4)
    }
    offs(nChars) = bytes.length
    val nSh = math.max(nChars - k + 1, 1)
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var w = 0
    while (w < nSh) {
      val from = offs(w)
      val until = offs(math.min(w + k, nChars))
      val h =
        if (prodHash) {
          val xx = XxHash64Function.hash(
            UTF8String.fromBytes(bytes, from, until - from), StringType, 42L)
          // pmod(xxhash64, 2^32): mask is exact for the power-of-two modulus
          xx & 0xFFFFFFFFL
        } else {
          // rolling polynomial over the window's code points — decode
          // inline (same UTF-8 walk; ArrayMathExpressions.rollingHash
          // parity is pinned by Round8OpsSpec)
          var acc = 0L
          var j = from
          while (j < until) {
            val c0 = bytes(j)
            var cp = 0
            var len = 0
            if ((c0 & 0x80) == 0) { cp = c0; len = 1 }
            else if ((c0 & 0xE0) == 0xC0) {
              cp = ((c0 & 0x1F) << 6) | (bytes(j + 1) & 0x3F); len = 2
            } else if ((c0 & 0xF0) == 0xE0) {
              cp = ((c0 & 0x0F) << 12) | ((bytes(j + 1) & 0x3F) << 6) |
                (bytes(j + 2) & 0x3F); len = 3
            } else {
              cp = ((c0 & 0x07) << 18) | ((bytes(j + 1) & 0x3F) << 12) |
                ((bytes(j + 2) & 0x3F) << 6) | (bytes(j + 3) & 0x3F); len = 4
            }
            acc = (acc * 31L + cp) % 1000000007L
            j += len
          }
          acc
        }
      var m = 0
      while (m < n) {
        val v = (a(m) * h + b(m)) % p
        if (v < mins(m)) mins(m) = v
        m += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def minhashSigCol(text: Column, k: Int, prodHash: Boolean): Column =
    ExpressionUtils.column(MinhashSigExpr(ExpressionUtils.expression(text), k, prodHash))
}
