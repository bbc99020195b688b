package org.apache.spark.sql.graft

import java.util.Arrays

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the shingle/dedup hot path. The
  * DataFrame-builtin formulation (sequence → transform → substring →
  * explode → distinct, then array_intersect for verification) evaluates
  * interpreted: every substring re-scans the UTF-8 prefix (O(len²) per
  * document) and every intersection allocates and boxes. At corpus scale
  * the near-dup verifier evaluates millions of pair intersections — these
  * expressions make each one a primitive merge walk.
  *
  * Set representation: a document's k-shingle set is a SORTED array of
  * 64-bit FNV-1a hashes of each k-code-point window, deduplicated.
  * Set algebra on two such arrays is a linear merge. Collisions are
  * ~|vocab|²/2^65 — negligible, and the exact-string DuckDB oracle
  * differentially checks the end-to-end Jaccard values.
  */
object TextShingleExpressions {

  /** Sorted, deduped 64-bit hash set of all k-code-point shingles. */
  case class ShingleHashSetExpr(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash_set"

    override protected def nullSafeEval(input: Any): Any =
      TextShingleExpressions.shingleHashSet(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.TextShingleExpressions.shingleHashSet($c, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** |A ∩ B| for two sorted long arrays — one merge walk, no allocation. */
  case class SortedIntersectSizeExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_size"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      TextShingleExpressions.sortedIntersectSize(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.TextShingleExpressions.sortedIntersectSize($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** |A ∩ B| with an EARLY-EXIT bound: the merge walk aborts as soon as
    * c + min(remaining_a, remaining_b) < need — i.e. the moment the pair
    * provably cannot reach `need` shared elements. For any row whose
    * true intersection is ≥ need the bound never fires, so the returned
    * count is EXACT for every row a `≥ threshold` filter keeps; rows
    * below the threshold may return an underestimate that is still
    * < need (they are filtered either way — callers must only consume
    * the value through such a filter, and must derive `need` as a
    * conservative LOWER bound on the filter's implied minimum count so
    * float rounding can never push a passing pair under it). Cuts the
    * verification CPU of saturated candidate sets (most candidates fail
    * far below the threshold, so the walk stops after ~the shorter
    * array's (1−t) fraction instead of completing both).
    */
  case class SortedIntersectAtLeastExpr(first: Expression,
      second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType), LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_at_least"

    override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
      TextShingleExpressions.sortedIntersectSizeAtLeast(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        n.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, n) =>
        s"org.apache.spark.sql.graft.TextShingleExpressions" +
          s".sortedIntersectSizeAtLeast($a, $b, $n)")

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Dot product of two sparse term-frequency vectors, each encoded as
    * a hash-SORTED interleaved long array [h0, tf0, h1, tf1, …]: one
    * merge walk over the stride-2 arrays, summing tf products where the
    * hashes agree. The lexical-cosine verifier's kernel — the pair×token
    * join formulation shuffled |pairs|·|tokens-per-doc| string-keyed
    * rows through two exchanges; this walks two ≤|vocab-per-doc| arrays
    * per pair with no shuffle at all (the containment/Jaccard
    * sorted-set-verification pattern applied to weighted vectors).
    * Exact integer arithmetic; hashes are per-doc-distinct tokens, so a
    * cross-token collision (≈|vocab|²/2^65, the documented shingle-hash
    * exposure) is the only divergence class and the end-to-end string
    * oracle differentially checks it.
    */
  case class SortedTfDotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_tf_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      TextShingleExpressions.sortedTfDot(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.TextShingleExpressions.sortedTfDot($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** All k-code-point shingles as strings, one pass over the bytes
    * (each shingle is a byte-slice — no per-substring prefix rescan).
    * Order of first appearance; duplicates preserved (callers that need
    * a set compose with array_distinct or use [[ShingleHashSetExpr]]).
    */
  case class ShinglesExpr(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "char_shingles"

    override protected def nullSafeEval(input: Any): Any =
      TextShingleExpressions.charShingles(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.TextShingleExpressions.charShingles($c, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ——— codegen entry points (static, primitive) ———

  /** Start byte offset of each code point, plus end sentinel. */
  private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      offs(n) = i
      n += 1
      val b = bytes(i)
      i += (if ((b & 0x80) == 0) 1
            else if ((b & 0xE0) == 0xC0) 2
            else if ((b & 0xF0) == 0xE0) 3
            else 4)
    }
    offs(n) = bytes.length
    Arrays.copyOf(offs, n + 1)
  }

  def shingleHashSet(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = codePointOffsets(bytes)
    val nChars = offs.length - 1
    // substr semantics parity: a document shorter than k yields its
    // whole text as the single shingle (generate_series(1, max(n-k+1, 1))).
    val n = math.max(nChars - k + 1, 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = offs(i)
      val until = offs(math.min(i + k, nChars))
      var h = 0xcbf29ce484222325L // FNV-1a 64
      var j = from
      while (j < until) {
        h ^= (bytes(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      hs(i) = h
      i += 1
    }
    Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < n) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(Arrays.copyOf(hs, w))
  }

  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sortedIntersectSizeAtLeast(a: ArrayData, b: ArrayData,
      need: Long): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb &&
        c + math.min(na - i, nb - j) >= need) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sortedTfDot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var dot = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { dot += a.getLong(i + 1) * b.getLong(j + 1); i += 2; j += 2 }
      else if (x < y) i += 2
      else j += 2
    }
    dot
  }

  def charShingles(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val offs = codePointOffsets(bytes)
    val nChars = offs.length - 1
    val n = math.max(nChars - k + 1, 1)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val from = offs(i)
      val until = offs(math.min(i + k, nChars))
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }

  // Column builders (ExpressionUtils is private[sql]).
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def shingleHashSetCol(text: Column, k: Int): Column =
    ExpressionUtils.column(ShingleHashSetExpr(ExpressionUtils.expression(text), k))

  def sortedIntersectSizeCol(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSizeExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedIntersectAtLeastCol(a: Column, b: Column, need: Column): Column =
    ExpressionUtils.column(SortedIntersectAtLeastExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(need)))

  def sortedTfDotCol(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedTfDotExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def charShinglesCol(text: Column, k: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(text), k))
}
