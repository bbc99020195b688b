package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the embedding /
  * fingerprint hot paths. The higher-order builtins (`zip_with` +
  * `aggregate`) express the same math but do not participate in
  * whole-stage codegen — every element is boxed and every row allocates
  * intermediate arrays. At 100 TB (billions of 64-dim cosine evals in a
  * similarity join) that interpretation overhead dominates; these
  * expressions compile to a tight primitive loop instead, one pass, no
  * allocation.
  *
  * Numeric contract: accumulate left-to-right in double, each float cast
  * to double first — the exact order the DuckDB oracle's
  * `list_sum(list_transform(...))` uses, so results are bitwise equal
  * and `round(_, 6)` is stable across engines.
  */
object ArrayMathExpressions {

  /** cosine(a, b) = dot/(|a|·|b|), one fused pass over both arrays. */
  case class CosineSimilarityExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      // all-zero vector: define cosine as 0 (NaN would diverge from the
      // DuckDB oracle, whose guarded SQL mirrors this)
      if (na * nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |${ev.value} = ($na * $nb == 0.0) ? 0.0
           |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Squared euclidean distance — argmin-friendly (no sqrt). */
  case class SqDistExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sq_dist"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Double-array squared L2 — the k-means assignment kernel.
    * Accumulates sequentially from 0.0 in element order, exactly the
    * HOF `aggregate(zip_with(...))` fold it replaces (and DuckDB's
    * list_sum), so swapping it in cannot move a single bit; it exists
    * because the interpreted HOF lambda was the kmeans hot-spot
    * (4× wall jump crossing 200k vectors × k centroids).
    */
  case class SqDistDoubleExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sq_dist_d"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = $a.getDouble($i) - $b.getDouble($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Pack a float embedding into signed int8 bytes: q_i =
    * clamp(round(x_i/scale), ±127). The 4× serving compression —
    * 64 bytes + one scale per 64-dim vector instead of 256 float
    * bytes; at corpus scale this table is what stays resident.
    */
  case class Int8PackExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), DoubleType)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "int8_pack"

    override protected def nullSafeEval(a: Any, s: Any): Any =
      ArrayMathExpressions.int8Pack(a.asInstanceOf[ArrayData], s.asInstanceOf[Double])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, s) =>
        s"org.apache.spark.sql.graft.ArrayMathExpressions.int8Pack($a, $s)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Integer dot product of two packed int8 vectors — the quantized
    * scoring kernel (all integer MACs; the shape hardware int8 paths
    * accelerate).
    */
  case class Int8DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def prettyName: String = "int8_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      ArrayMathExpressions.int8Dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.ArrayMathExpressions.int8Dot($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def int8Pack(arr: ArrayData, scale: Double): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      var i = 0
      while (i < n) {
        val q = Math.round(arr.getFloat(i).toDouble / scale)
        out(i) = Math.max(-127L, Math.min(127L, q)).toByte
        i += 1
      }
    }
    out
  }

  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Rolling polynomial fingerprint over a string's code points:
    * h = (h*base + codepoint) mod `mod` (defaults 31 / 1e9+7).
    * Semantics match `ascii(substr(text, i, 1))` folded left (= DuckDB
    * `ord(substr(...))`) — both index by code point, which the
    * codePointAt walk reproduces. The (base, mod) parameters exist so
    * composite keys can pair two INDEPENDENT polynomials (a salt
    * appended to the input does NOT give independence: h(s+salt) is a
    * deterministic function of h(s), so colliding inputs still
    * collide; a different base/modulus breaks that).
    */
  case class RollingHashExpr(child: Expression,
                             base: Long = 31L, mod: Long = 1000000007L)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override protected def nullSafeEval(input: Any): Any =
      ArrayMathExpressions.rollingHash(input.asInstanceOf[UTF8String], base, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.ArrayMathExpressions.rollingHash($c, ${base}L, ${mod}L)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Every length-`win` window's rolling hash in ONE pass — the
    * Rabin-Karp slide over [[RollingHashExpr]]'s polynomial (same
    * base/mod, same code-point alphabet), so element i equals
    * `rolling_hash(substr(s, i+1, win))` exactly while costing O(n)
    * instead of the O(n·win) of hashing each window from scratch. This
    * is what makes stride-1 substring-dedup keys affordable at corpus
    * scale: the per-document cost is one pass, and only (pos, hash)
    * longs enter the shuffle, never the window text. The DuckDB twin
    * re-derives each window with the O(n·win) per-substring fold
    * (rollSql over substr) — same values, oracle-checkable.
    */
  case class RollingWindowHashExpr(child: Expression, win: Int,
                                   base: Long = 31L, mod: Long = 1000000007L)
      extends UnaryExpression with ExpectsInputTypes {
    require(win >= 1, s"window must be positive, got $win")
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rolling_window_hash"

    override protected def nullSafeEval(input: Any): Any =
      ArrayMathExpressions.rollingWindowHash(
        input.asInstanceOf[UTF8String], win, base, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.ArrayMathExpressions.rollingWindowHash($c, $win, ${base}L, ${mod}L)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Robust-winnowing position selection over an array of window
    * hashes: for every full window of `win` consecutive hashes, the
    * RIGHTMOST index of the minimum hash — exactly
    * `min(struct(h, −pos))` per window (the DuckDB oracle's form, the
    * tie rule of Schleimer et al.'s robust winnowing) — deduplicated,
    * ascending, 1-based. One monotonic-deque pass: O(n) total versus
    * the O(n·win) per-window scan, and a single codegen call versus
    * the boxed higher-order transform/array_min chain (which measured
    * ~6× slower as the streaming ingest's hot path). Selections never
    * move left as the window slides, so consecutive-dedup IS distinct.
    */
  case class WinnowSelectExpr(child: Expression, win: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(win >= 1, s"window must be positive, got $win")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_select"

    override protected def nullSafeEval(input: Any): Any =
      ArrayMathExpressions.winnowSelectPositions(input.asInstanceOf[ArrayData], win)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.sql.graft.ArrayMathExpressions.winnowSelectPositions($c, $win)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Column builders — ExpressionUtils is private[sql], which is why this
  // file lives under org.apache.spark.sql (the standard seam for native
  // Catalyst extensions).
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  def cosineCol(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sqDistCol(a: Column, b: Column): Column =
    ExpressionUtils.column(SqDistExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sqDistDoubleCol(a: Column, b: Column): Column =
    ExpressionUtils.column(SqDistDoubleExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def int8PackCol(emb: Column, scale: Column): Column =
    ExpressionUtils.column(Int8PackExpr(
      ExpressionUtils.expression(emb), ExpressionUtils.expression(scale)))

  def int8DotCol(a: Column, b: Column): Column =
    ExpressionUtils.column(Int8DotExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def rollingHashCol(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))

  def rollingHashCol(c: Column, base: Long, mod: Long): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c), base, mod))

  def winnowSelectCol(c: Column, win: Int): Column =
    ExpressionUtils.column(WinnowSelectExpr(ExpressionUtils.expression(c), win))

  /** Codegen entry point for [[WinnowSelectExpr]]: sliding-window
    * minimum via a monotonic deque. Popping `>=` at push keeps the
    * RIGHTMOST index among equal minima (the (h, −pos) struct-min tie
    * rule); the deque holds strictly increasing hash values, front =
    * the window's selection.
    */
  def winnowSelectPositions(hs: ArrayData, win: Int): ArrayData = {
    val n = hs.numElements()
    if (n < win)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val dq = new Array[Int](n)
    val out = new Array[Long](n - win + 1)
    var head = 0
    var tail = 0
    var nOut = 0
    var last = -1
    var j = 0
    while (j < n) {
      // fail loudly on null elements: ArrayData.getLong would silently
      // read a null as 0 and corrupt the selection (internal producers
      // are containsNull=false, so this guards misuse only)
      if (hs.isNullAt(j))
        throw new IllegalArgumentException(
          s"winnow_select: null element at index $j — input must be a " +
            "non-null array of window hashes")
      val hj = hs.getLong(j)
      while (tail > head && hs.getLong(dq(tail - 1)) >= hj) tail -= 1
      dq(tail) = j
      tail += 1
      val start = j - win + 1
      if (start >= 0) {
        while (dq(head) < start) head += 1
        val sel = dq(head)
        if (sel != last) {
          out(nOut) = sel + 1L // 1-based, the oracle's substr convention
          nOut += 1
          last = sel
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, nOut))
  }

  def rollingWindowHashCol(c: Column, win: Int): Column =
    ExpressionUtils.column(RollingWindowHashExpr(ExpressionUtils.expression(c), win))

  def rollingWindowHashCol(c: Column, win: Int, base: Long, mod: Long): Column =
    ExpressionUtils.column(
      RollingWindowHashExpr(ExpressionUtils.expression(c), win, base, mod))

  /** Codegen entry point for [[RollingWindowHashExpr]]: one Rabin-Karp
    * pass over the CODE POINTS (the [[rollingHash]] alphabet — DuckDB's
    * `ord`), windows of `win` code points, 1 output per start position.
    * Arithmetic bound: acc < mod ≤ 2^30, base ≤ 131, code point ≤
    * 0x10FFFF, pow < mod — every intermediate stays far below 2^63.
    */
  def rollingWindowHash(s: UTF8String, win: Int, base: Long, mod: Long): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < win) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - win + 1)
    var pow = 1L
    var i = 0
    while (i < win - 1) { pow = pow * base % mod; i += 1 }
    var acc = 0L
    i = 0
    while (i < win) { acc = (acc * base + cps(i)) % mod; i += 1 }
    out(0) = acc
    i = 1
    while (i <= n - win) {
      acc = ((acc + mod - cps(i - 1) * pow % mod) % mod * base + cps(i + win - 1)) % mod
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Codegen entry point for [[RollingHashExpr]]. */
  def rollingHash(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}
