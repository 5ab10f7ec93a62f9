package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Scalar (int8-range) vector quantization for the ANN family.
  *
  * `graft_q8(v)` maps each component to round(x·127/max|x|) ∈ [-127, 127];
  * `graft_q8_cos(qa, qb)` then estimates cosine as
  * qa·qb / √((qa·qa)(qb·qb)) — the per-vector scales CANCEL in the
  * normalized form, so no scale column is ever stored or shipped, and the
  * whole estimate is integer arithmetic plus one final division: exactly
  * reproducible in any engine (every intermediate sum is an exact integer
  * well under 2⁵³).
  *
  * Rounding is half-AWAY-from-zero on both paths (Math.round for x ≥ 0,
  * −Math.round(−x) otherwise) — the same rule C-family `round()` applies,
  * so a SQL oracle quantizes to identical integers.
  *
  * Scale story: a 64-dim float64 vector is 512 B; its q8 form is 64 ints
  * that pack to 64 B on the wire — the candidate-scoring stage of a
  * quantized ANN ships and scans ~8× less data, and the inner loop is
  * integer multiply-adds. The exact rerank touches original vectors only
  * for the few candidates that survive.
  */
case class GraftQ8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_q8 requires array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_q8"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Int](n)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        val t = arr.getDouble(i) * 127.0 / maxAbs
        out(i) = if (t >= 0) Math.round(t).toInt else (-Math.round(-t)).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val a = ctx.freshName("a")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $c.numElements();
        |double $maxAbs = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $a = java.lang.Math.abs($c.getDouble($i));
        |  if ($a > $maxAbs) $maxAbs = $a;
        |}
        |int[] $out = new int[$n];
        |if ($maxAbs > 0.0) {
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $t = $c.getDouble($i) * 127.0 / $maxAbs;
        |    $out[$i] = $t >= 0 ? (int) java.lang.Math.round($t)
        |                       : (int) -java.lang.Math.round(-$t);
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GraftQ8 =
    copy(child = newChild)
}

/** `graft_q8_cos(array<int>, array<int>)` → `double`: cosine estimate over
  * quantized vectors — see [[GraftQ8]]. Zero-norm input (an all-zero
  * vector) yields 0.0. Length mismatch is an error, mirroring
  * [[GraftSigAgree]]'s strictness.
  */
case class GraftQ8Cos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_q8_cos requires (array<int>, array<int>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_q8_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_q8_cos: vector lengths differ ($n vs ${y.numElements()})")
    var ab = 0L
    var aa = 0L
    var bb = 0L
    var i = 0
    while (i < n) {
      val xv = x.getInt(i).toLong
      val yv = y.getInt(i).toLong
      ab += xv * yv
      aa += xv * xv
      bb += yv * yv
      i += 1
    }
    if (aa == 0L || bb == 0L) 0.0
    else ab / math.sqrt((aa * bb).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  throw new IllegalArgumentException(
        |    "graft_q8_cos: vector lengths differ (" + $n + " vs " +
        |    $b.numElements() + ")");
        |}
        |long $ab = 0L, $aa = 0L, $bb = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  final long $xv = (long) $a.getInt($i);
        |  final long $yv = (long) $b.getInt($i);
        |  $ab += $xv * $yv;
        |  $aa += $xv * $xv;
        |  $bb += $yv * $yv;
        |}
        |${ev.value} = ($aa == 0L || $bb == 0L)
        |  ? 0.0 : $ab / java.lang.Math.sqrt((double) ($aa * $bb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftQ8Cos =
    copy(left = newLeft, right = newRight)
}

/** `graft_q8b(array<double>)` → `binary`: [[GraftQ8]]'s quantization
  * PACKED to one signed byte per component — the AT-REST form of the
  * quantized vector. `array<int>` spends 4 B per component in parquet
  * before compression (and ~3× less than the doubles after it, measured);
  * a byte per component is the full 8× cut the quantization promises, and
  * the dense byte run is what an object store actually ships. Values are
  * identical to [[GraftQ8]]'s ints (same rounding, [-127, 127] fits the
  * signed byte exactly), so [[GraftQ8BCos]] over packed bytes equals
  * [[GraftQ8Cos]] over the int arrays bit-for-bit — one quantization
  * contract, two physical encodings.
  */
case class GraftQ8Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_q8b requires array<double>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_q8b"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        val t = arr.getDouble(i) * 127.0 / maxAbs
        out(i) = (if (t >= 0) Math.round(t).toInt
                  else (-Math.round(-t)).toInt).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val a = ctx.freshName("a")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $c.numElements();
        |double $maxAbs = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $a = java.lang.Math.abs($c.getDouble($i));
        |  if ($a > $maxAbs) $maxAbs = $a;
        |}
        |byte[] $out = new byte[$n];
        |if ($maxAbs > 0.0) {
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $t = $c.getDouble($i) * 127.0 / $maxAbs;
        |    $out[$i] = (byte) ($t >= 0 ? (int) java.lang.Math.round($t)
        |                               : (int) -java.lang.Math.round(-$t));
        |  }
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GraftQ8Bytes =
    copy(child = newChild)
}

/** `graft_q4b(array<double>)` → `binary`: int4 scalar quantization,
  * NIBBLE-packed — the 16× rung of the at-rest vector-bytes ladder
  * (raw 8 B/dim → q8 1 B/dim → q4 0.5 B/dim → PQ m/d B/dim). Each
  * component maps to round(x·7/max|x|) ∈ [-7, 7] (same
  * half-away-from-zero rounding as [[GraftQ8]], so a SQL oracle
  * quantizes to identical codes); byte i packs component 2i in the
  * HIGH nibble and 2i+1 in the LOW nibble, each as its 4-bit
  * two's-complement pattern. An odd dimension pads the final low
  * nibble with code 0 — a zero code contributes nothing to the dot
  * product or either norm, so the pad is arithmetically invisible to
  * [[GraftQ4BytesCos]] (spec-pinned).
  *
  * The [-7, 7] range (not [-8, 7]) keeps the quantization symmetric:
  * x and −x always map to opposite codes, the property that makes the
  * scale factors cancel in the normalized cosine estimate.
  */
case class GraftQ4Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_q4b requires array<double>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_q4b"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Byte]((n + 1) / 2)
    if (maxAbs > 0.0) {
      i = 0
      while (i < n) {
        val t = arr.getDouble(i) * 7.0 / maxAbs
        val c = if (t >= 0) Math.round(t).toInt else (-Math.round(-t)).toInt
        val b = out(i / 2).toInt
        out(i / 2) =
          (if ((i & 1) == 0) (b | ((c & 0xF) << 4)) else (b | (c & 0xF))).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val a = ctx.freshName("a")
      val t = ctx.freshName("t")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $c.numElements();
        |double $maxAbs = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $a = java.lang.Math.abs($c.getDouble($i));
        |  if ($a > $maxAbs) $maxAbs = $a;
        |}
        |byte[] $out = new byte[($n + 1) / 2];
        |if ($maxAbs > 0.0) {
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $t = $c.getDouble($i) * 7.0 / $maxAbs;
        |    final int $q = $t >= 0 ? (int) java.lang.Math.round($t)
        |                           : (int) -java.lang.Math.round(-$t);
        |    $out[$i / 2] = (byte) (($i & 1) == 0
        |      ? ($out[$i / 2] | (($q & 0xF) << 4))
        |      : ($out[$i / 2] | ($q & 0xF)));
        |  }
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GraftQ4Bytes =
    copy(child = newChild)
}

/** `graft_q4b_cos(binary, binary)` → `double`: cosine estimate over
  * [[GraftQ4Bytes]] nibble packs — sign-extend each nibble
  * (two's-complement, `(b << 28) >> 28` on the int-widened pattern),
  * then the same exact-integer dot/norm arithmetic as [[GraftQ8Cos]]
  * with one final division. Zero-norm input yields 0.0; byte-length
  * mismatch is an error (same-dimension vectors always pack to equal
  * byte counts, and the pad nibble is code 0 on both sides).
  */
case class GraftQ4BytesCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_q4b_cos requires (binary, binary), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_q4b_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft_q4b_cos: packed lengths differ (${x.length} vs ${y.length})")
    var ab = 0L
    var aa = 0L
    var bb = 0L
    var i = 0
    while (i < x.length) {
      val xh = (x(i).toInt << 24) >> 28
      val xl = (x(i).toInt << 28) >> 28
      val yh = (y(i).toInt << 24) >> 28
      val yl = (y(i).toInt << 28) >> 28
      ab += xh.toLong * yh + xl.toLong * yl
      aa += xh.toLong * xh + xl.toLong * xl
      bb += yh.toLong * yh + yl.toLong * yl
      i += 1
    }
    if (aa == 0L || bb == 0L) 0.0
    else ab / math.sqrt((aa * bb).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xh = ctx.freshName("xh")
      val xl = ctx.freshName("xl")
      val yh = ctx.freshName("yh")
      val yl = ctx.freshName("yl")
      s"""
        |if ($a.length != $b.length) {
        |  throw new IllegalArgumentException(
        |    "graft_q4b_cos: packed lengths differ (" + $a.length + " vs " +
        |    $b.length + ")");
        |}
        |long $ab = 0L, $aa = 0L, $bb = 0L;
        |for (int $i = 0; $i < $a.length; $i++) {
        |  final long $xh = (((int) $a[$i]) << 24) >> 28;
        |  final long $xl = (((int) $a[$i]) << 28) >> 28;
        |  final long $yh = (((int) $b[$i]) << 24) >> 28;
        |  final long $yl = (((int) $b[$i]) << 28) >> 28;
        |  $ab += $xh * $yh + $xl * $yl;
        |  $aa += $xh * $xh + $xl * $xl;
        |  $bb += $yh * $yh + $yl * $yl;
        |}
        |${ev.value} = ($aa == 0L || $bb == 0L)
        |  ? 0.0 : $ab / java.lang.Math.sqrt((double) ($aa * $bb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftQ4BytesCos =
    copy(left = newLeft, right = newRight)
}

/** `graft_q8b_cos(binary, binary)` → `double`: [[GraftQ8Cos]] over the
  * byte-packed encoding — identical integer arithmetic (bytes widen to
  * long exactly), identical zero-norm and length-mismatch contracts, so
  * scores equal the int-array kernel bit-for-bit.
  */
case class GraftQ8BytesCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_q8b_cos requires (binary, binary), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_q8b_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft_q8b_cos: vector lengths differ (${x.length} vs ${y.length})")
    var ab = 0L
    var aa = 0L
    var bb = 0L
    var i = 0
    while (i < x.length) {
      val xv = x(i).toLong
      val yv = y(i).toLong
      ab += xv * yv
      aa += xv * xv
      bb += yv * yv
      i += 1
    }
    if (aa == 0L || bb == 0L) 0.0
    else ab / math.sqrt((aa * bb).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |if ($a.length != $b.length) {
        |  throw new IllegalArgumentException(
        |    "graft_q8b_cos: vector lengths differ (" + $a.length + " vs " +
        |    $b.length + ")");
        |}
        |long $ab = 0L, $aa = 0L, $bb = 0L;
        |for (int $i = 0; $i < $a.length; $i++) {
        |  final long $xv = (long) $a[$i];
        |  final long $yv = (long) $b[$i];
        |  $ab += $xv * $yv;
        |  $aa += $xv * $xv;
        |  $bb += $yv * $yv;
        |}
        |${ev.value} = ($aa == 0L || $bb == 0L)
        |  ? 0.0 : $ab / java.lang.Math.sqrt((double) ($aa * $bb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftQ8BytesCos =
    copy(left = newLeft, right = newRight)
}

/** `graft_b1b(array<double>)` → `binary`: ONE-BIT (sign) quantization —
  * the 64× rung at the bottom of the at-rest vector-bytes ladder
  * (raw 8 B/dim → q8 1 B/dim → q4 0.5 B/dim → b1 1 bit/dim). Component
  * j sets bit (j & 7) of byte j/8 (LSB-first) iff x > 0 — the SAME sign
  * convention as the SRP signature kernel (`graft_srp_sig` scores a
  * hyperplane dot `> 0`), so a SQL oracle reproduces the codes with a
  * CASE on the raw component. A trailing partial byte pads with 0 bits;
  * both sides of any same-dimension comparison pad identically, so the
  * pad shifts [[GraftB1Cos]]'s estimate uniformly and never reorders a
  * ranking (exact at any dim ≡ 0 (mod 8), e.g. the 64-dim corpus).
  *
  * Why the rung exists at 100 TB: the b1 candidate scan reads 8 bytes
  * per 64-dim vector — a whole cell's codes fit in L2 — and scoring is
  * XOR + POPCNT, the cheapest possible wire/compute tier. Its price is
  * recall (1 bit keeps only the orthant); measure with `tierRecall`
  * before deploying, rerank survivors exactly like the other rungs.
  */
case class GraftB1Bytes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_b1b requires array<double>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_b1b"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (arr.getDouble(i) > 0.0)
        out(i / 8) = (out(i / 8) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
        |final int $n = $c.numElements();
        |byte[] $out = new byte[($n + 7) / 8];
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($c.getDouble($i) > 0.0) {
        |    $out[$i / 8] = (byte) ($out[$i / 8] | (1 << ($i & 7)));
        |  }
        |}
        |${ev.value} = $out;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GraftB1Bytes =
    copy(child = newChild)
}

/** `graft_b1_cos(binary, binary)` → `double`: the SRP cosine SURROGATE
  * over [[GraftB1Bytes]] sign packs — (bits − 2·hamming) / bits, i.e.
  * the {−1,+1} sign-vector dot product normalized by the padded bit
  * count. Integer XOR/POPCNT plus ONE division by a power of two, so
  * every value is an exact dyadic rational — bit-reproducible in any
  * engine (a DuckDB oracle computes the identical double from the raw
  * components: dot(sign(q), sign(v))/dim at dim ≡ 0 (mod 8)).
  *
  * This is a RANKING score, not a cosine: it is the monotone image of
  * Hamming distance (65 distinct values at dim 64), so ties are common
  * and every consumer breaks them by ascending id (the `graft_topk`
  * contract). Length mismatch is an error — same-dim vectors always
  * pack to equal byte counts.
  */
case class GraftB1Cos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_b1_cos requires (binary, binary), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_b1_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"graft_b1_cos: packed lengths differ (${x.length} vs ${y.length})")
    if (x.length == 0) return 0.0
    var ham = 0
    var i = 0
    while (i < x.length) {
      ham += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xFF)
      i += 1
    }
    val bits = 8 * x.length
    (bits - 2 * ham).toDouble / bits.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val ham = ctx.freshName("ham")
      val bits = ctx.freshName("bits")
      s"""
        |if ($a.length != $b.length) {
        |  throw new IllegalArgumentException(
        |    "graft_b1_cos: packed lengths differ (" + $a.length + " vs " +
        |    $b.length + ")");
        |}
        |int $ham = 0;
        |for (int $i = 0; $i < $a.length; $i++) {
        |  $ham += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
        |}
        |final int $bits = 8 * $a.length;
        |${ev.value} = $bits == 0
        |  ? 0.0 : (double) ($bits - 2 * $ham) / (double) $bits;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftB1Cos =
    copy(left = newLeft, right = newRight)
}
