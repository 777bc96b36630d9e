package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd kernels for the quantized-IVF storage (graft.index.Quantization)
  * — the Spark analogue of the reference's faiss SQ8/PQ scoring paths
  * (tests/sqllogic/sdb/pg/index/inverted_index_ivf_sq8.test, ivf_pq.test:
  * "scores them via the quantized QVectorIterator path").
  *
  * The ADC (asymmetric distance computation) kernels are the per-row hot
  * path of a quantized kNN probe, so like the other native vector kernels
  * they are single fused loops with `doGenCode` — no intermediate arrays,
  * whole-stage-codegen friendly. The encode kernels run once at index build.
  */

/** sq8_encode(emb, mins, scales) → BINARY: one byte per dimension,
  * code = clamp(round((x − min) / scale), 0, 255); scale 0 (constant dim)
  * encodes 0. */
case class Sq8EncodeExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  // fourth is an ignored 0 literal: QuaternaryExpression gives us the
  // null-safe plumbing; a TernaryExpression variant exists but the ADC
  // kernels are quaternary anyway, so one arity keeps the file uniform.
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (fa(first.dataType) && fa(second.dataType) && fa(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT> emb, ARRAY<FLOAT> mins, ARRAY<FLOAT> scales)")
  }

  protected override def nullSafeEval(e: Any, mn: Any, sc: Any, z: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val mins = mn.asInstanceOf[ArrayData]
    val scales = sc.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = scales.getFloat(i)
      val c =
        if (s <= 0f) 0
        else {
          val v = math.round((emb.getFloat(i) - mins.getFloat(i)) / s)
          math.max(0, math.min(255, v))
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, mn, sc, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $e.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  float $s = $sc.getFloat($i);
         |  int $v = 0;
         |  if ($s > 0f) {
         |    $v = java.lang.Math.round(($e.getFloat($i) - $mn.getFloat($i)) / $s);
         |    $v = java.lang.Math.max(0, java.lang.Math.min(255, $v));
         |  }
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Shared shape of the two SQ8 ADC kernels:
  * (codes BINARY, query ARRAY<FLOAT>, mins ARRAY<FLOAT>, scales ARRAY<FLOAT>)
  * → DOUBLE, one fused loop decoding byte i to `min[i] + code[i]·scale[i]`. */
abstract class Sq8AdcBase extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (first.dataType == BinaryType && fa(second.dataType) &&
        fa(third.dataType) && fa(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY codes, ARRAY<FLOAT> query, ARRAY<FLOAT> mins, ARRAY<FLOAT> scales)")
  }

  /** Java statements: given double x (decoded), float q and `double s`, update s. */
  protected def foldJava(x: String, q: String, s: String): String
  protected def foldScala(x: Double, q: Float, s: Double): Double
  protected def finish(s: Double): Double = s
  protected def finishJava(s: String): String = ""

  protected override def nullSafeEval(c: Any, qv: Any, mn: Any, sc: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val query = qv.asInstanceOf[ArrayData]
    val mins = mn.asInstanceOf[ArrayData]
    val scales = sc.asInstanceOf[ArrayData]
    val n = math.min(codes.length, query.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = mins.getFloat(i) + (codes(i) & 0xff) * scales.getFloat(i).toDouble
      s = foldScala(x, query.getFloat(i), s)
      i += 1
    }
    finish(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, qv, mn, sc) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($c.length, $qv.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $mn.getFloat($i) + (($c[$i] & 0xff)) * (double) $sc.getFloat($i);
         |  float q = $qv.getFloat($i);
         |  ${foldJava("x", "q", s)}
         |}
         |${finishJava(s)}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** sq8_adc_l2(codes, query, mins, scales) → Σ (decode(code) − q)². */
case class Sq8AdcL2Expr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends Sq8AdcBase {
  override def prettyName: String = "sq8_adc_l2"
  protected def foldJava(x: String, q: String, s: String): String =
    s"double d = $x - (double)$q; $s += d * d;"
  protected def foldScala(x: Double, q: Float, s: Double): Double = {
    val d = x - q; s + d * d
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** sq8_adc_neg_ip(codes, query, mins, scales) → −Σ decode(code)·q
  * (negated so ASC order = best-first, the ann_ip score mapping). */
case class Sq8AdcIpExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends Sq8AdcBase {
  override def prettyName: String = "sq8_adc_neg_ip"
  protected def foldJava(x: String, q: String, s: String): String =
    s"$s += $x * (double)$q;"
  protected def foldScala(x: Double, q: Float, s: Double): Double = s + x * q
  override protected def finish(s: Double): Double = -s
  override protected def finishJava(s: String): String = s"$s = -$s;"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** pq_adc(codes BINARY, lut ARRAY<FLOAT>) → Σ_sub lut[sub·ksub + code[sub]]
  * — the PQ table-lookup distance; the per-list LUT is broadcast-joined as a
  * column (ksub inferred from |lut| / |codes|). */
case class PqAdcExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType &&
        (right.dataType match { case ArrayType(FloatType, _) => true; case _ => false }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY codes, ARRAY<FLOAT> lut)")

  protected override def nullSafeEval(c: Any, l: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val lut = l.asInstanceOf[ArrayData]
    val m = codes.length
    if (m == 0) return 0.0
    val ksub = lut.numElements() / m
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += lut.getFloat(sub * ksub + (codes(sub) & 0xff))
      sub += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      s"""
         |int $m = $c.length;
         |double $s = 0.0;
         |if ($m > 0) {
         |  int $ksub = $l.numElements() / $m;
         |  for (int $sub = 0; $sub < $m; $sub++) {
         |    $s += $l.getFloat($sub * $ksub + ($c[$sub] & 0xff));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** sq4_encode(emb, mins, scales) → BINARY: 4-bit codes packed two per byte
  * (faiss QT_4bit layout, code_size = ceil(d/2); the reference's
  * `quant = 'sq4'` — inverted_index_ivf_sq4.test). Even dim i sits in the
  * LOW nibble of byte i/2, odd in the HIGH nibble. scale 0 encodes 0. */
case class Sq4EncodeExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq4_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (fa(first.dataType) && fa(second.dataType) && fa(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT> emb, ARRAY<FLOAT> mins, ARRAY<FLOAT> scales)")
  }

  protected override def nullSafeEval(e: Any, mn: Any, sc: Any, z: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val mins = mn.asInstanceOf[ArrayData]
    val scales = sc.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val out = new Array[Byte]((n + 1) / 2)
    var i = 0
    while (i < n) {
      val s = scales.getFloat(i)
      val c =
        if (s <= 0f) 0
        else math.max(0, math.min(15,
          math.round((emb.getFloat(i) - mins.getFloat(i)) / s)))
      if ((i & 1) == 0) out(i / 2) = (c & 0xf).toByte
      else out(i / 2) = (out(i / 2) | ((c & 0xf) << 4)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, mn, sc, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $e.numElements();
         |byte[] $out = new byte[($n + 1) / 2];
         |for (int $i = 0; $i < $n; $i++) {
         |  float $s = $sc.getFloat($i);
         |  int $v = 0;
         |  if ($s > 0f) {
         |    $v = java.lang.Math.round(($e.getFloat($i) - $mn.getFloat($i)) / $s);
         |    $v = java.lang.Math.max(0, java.lang.Math.min(15, $v));
         |  }
         |  if (($i & 1) == 0) $out[$i / 2] = (byte) ($v & 0xf);
         |  else $out[$i / 2] = (byte) ($out[$i / 2] | (($v & 0xf) << 4));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Shared shape of the two SQ4 ADC kernels — like [[Sq8AdcBase]] but the
  * decode unpacks a nibble: x = min[i] + ((code[i/2] >> 4·(i&1)) & 0xf) ·
  * scale[i]. The loop runs over the QUERY's dimensions. */
abstract class Sq4AdcBase extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (first.dataType == BinaryType && fa(second.dataType) &&
        fa(third.dataType) && fa(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY codes, ARRAY<FLOAT> query, ARRAY<FLOAT> mins, ARRAY<FLOAT> scales)")
  }

  protected def foldJava(x: String, q: String, s: String): String
  protected def foldScala(x: Double, q: Float, s: Double): Double
  protected def finish(s: Double): Double = s
  protected def finishJava(s: String): String = ""

  protected override def nullSafeEval(c: Any, qv: Any, mn: Any, sc: Any): Any = {
    val codes = c.asInstanceOf[Array[Byte]]
    val query = qv.asInstanceOf[ArrayData]
    val mins = mn.asInstanceOf[ArrayData]
    val scales = sc.asInstanceOf[ArrayData]
    val n = math.min(codes.length * 2, query.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val code = (codes(i / 2) >> (4 * (i & 1))) & 0xf
      val x = mins.getFloat(i) + code * scales.getFloat(i).toDouble
      s = foldScala(x, query.getFloat(i), s)
      i += 1
    }
    finish(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, qv, mn, sc) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($c.length * 2, $qv.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int code = ($c[$i / 2] >> (4 * ($i & 1))) & 0xf;
         |  double x = $mn.getFloat($i) + code * (double) $sc.getFloat($i);
         |  float q = $qv.getFloat($i);
         |  ${foldJava("x", "q", s)}
         |}
         |${finishJava(s)}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** sq4_adc_l2(codes, query, mins, scales) → Σ (decode(code) − q)². */
case class Sq4AdcL2Expr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends Sq4AdcBase {
  override def prettyName: String = "sq4_adc_l2"
  protected def foldJava(x: String, q: String, s: String): String =
    s"double d = $x - (double)$q; $s += d * d;"
  protected def foldScala(x: Double, q: Float, s: Double): Double = {
    val d = x - q; s + d * d
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** sq4_adc_neg_ip(codes, query, mins, scales) → −Σ decode(code)·q. */
case class Sq4AdcIpExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends Sq4AdcBase {
  override def prettyName: String = "sq4_adc_neg_ip"
  protected def foldJava(x: String, q: String, s: String): String =
    s"$s += $x * (double)$q;"
  protected def foldScala(x: Double, q: Float, s: Double): Double = s + x * q
  override protected def finish(s: Double): Double = -s
  override protected def finishJava(s: String): String = s"$s = -$s;"
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** rabitq_bits(emb, cvec) → BINARY: one SIGN BIT per dimension of the
  * centroid residual (emb − cvec), packed 8 per byte LSB-first — the 1-bit
  * RaBitQ code (reference `quant = 'rabitq'`,
  * inverted_index_ivf_rabitq.test; faiss RaBitQ sign-bit factors). The
  * companion per-vector scalar (the residual norm) rides as a separate
  * float column — "sign-bit + norm scalars". */
case class RabitqBitsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "rabitq_bits"

  override def checkInputDataTypes(): TypeCheckResult = {
    def num(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true; case _ => false }
    if (num(left.dataType) && num(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT|DOUBLE> emb, ARRAY<FLOAT|DOUBLE> cvec)")
  }

  private def isD(e: Expression) = e.dataType match {
    case ArrayType(DoubleType, _) => true; case _ => false }

  protected override def nullSafeEval(e: Any, c: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val cv = c.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val x = (if (isD(left)) emb.getDouble(i) else emb.getFloat(i).toDouble) -
        (if (isD(right)) cv.getDouble(i) else cv.getFloat(i).toDouble)
      if (x >= 0) out(i / 8) = (out(i / 8) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, c) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val ge = if (isD(left)) s"$e.getDouble($i)" else s"(double) $e.getFloat($i)"
      val gc = if (isD(right)) s"$c.getDouble($i)" else s"(double) $c.getFloat($i)"
      s"""
         |int $n = $e.numElements();
         |byte[] $out = new byte[($n + 7) / 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ge - $gc >= 0.0) $out[$i / 8] = (byte) ($out[$i / 8] | (1 << ($i & 7)));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** rabitq_adc_l2(bits, rnorm, qr, _unused) → estimated ‖q − x‖² where
  * x ≈ c + (rnorm/√d)·sign(r): ‖qr‖² + rnorm² − 2·(rnorm/√d)·Σ ±qr[i]
  * (qr = query − centroid, broadcast per probed cluster like the PQ LUT).
  * The 1-bit decode direction sign(r)/√d is unit-norm, so the estimator
  * preserves the residual's magnitude exactly and its direction to the
  * sign-orthant — the probe is approximate, the rerank exact. */
case class RabitqAdcL2Expr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rabitq_adc_l2"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (first.dataType == BinaryType &&
        (second.dataType == FloatType || second.dataType == DoubleType) &&
        fa(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY bits, FLOAT rnorm, ARRAY<FLOAT> qr, _)")
  }

  protected override def nullSafeEval(b: Any, rn: Any, q: Any, z: Any): Any = {
    val bits = b.asInstanceOf[Array[Byte]]
    val rnorm = rn match { case f: java.lang.Float => f.toDouble; case d: java.lang.Double => d.doubleValue }
    val qr = q.asInstanceOf[ArrayData]
    val d = qr.numElements()
    var qn2 = 0.0
    var s = 0.0
    var i = 0
    while (i < d) {
      val qi = qr.getFloat(i).toDouble
      qn2 += qi * qi
      val sign = if (i / 8 < bits.length && ((bits(i / 8) >> (i & 7)) & 1) == 1) 1.0 else -1.0
      s += sign * qi
      i += 1
    }
    val scale = if (d > 0) rnorm / math.sqrt(d.toDouble) else 0.0
    qn2 + rnorm * rnorm - 2.0 * scale * s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, rn, q, _) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val qn2 = ctx.freshName("qn2")
      val s = ctx.freshName("s")
      val scale = ctx.freshName("scale")
      s"""
         |int $d = $q.numElements();
         |double $qn2 = 0.0, $s = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double qi = (double) $q.getFloat($i);
         |  $qn2 += qi * qi;
         |  double sg = ($i / 8 < $b.length && ((($b[$i / 8]) >> ($i & 7)) & 1) == 1) ? 1.0 : -1.0;
         |  $s += sg * qi;
         |}
         |double $scale = $d > 0 ? ((double) $rn) / java.lang.Math.sqrt((double) $d) : 0.0;
         |${ev.value} = $qn2 + ((double) $rn) * ((double) $rn) - 2.0 * $scale * $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** rabitq_adc_neg_ip(bits, rnorm, query, qdotc) → −(qdotc + (rnorm/√d)·
  * Σ ±query[i]) — estimated inner product with x ≈ c + (rnorm/√d)·sign(r),
  * negated so ASC = best-first. qdotc = <query, centroid> is a per-cluster
  * scalar computed on the driver. */
case class RabitqAdcIpExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "rabitq_adc_neg_ip"

  override def checkInputDataTypes(): TypeCheckResult = {
    def fa(t: DataType) = t match { case ArrayType(FloatType, _) => true; case _ => false }
    if (first.dataType == BinaryType &&
        (second.dataType == FloatType || second.dataType == DoubleType) &&
        fa(third.dataType) && fourth.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY bits, FLOAT rnorm, ARRAY<FLOAT> query, DOUBLE qdotc)")
  }

  protected override def nullSafeEval(b: Any, rn: Any, q: Any, qc: Any): Any = {
    val bits = b.asInstanceOf[Array[Byte]]
    val rnorm = rn match { case f: java.lang.Float => f.toDouble; case d: java.lang.Double => d.doubleValue }
    val query = q.asInstanceOf[ArrayData]
    val qdotc = qc.asInstanceOf[Double]
    val d = query.numElements()
    var s = 0.0
    var i = 0
    while (i < d) {
      val sign = if (i / 8 < bits.length && ((bits(i / 8) >> (i & 7)) & 1) == 1) 1.0 else -1.0
      s += sign * query.getFloat(i)
      i += 1
    }
    val scale = if (d > 0) rnorm / math.sqrt(d.toDouble) else 0.0
    -(qdotc + scale * s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, rn, q, qc) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val scale = ctx.freshName("scale")
      s"""
         |int $d = $q.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $d; $i++) {
         |  double sg = ($i / 8 < $b.length && ((($b[$i / 8]) >> ($i & 7)) & 1) == 1) ? 1.0 : -1.0;
         |  $s += sg * (double) $q.getFloat($i);
         |}
         |double $scale = $d > 0 ? ((double) $rn) / java.lang.Math.sqrt((double) $d) : 0.0;
         |${ev.value} = -($qc + $scale * $s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** byte_pack(ARRAY<INT|BIGINT>) → BINARY, one byte per element (values must
  * fit 0..255; used to pack PQ sub-codes at build time — CodegenFallback-free
  * but cold path, eval parity is what matters). */
case class BytePackExpr(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<INT>/ARRAY<BIGINT>, got ${other.simpleString}")
  }

  private def isLong = child.dataType match {
    case ArrayType(LongType, _) => true; case _ => false
  }

  protected override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = if (isLong) arr.getLong(i) else arr.getInt(i).toLong
      out(i) = (v & 0xff).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get = if (isLong) s"$a.getLong($i)" else s"(long) $a.getInt($i)"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) ($get & 0xffL);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object QuantizationExpressions {
  /** Registered by GraftExtensions next to the other native kernels. */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("sq8_encode"),
      new ExpressionInfo(classOf[Sq8EncodeExpr].getName, "sq8_encode"),
      (args: Seq[Expression]) => Sq8EncodeExpr(args(0), args(1), args(2),
        org.apache.spark.sql.catalyst.expressions.Literal(
          ArrayData.toArrayData(Array.empty[Float]), ArrayType(FloatType)))),
    (FunctionIdentifier("sq8_adc_l2"),
      new ExpressionInfo(classOf[Sq8AdcL2Expr].getName, "sq8_adc_l2"),
      (args: Seq[Expression]) => Sq8AdcL2Expr(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("sq8_adc_neg_ip"),
      new ExpressionInfo(classOf[Sq8AdcIpExpr].getName, "sq8_adc_neg_ip"),
      (args: Seq[Expression]) => Sq8AdcIpExpr(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "pq_adc"),
      (args: Seq[Expression]) => PqAdcExpr(args(0), args(1))),
    (FunctionIdentifier("byte_pack"),
      new ExpressionInfo(classOf[BytePackExpr].getName, "byte_pack"),
      (args: Seq[Expression]) => BytePackExpr(args(0))),
    (FunctionIdentifier("sq4_encode"),
      new ExpressionInfo(classOf[Sq4EncodeExpr].getName, "sq4_encode"),
      (args: Seq[Expression]) => Sq4EncodeExpr(args(0), args(1), args(2),
        org.apache.spark.sql.catalyst.expressions.Literal(
          ArrayData.toArrayData(Array.empty[Float]), ArrayType(FloatType)))),
    (FunctionIdentifier("sq4_adc_l2"),
      new ExpressionInfo(classOf[Sq4AdcL2Expr].getName, "sq4_adc_l2"),
      (args: Seq[Expression]) => Sq4AdcL2Expr(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("sq4_adc_neg_ip"),
      new ExpressionInfo(classOf[Sq4AdcIpExpr].getName, "sq4_adc_neg_ip"),
      (args: Seq[Expression]) => Sq4AdcIpExpr(args(0), args(1), args(2), args(3))),
    (FunctionIdentifier("rabitq_bits"),
      new ExpressionInfo(classOf[RabitqBitsExpr].getName, "rabitq_bits"),
      (args: Seq[Expression]) => RabitqBitsExpr(args(0), args(1))),
    (FunctionIdentifier("rabitq_adc_l2"),
      new ExpressionInfo(classOf[RabitqAdcL2Expr].getName, "rabitq_adc_l2"),
      (args: Seq[Expression]) => RabitqAdcL2Expr(args(0), args(1), args(2),
        org.apache.spark.sql.catalyst.expressions.Literal(0.0, DoubleType))),
    (FunctionIdentifier("rabitq_adc_neg_ip"),
      new ExpressionInfo(classOf[RabitqAdcIpExpr].getName, "rabitq_adc_neg_ip"),
      (args: Seq[Expression]) => RabitqAdcIpExpr(args(0), args(1), args(2), args(3))))
}
