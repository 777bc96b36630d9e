package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector kernels — single fused loop per row, no
  * intermediate array (the zip_with/aggregate composition allocates one),
  * mirroring how the reference's C++ kernels iterate once
  * (/root/reference/server/connector/functions/vector.cpp:114-150).
  * Registered into the session FunctionRegistry by GraftExtensions, so SQL
  * text and `call_function` both reach them.
  */
abstract class FusedFloatArrayFold extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Java statements: given float x, float y and `double s`, update s. */
  protected def foldJava(x: String, y: String, s: String): String
  protected def foldScala(x: Float, y: Float, s: Double): Double

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s = foldScala(x.getFloat(i), y.getFloat(i), s); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float x = $a.getFloat($i);
         |  float y = $b.getFloat($i);
         |  ${foldJava("x", "y", s)}
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ (x-y)² — fused squared L2. */
case class L2SqrDistanceExpr(left: Expression, right: Expression)
    extends FusedFloatArrayFold {
  protected def foldJava(x: String, y: String, s: String): String =
    s"double d = (double)$x - (double)$y; $s += d * d;"
  protected def foldScala(x: Float, y: Float, s: Double): Double = {
    val d = x.toDouble - y.toDouble; s + d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ x·y — fused inner product. */
case class InnerProductExpr(left: Expression, right: Expression)
    extends FusedFloatArrayFold {
  protected def foldJava(x: String, y: String, s: String): String =
    s"$s += (double)$x * (double)$y;"
  protected def foldScala(x: Float, y: Float, s: Double): Double =
    s + x.toDouble * y.toDouble
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NativeVectorExpressions {
  /** (name, info, builder) triples for SparkSessionExtensions.injectFunction. */
  def functions: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (org.apache.spark.sql.catalyst.FunctionIdentifier("l2sqr_native"),
      new ExpressionInfo(classOf[L2SqrDistanceExpr].getName, "l2sqr_native"),
      (args: Seq[Expression]) => L2SqrDistanceExpr(args(0), args(1))),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("inner_product_native"),
      new ExpressionInfo(classOf[InnerProductExpr].getName, "inner_product_native"),
      (args: Seq[Expression]) => InnerProductExpr(args(0), args(1))))
}
