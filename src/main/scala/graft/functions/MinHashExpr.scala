package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** minhash_sig(shingles ARRAY<STRING>, numHashes INT) → ARRAY<LONG> — the
  * MinHash signature kernel as a native expression (r16 VERDICT item 8:
  * the signature pass is the biggest dedup stage at corpus scale and the
  * Scala UDF broke whole-stage codegen there). Delegates to ONE static
  * call on [[graft.analysis.Analyzers.minHashSignature]]'s arithmetic via
  * [[MinHashExpr.sig]], so eval and codegen share the exact kernel the
  * spec-cross-check UDF uses — values are bit-identical by construction.
  * Empty input → empty signature (the UDF contract). */
case class MinHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right) match {
    case (ArrayType(StringType, _), Literal(_, IntegerType)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING> shingles, INT literal numHashes)")
  }

  protected override def nullSafeEval(toks: Any, n: Any): Any =
    MinHashExpr.sig(toks.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.MinHashExpr.sig($t, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MinHashExpr {
  /** Static kernel shared by eval and generated code. */
  def sig(toks: ArrayData, numHashes: Int): ArrayData = {
    val n = toks.numElements()
    val strs = new Array[String](n)
    var i = 0
    while (i < n) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(
      graft.analysis.Analyzers.minHashSignature(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(strs), numHashes))
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashExpr(args(0), args(1))))
}
