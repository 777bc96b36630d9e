package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, CreateNamedStruct, EqualTo, Expression, ExpressionInfo, Literal}

import graft.catalog.UnionType

/** SQL surface of the tagged UNION type (simple/union.test; SURVEY §1.2
  * "UNION → struct-with-tag"):
  *   union_value('m', v)   — a partial tagged struct {__utag: 'm', m: v};
  *                           CatalogDdl coerces it onto the full member set
  *                           at INSERT (the `m := v` spelling rewrites to
  *                           this via PgDialect.rewriteUnionValueArgs);
  *   union_tag(u)          — the active member's name;
  *   union_extract(u, 'm') — the member value if active, else NULL.
  * extract/tag build on UnresolvedExtractValue so the analyzer resolves
  * the field access against whatever struct shape arrives. */
object UnionFunctions {

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) if s != null =>
      s.toString.toLowerCase(java.util.Locale.ROOT)
    case _ => throw new IllegalArgumentException(
      s"$fn: the member name must be a string literal")
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("union_value"),
      new ExpressionInfo("graft.functions.UnionFunctions", "union_value"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "union_value(member, value) takes exactly one named member")
        val m = strLit(args.head, "union_value")
        CreateNamedStruct(Seq(
          Literal(UnionType.Tag), Literal(m), Literal(m), args(1)))
      }),
    (FunctionIdentifier("union_tag"),
      new ExpressionInfo("graft.functions.UnionFunctions", "union_tag"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "union_tag(union)")
        UnresolvedExtractValue(args.head, Literal(UnionType.Tag))
      }),
    (FunctionIdentifier("union_extract"),
      new ExpressionInfo("graft.functions.UnionFunctions", "union_extract"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "union_extract(union, member)")
        val m = strLit(args(1), "union_extract")
        CaseWhen(Seq((
          EqualTo(UnresolvedExtractValue(args.head, Literal(UnionType.Tag)),
            Literal(m)),
          UnresolvedExtractValue(args.head, Literal(m)))), None)
      }))
}
