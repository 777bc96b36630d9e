package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.analysis.Analyzer
import graft.search.{TsQuery, TsQueryCodec}

/** `ts_offsets(text, query, dict)` — the flat `[start, end)` character
  * pairs (1-based) of the query's term occurrences in `text`, the same
  * shape `ts_highlight` consumes (reference: server/connector/functions/
  * ts_offsets.cpp; sdb/pg/index/offsets.test, ts_offsets_isolation.test —
  * the reference's 1-arg spelling resolves query+dictionary through the
  * index; this engine's spelling carries both explicitly).
  *
  * The ANALYZER is resolved at analysis time on the driver (the builder in
  * GraftExtensions) and captured into the expression — inside a
  * REPEATABLE READ block the resolution pins in the txn ctx, so a
  * concurrent `DROP TEXT SEARCH DICTIONARY` does not break the reader's
  * later statements (pg catalog-snapshot semantics,
  * ts_offsets_isolation.test). Phrase adjacency is not re-checked here:
  * offsets are emitted per matching TERM occurrence, the corpus' observable.
  */
case class TsOffsetsExpr(left: Expression, right: Expression,
    analyzer: Analyzer, dictName: String)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "ts_offsets"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    val q = right.eval(input)
    if (t == null || q == null) return null
    val terms = TsOffsetsExpr.termsOf(TsQueryCodec.decode(q.toString, analyzer))
    if (terms.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    graft.analysis.Analyzers.tokenOffsets(t.toString).foreach {
      case (tok, s, e) =>
        val norm = analyzer(tok)
        if (norm.exists(terms.contains)) { out += (s: Integer); out += (e: Integer) }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object TsOffsetsExpr {
  /** Positive term strings of a decoded query (ranges/regexps carry no
    * enumerable terms; NOT branches are excluded — a non-match has no
    * offset). */
  def termsOf(q: TsQuery): Set[String] = q match {
    case TsQuery.Term(t) => Set(t)
    case TsQuery.Prefix(_) | TsQuery.Wildcard(_) | TsQuery.Regexp(_) |
        TsQuery.TermRange(_, _, _, _) | TsQuery.Fuzzy(_, _, _, _) |
        TsQuery.NgramSim(_, _, _) => Set.empty
    case TsQuery.Phrase(ts) => ts.toSet
    case TsQuery.PhraseGap(ts, _) => ts.toSet
    case TsQuery.SlopPhrase(ts, _) => ts.toSet
    case TsQuery.And(qs) => qs.flatMap(termsOf).toSet
    case TsQuery.Or(qs) => qs.flatMap(termsOf).toSet
    case TsQuery.Not(_) => Set.empty
    case TsQuery.Boost(inner, _) => termsOf(inner)
    case _ => Set.empty
  }
}
