package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo, Expression, Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

/** Session extension installing the search-claim optimizer rule — the Spark
  * analogue of the reference registering its optimizer extensions with
  * DuckDB (/root/reference/server/connector/duckdb_storage_extension.cpp:
  * 126-134). Enabled via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (GraftSession sets it on every session it configures). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(s => ClaimTsMatch(s))
}

/** Claims `ts_match(text, 'websearch query', 'dict')` predicates over the
  * documents table OUT of row-evaluated filters and INTO an index-backed
  * left-semi join — the direct analogue of the reference's
  * `IResearchPushdownComplexFilter` walk
  * (/root/reference/server/connector/optimizer/iresearch_plan.cpp:1068:
  * claim `@@`/ts_* stubs from filters into the iresearch_scan filter tree;
  * filter build search_filter_builder.cpp:505-531).
  *
  * Claim conditions: the filter's child scans `<dir>/documents.parquet` and
  * exposes `doc_id`, the first UDF argument is the scanned `text` column,
  * and query/dict are literals (the reference likewise folds TSQUERY
  * constants before claiming, ts_query.cpp:341). Non-claimable conjuncts
  * stay behind as residual filters (ts_dict_residual_filter*.test) — and a
  * claim failure leaves the row-eval UDF in place, so the rewrite can only
  * change HOW the query runs, never its result.
  */
case class ClaimTsMatch(spark: SparkSession) extends Rule[LogicalPlan] {

  private def asTsMatch(e: Expression): Option[(AttributeReference, String, String)] =
    e match {
      case u: ScalaUDF if u.udfName.contains("ts_match") =>
        u.children match {
          case Seq(a: AttributeReference, Literal(q: UTF8String, _), Literal(d: UTF8String, _)) =>
            Some((a, q.toString, d.toString))
          case _ => None
        }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The sf directory when `plan` scans the standard documents table. */
  private def documentsDir(plan: LogicalPlan): Option[String] =
    plan.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.toString)
            .filter(_.endsWith("/documents.parquet"))
            .map(_.stripSuffix("/documents.parquet").stripPrefix("file:"))
        case _ => None
      }
    }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if cond.exists(asTsMatch(_).isDefined) =>
      try claim(f, cond, child) catch {
        // a failed claim must never break the query — the row-eval UDF
        // is still in the plan and remains correct
        case e: Exception =>
          logWarning(s"ts_match claim failed, keeping row-eval filter: $e")
          f
      }
  }

  private def claim(f: Filter, cond: Expression, child: LogicalPlan): LogicalPlan = {
    val docId = child.output.find(_.name == "doc_id")
    val dir = documentsDir(child)
    val parts = conjuncts(cond)
    val claimable = parts.flatMap { p =>
      asTsMatch(p).collect {
        case (attr, q, dict) if attr.name == "text" && docId.isDefined && dir.isDefined =>
          (p, q, dict)
      }
    }
    if (claimable.isEmpty) return f

    val joined = claimable.foldLeft(child) { case (acc, (_, q, dict)) =>
      val idx = graft.index.IndexStore.documents(spark, dir.get, dict)
      val parsed = graft.search.TsQueryParser.websearch(
        q, graft.analysis.AnalyzerRegistry.get(dict))
      val matched = graft.search.TsQueryExec.matching(idx, parsed)
      // optimizedPlan, NOT analyzed: the injected subtree skips the earlier
      // optimizer batches, so e.g. a Deduplicate (from .distinct()) would
      // otherwise reach physical planning unreplaced and fail the query
      val mPlan = matched.queryExecution.optimizedPlan
      val rightId = mPlan.output.find(_.name == "doc_id").get
      Join(acc, mPlan, LeftSemi, Some(EqualTo(docId.get, rightId)), JoinHint.NONE)
    }
    val claimedSet = claimable.map(_._1).toSet
    parts.filterNot(claimedSet).reduceOption(CAnd(_, _))
      .map(Filter(_, joined)).getOrElse(joined)
  }
}
