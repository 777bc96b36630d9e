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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(s => ClaimTsMatch(s))
    e.injectOptimizerRule(s => PushdownTsDictAggregate(s))
    e.injectOptimizerRule(s => ClaimAnnTopK(s))
    graft.functions.NativeVectorExpressions.functions.foreach(e.injectFunction)
    graft.functions.GeoWkb.functions.foreach(e.injectFunction)
  }
}

/** Shared plan-shape guards for the claim rules. A claim replaces a subtree
  * with an index read, so it is only sound when the replaced subtree is
  * EXACTLY the shape the index precomputes: a bare scan (modulo column
  * pruning). Any Filter/Join/Limit in between would be silently discarded by
  * the rewrite — the reference bails the same way when its pushdown walk
  * meets a node it cannot claim (iresearch_plan.cpp:1068 claim loop stops at
  * non-matching operators; ts_dict_plan.hpp only fires on the exact
  * aggregate-over-scan pattern). */
private[plans] object PlanShapes {
  import org.apache.spark.sql.catalyst.expressions.Attribute
  import org.apache.spark.sql.catalyst.plans.logical.Project

  /** Walks through column-pruning Projects only; returns the first
    * non-Project node. Anything row-reducing (Filter, Limit, Join, …) is
    * returned as-is and will fail the caller's pattern match — the
    * conservative bail. */
  @annotation.tailrec
  def stripProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(_, child) => stripProjects(child)
    case other => other
  }

  /** The scan directory iff `plan` is a Project-only chain over the standard
    * `<dir>/<tableFile>` parquet relation. */
  def bareRelation(plan: LogicalPlan, tableFile: String): Option[(LogicalRelation, String)] =
    stripProjects(plan) match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption.map(_.toString)
            .filter(_.endsWith(s"/$tableFile"))
            .map(p => (lr, p.stripSuffix(s"/$tableFile").stripPrefix("file:")))
        case _ => None
      }
      case _ => None
    }

  /** Provenance: `attr` must BE the relation's column named `name` — same
    * exprId, not merely the same name. A same-named attribute produced by an
    * alias or another relation in a join must never be claimed against this
    * relation's index. */
  def isColumnOf(lr: LogicalRelation, attr: Attribute, name: String): Boolean =
    attr.name == name && lr.output.exists(o => o.name == name && o.exprId == attr.exprId)
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
/** Rewrites token-facet aggregates onto the index term dictionary — the
  * analogue of the reference's `PushdownTsDictAggregates`
  * (/root/reference/server/connector/optimizer/ts_dict_plan.hpp:17-28,
  * 2,094 LoC impl; semantics ts_dict.test:42-55): a GROUP BY over
  * `explode(ts_tokenize_sql(text, 'dict'))` computing `count(*)` (= total
  * term frequency, ctf) and/or `count(DISTINCT doc_id)` (= document
  * frequency, df) never needs to tokenize anything — both aggregates are
  * precomputed per term in the index's term dictionary. Turns an
  * O(total tokens) explode+shuffle into a read of the (tiny) dictionary.
  *
  * Claimed shape: Aggregate(group=[token], aggs ⊆ {token, count(1),
  * count(distinct doc_id)}) over Generate(explode(ts_tokenize_sql(text,
  * literal dict))) over the documents scan. Anything else is left alone.
  */
case class PushdownTsDictAggregate(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Project}
  import org.apache.spark.sql.catalyst.expressions.Explode

  /** The claimable shapes, checked strictly. Aggregate.child must be a
    * Project-only chain down to Generate(explode(ts_tokenize_sql(text,
    * 'dict'))), whose child (modulo Projects) is either
    *
    *  - the bare documents scan → the UNFILTERED facet: both aggregates are
    *    precomputed in the term dictionary (df/ctf); or
    *  - a LeftSemi join of the bare documents scan against an arbitrary
    *    match subtree on the scan's own doc_id — the shape ClaimTsMatch
    *    leaves behind for a fully-claimed `WHERE ts_match(...)` — → the
    *    FILTERED facet: counts are re-aggregated from the POSTINGS of the
    *    matched docs (semi-join postings on doc id, group by term), the
    *    reference's ts_dict WHERE-claim (ts_dict_plan.hpp:17-28). Nothing
    *    tokenizes in either shape.
    *
    * Any other Filter / Join / Limit on either leg means the index totals
    * would not match the query's input rows — bail, keep the explode plan
    * (the facet then tokenizes only what the residual filter passes; still
    * correct). `text` and `doc_id` are provenance-checked by exprId against
    * the scan, never by name. */
  private def tokenizeGen(plan: LogicalPlan): Option[(Attribute, String, String,
      LogicalRelation, Option[(LogicalPlan, Attribute)])] =
    PlanShapes.stripProjects(plan) match {
      case g @ Generate(Explode(u: ScalaUDF), _, _, _, _, _)
          if u.udfName.contains("ts_tokenize_sql") =>
        (u.children, g.generatorOutput) match {
          case (Seq(a: AttributeReference, Literal(d: UTF8String, _)), Seq(tokenAttr)) =>
            PlanShapes.stripProjects(g.child) match {
              case _: LogicalRelation =>
                PlanShapes.bareRelation(g.child, "documents.parquet").collect {
                  case (lr, dir) if PlanShapes.isColumnOf(lr, a, "text") =>
                    (tokenAttr, d.toString, dir, lr, None)
                }
              case Join(l, r, LeftSemi, Some(EqualTo(lk: AttributeReference, rk: AttributeReference)), _) =>
                for {
                  (lr, dir) <- PlanShapes.bareRelation(l, "documents.parquet")
                  if PlanShapes.isColumnOf(lr, a, "text")
                  // the join key must be the scan's own doc_id, either side
                  (lkey, rkey) = if (lr.output.exists(_.exprId == lk.exprId)) (lk, rk) else (rk, lk)
                  if PlanShapes.isColumnOf(lr, lkey, "doc_id") && r.outputSet.contains(rkey)
                } yield (tokenAttr, d.toString, dir, lr, Some((r, rkey)))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Seq(groupAttr: Attribute), aggExprs, child, _) =>
      try {
        tokenizeGen(child) match {
          case Some((tokenAttr, dict, dir, lr, None)) if groupAttr.semanticEquals(tokenAttr) =>
            rewrite(agg, aggExprs, tokenAttr, dict, dir, lr).getOrElse(agg)
          case Some((tokenAttr, dict, dir, lr, Some((right, rightKey))))
              if groupAttr.semanticEquals(tokenAttr) =>
            rewriteFiltered(agg, aggExprs, tokenAttr, dict, dir, lr, right, rightKey)
              .getOrElse(agg)
          case _ => agg
        }
      } catch {
        case e: Exception =>
          logWarning(s"ts_dict pushdown failed, keeping explode plan: $e")
          agg
      }
  }

  /** Give every leaf relation in `plan` fresh output exprIds (and remap the
    * references above them) — the manual analogue of the analyzer's
    * DeduplicateRelations for a rule-constructed self-join. */
  private def freshRelationIds(plan: LogicalPlan): LogicalPlan = {
    val mapping = scala.collection.mutable.Map.empty[
      org.apache.spark.sql.catalyst.expressions.ExprId,
      org.apache.spark.sql.catalyst.expressions.Attribute]
    plan.transformUp {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        val fresh = m.newInstance()
        mapping ++= m.asInstanceOf[LogicalPlan].output.zip(fresh.output)
          .map { case (o, n) => o.exprId -> n }
        fresh
      case other => other.transformExpressions {
        case a: AttributeReference => mapping.getOrElse(a.exprId, a)
      }
    }
  }

  /** Filtered facet → postings-driven counts: LeftSemi(postings, matched) on
    * doc id, group by term; count(*) over the explode ≡ sum(tf), and
    * count(DISTINCT doc_id) ≡ count(*) (postings hold one row per
    * (term, doc)). */
  private def rewriteFiltered(agg: Aggregate, aggExprs: Seq[NamedExpression],
      tokenAttr: Attribute, dict: String, dir: String, lr: LogicalRelation,
      right: LogicalPlan, rightKey: Attribute): Option[LogicalPlan] = {
    import org.apache.spark.sql.functions.{col => f}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Sum}
    val idx = graft.index.IndexStore.documents(spark, dir, dict)
    val posts = idx.postings.select(f("term"), f("doc_id"), f("tf").cast("long").as("tf"))
    // the matched subtree (`right`) usually reads the SAME cached postings
    // relation — re-instance ours so the self-join has disjoint exprIds
    val pPlan = freshRelationIds(posts.queryExecution.optimizedPlan)
    val Seq(termA, docA, tfA) = pPlan.output
    val joined = Join(pPlan, right, LeftSemi, Some(EqualTo(docA, rightKey)), JoinHint.NONE)
    val mapped = aggExprs.map {
      case a: Attribute if a.semanticEquals(tokenAttr) =>
        Some(Alias(termA, a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, _, _), name) =>
        Some(Alias(AggregateExpression(Sum(tfA), Complete, isDistinct = false), name)(
          exprId = al.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(c: Attribute)), _, true, _, _), name)
          if PlanShapes.isColumnOf(lr, c, "doc_id") =>
        Some(Alias(AggregateExpression(Count(Literal(1)), Complete, isDistinct = false), name)(
          exprId = al.exprId))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None
    else {
      val out = agg.copy(groupingExpressions = Seq(termA),
        aggregateExpressions = mapped.flatten, child = joined)
      if (!out.resolved) {
        logWarning("filtered ts_dict rewrite produced an unresolved plan, bailing:\n" +
          out.treeString)
        None
      } else Some(out)
    }
  }

  private def rewrite(agg: Aggregate, aggExprs: Seq[NamedExpression],
      tokenAttr: Attribute, dict: String, dir: String,
      lr: LogicalRelation): Option[LogicalPlan] = {
    val idx = graft.index.IndexStore.documents(spark, dir, dict)
    val td = idx.termDict.select(
      org.apache.spark.sql.functions.col("term"),
      org.apache.spark.sql.functions.col("df").cast("long").as("df"),
      org.apache.spark.sql.functions.col("ctf").cast("long").as("ctf"))
    val tdPlan = td.queryExecution.optimizedPlan
    val Seq(termA, dfA, ctfA) = tdPlan.output

    // every output column must map onto a dictionary column, else bail
    val mapped = aggExprs.map {
      case a: Attribute if a.semanticEquals(tokenAttr) =>
        Some(Alias(termA, a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, _, _), name) =>
        Some(Alias(ctfA, name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(c: Attribute)), _, true, _, _), name)
          if PlanShapes.isColumnOf(lr, c, "doc_id") =>
        Some(Alias(dfA, name)(exprId = al.exprId))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None
    else Some(Project(mapped.flatten, tdPlan))
  }
}

/** Claims `ORDER BY ann_l2(embedding, <const vector>) LIMIT k` over the
  * embeddings table into an IVF index probe — the analogue of the
  * reference's `PushdownDistanceCall` / ANN top-k claim
  * (/root/reference/server/connector/optimizer/iresearch_plan.cpp:546-621):
  * distance order + limit over an ANN-indexed column becomes a
  * partition-pruned probe of the index's inverted lists with exact distance
  * inside and a global O(k) merge. The default probe is the adaptive-exact
  * (ball-bound) strategy, so the claimed result EQUALS the exact sort it
  * replaces — gated by vec_claimed_ann/vec_ivf_recall and IvfIndexSpec. */
case class ClaimAnnTopK(spark: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, SortOrder, Ascending}
  import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Project, Sort}
  import org.apache.spark.sql.catalyst.util.ArrayData

  private def annUdf(e: Expression): Option[(AttributeReference, Seq[Float])] = e match {
    case u: ScalaUDF if u.udfName.contains("ann_l2") =>
      u.children match {
        case Seq(a: AttributeReference, Literal(arr: ArrayData, t)) =>
          val q = t match {
            case org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType, _) => arr.toFloatArray().toSeq
            case org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, _) =>
              arr.toDoubleArray().toSeq.map(_.toFloat)
            case _ => return None
          }
          Some((a, q))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case gl @ GlobalLimit(Literal(k: Int, _), LocalLimit(_, inner)) =>
      try {
        val claimed = inner match {
          case Project(projList, Sort(Seq(SortOrder(so, Ascending, _, _)), true, grand, _)) =>
            for {
              (embAttr, q) <- annUdf(so)
              // the sorted input must be the BARE embeddings scan (modulo
              // column-pruning Projects): a Filter/Join/Limit under the Sort
              // would be discarded by the probe rewrite — leave those exact
              (lr, dir) <- PlanShapes.bareRelation(grand, "embeddings.parquet")
              if PlanShapes.isColumnOf(lr, embAttr, "embedding")
              // claim only a bare vec_id projection — anything else would
              // need a join-back we don't rewrite here
              out <- projList match {
                case Seq(a: AttributeReference)
                    if PlanShapes.isColumnOf(lr, a, "vec_id") => Some(a)
                case _ => None
              }
            } yield {
              val idx = graft.index.IvfIndex.ensure(spark,
                graft.Tables.embeddings(spark, dir), s"$dir-embeddings")
              val knnPlan = idx.knn(q, k).select(
                org.apache.spark.sql.functions.col("vec_id"))
                .queryExecution.optimizedPlan
              Project(Seq(Alias(knnPlan.output.head, out.name)(exprId = out.exprId)), knnPlan)
            }
          case _ => None
        }
        claimed.getOrElse(gl)
      } catch {
        case e: Exception =>
          logWarning(s"ANN claim failed, keeping exact sort: $e")
          gl
      }
  }
}

case class ClaimTsMatch(spark: SparkSession) extends Rule[LogicalPlan] {

  private def asTsMatch(e: Expression): Option[(Expression, String, String)] =
    e match {
      case u: ScalaUDF if u.udfName.contains("ts_match") =>
        u.children match {
          case Seq(arg, Literal(q: UTF8String, _), Literal(d: UTF8String, _)) =>
            Some((arg, q.toString, d.toString))
          case _ => None
        }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Resolves the documents scan that PRODUCED `textAttr` — matched by
    * exprId, not name, so a join partner exposing its own `text` column can
    * never have its predicate claimed against the documents index. Returns
    * the sf dir and that scan's own `doc_id` attribute (the sound semi-join
    * key even when several joined relations expose a `doc_id`). */
  private def documentsScanOf(plan: LogicalPlan,
      textAttr: AttributeReference): Option[(String, AttributeReference)] =
    plan.collectFirst {
      case lr: LogicalRelation if PlanShapes.isColumnOf(lr, textAttr, "text") =>
        lr.relation match {
          case h: HadoopFsRelation =>
            for {
              dir <- h.location.rootPaths.headOption.map(_.toString)
                .filter(_.endsWith("/documents.parquet"))
                .map(_.stripSuffix("/documents.parquet").stripPrefix("file:"))
              docId <- lr.output.collectFirst {
                case a: AttributeReference if a.name == "doc_id" => a }
            } yield (dir, docId)
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

  /** Resolves an EXPRESSION key (`ts_match(upper(text), ...)`-style) against
    * the ExprIndexes registry: every attribute inside the expression must
    * come from one parquet scan (exprId provenance), and the normalized
    * expression SQL + analyzer must have been registered by
    * `CREATE SEARCH INDEX ... ((expr))`. Returns the segment dir and the
    * scan's id attribute. */
  private def exprIndexOf(plan: LogicalPlan, e: Expression,
      dict: String): Option[(String, AttributeReference)] = {
    val attrs = e.references.toSeq
    if (attrs.isEmpty) return None
    plan.collectFirst {
      case lr: LogicalRelation if attrs.forall(lr.outputSet.contains) => lr
    }.flatMap { lr =>
      lr.relation match {
        case h: HadoopFsRelation =>
          // render without view/table qualifiers so the SQL matches the
          // DDL-registered (unresolved-parse) form
          val bareSql = e.transform {
            case a: AttributeReference => a.withQualifier(Seq.empty)
          }.sql
          for {
            root <- h.location.rootPaths.headOption.map(_.toString.stripPrefix("file:"))
            (segDir, idCol) <- graft.search.ExprIndexes.lookup(root, bareSql, dict)
            docId <- lr.output.collectFirst {
              case a: AttributeReference if a.name == idCol => a }
          } yield (segDir, docId)
        case _ => None
      }
    }
  }

  private def claim(f: Filter, cond: Expression, child: LogicalPlan): LogicalPlan = {
    val parts = conjuncts(cond)
    val claimable = parts.flatMap { p =>
      for {
        (arg, q, dict) <- asTsMatch(p)
        (target, docId) <- arg match {
          case attr: AttributeReference =>
            documentsScanOf(child, attr).map { case (dir, id) => (Left(dir), id) }
          case e =>
            exprIndexOf(child, e, dict).map { case (segDir, id) => (Right(segDir), id) }
        }
        // the scan's doc_id must still be visible at the filter for the
        // semi-join to be well-formed (it always is for the plain
        // scan→filter shape; a projection that dropped it bails here)
        if child.outputSet.contains(docId)
      } yield (p, q, dict, target, docId)
    }
    if (claimable.isEmpty) return f

    val joined = claimable.foldLeft(child) { case (acc, (_, q, dict, target, docId)) =>
      val idx = target match {
        case Left(sfDir) => graft.index.IndexStore.documents(spark, sfDir, dict)
        case Right(segDir) => graft.index.IndexStore.load(spark, segDir)
      }
      val parsed = graft.search.TsQueryParser.websearch(
        q, graft.analysis.AnalyzerRegistry.get(dict))
      val matched = graft.search.TsQueryExec.matching(idx, parsed)
      // optimizedPlan, NOT analyzed: the injected subtree skips the earlier
      // optimizer batches, so e.g. a Deduplicate (from .distinct()) would
      // otherwise reach physical planning unreplaced and fail the query
      val mPlan = matched.queryExecution.optimizedPlan
      val rightId = mPlan.output.find(_.name == "doc_id").get
      Join(acc, mPlan, LeftSemi, Some(EqualTo(docId, rightId)), JoinHint.NONE)
    }
    val claimedSet = claimable.map(_._1).toSet
    parts.filterNot(claimedSet).reduceOption(CAnd(_, _))
      .map(Filter(_, joined)).getOrElse(joined)
  }
}
