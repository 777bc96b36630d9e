package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And => CAnd, Attribute, AttributeReference, Descending, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, ScalaUDF, SortOrder}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import graft.analysis.AnalyzerRegistry
import graft.index.{IndexStore, InvertedIndex}
import graft.search.{IndexCatalog, SqlSurface}

/** Shared pieces of the scorer-claim rules: recognizing a scorer stub call
  * (`bm25(col, 'query', 'dict')` and friends, registered by
  * [[graft.search.SqlSurface]]) and mapping it onto the index postings
  * drive. The scorers are claim-ONLY — the stub throws if it ever
  * row-evaluates (the reference's SearchStubFn surface, search.h:128-132) —
  * so these rules are what make the SQL text executable at all, exactly
  * like the reference's iresearch_plan claim walk
  * (server/connector/optimizer/iresearch_plan.cpp:870-885). */
private[plans] object ScorerShapes {
  private val names = SqlSurface.scorerNames.toSet

  /** `(textAttr, scorerName, query, dict)` iff `e` is a scorer stub over a
    * plain column with literal query + dict (the reference folds TSQUERY
    * constants before claiming the same way, ts_query.cpp:341). */
  def asScorer(e: Expression): Option[(AttributeReference, String, String, String)] =
    e match {
      case u: ScalaUDF if u.udfName.exists(names.contains) =>
        u.children match {
          case Seq(a: AttributeReference, Literal(q: UTF8String, _), Literal(d: UTF8String, _)) =>
            Some((a, u.udfName.get, q.toString, d.toString))
          case _ => None
        }
      case _ => None
    }

  /** All-matched-docs scores `(doc_id, _score)` for a scorer name — the
    * per-scorer kernels already verified by the ts_*_topk entries. The
    * query string is a plain term bag through the index's analyzer. */
  def scored(idx: InvertedIndex, scorer: String, terms: Seq[String]): DataFrame =
    scorer match {
      case "bm25" => idx.bm25(terms)
      case "tfidf" => idx.tfidf(terms)
      case "lm_dirichlet" => idx.lmDirichlet(terms)
      case "lm_jelinek_mercer" => idx.lmJelinekMercer(terms)
      case "indri_dirichlet" => idx.indriDirichlet(terms)
      case "dfi" => idx.dfi(terms)
      case other => throw new IllegalArgumentException(s"unknown scorer $other")
    }

  def termsOf(query: String, dict: String): Seq[String] =
    AnalyzerRegistry.get(dict).tokens(query)

  /** The indexed scan producing `textAttr` (exprId provenance) + its
    * catalog entry and id attribute — the same resolution ClaimTsMatch
    * uses. */
  def indexedScanOf(plan: LogicalPlan, textAttr: AttributeReference,
      dict: String): Option[(LogicalRelation, String, IndexCatalog.TextEntry, AttributeReference)] =
    plan.collectFirst {
      case lr: LogicalRelation if PlanShapes.isColumnOf(lr, textAttr, textAttr.name) =>
        for {
          root <- PlanShapes.scanRoot(lr)
          e <- IndexCatalog.lookupText(root, textAttr.name, dict)
          idAttr <- lr.output.collectFirst {
            case a: AttributeReference if a.name == e.idCol => a }
        } yield (lr, root, e, idAttr)
    }.flatten
}

/** Claims `ORDER BY bm25(col, 'query', 'dict') DESC LIMIT k` (and the other
  * five scorers) over an indexed scan into the index postings top-k drive —
  * the reference's flagship demo query (examples/demo0/demo.sql:39-48;
  * claim walk iresearch_plan.cpp:870-885). `orderBy(_score desc).limit(k)`
  * plans TakeOrderedAndProject: per-partition top-k heaps + an O(k) driver
  * merge, the Spark shape of the reference's WAND collector.
  *
  * Claimed shapes (all under GlobalLimit/LocalLimit):
  *   - `Sort(scorerUdf DESC, scan)` — SELECT * ORDER BY bm25(...) DESC
  *   - `Project(cols, Sort(scorerUdf DESC, scan))` — ORDER BY not in SELECT
  *   - `[Project(exprs,)] Sort(s DESC, Project([cols, bm25(...) AS s], scan))`
  *     — scorer aliased in the SELECT list (score value in the output)
  * Projections beyond the id column late-materialize through one PK
  * join-back (search_pk_lookup.h), re-sorted by score so the claimed output
  * preserves the order the Sort promised. Ties break by doc id — a
  * deterministic refinement of the requested score-only order. */
case class ClaimScoreTopK(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case gl @ GlobalLimit(Literal(k: Int, _), LocalLimit(_, inner)) =>
      try claim(gl, k, inner).getOrElse(gl) catch {
        case e: Exception =>
          logWarning(s"scorer top-k claim failed, leaving plan unchanged: $e")
          gl
      }
  }

  private def claim(gl: GlobalLimit, k: Int, inner: LogicalPlan): Option[LogicalPlan] = {
    // peel: [Project P1] Sort [Project P2] scan
    val (p1, afterP1) = inner match {
      case Project(l, c) => (Some(l), c)
      case _ => (None, inner)
    }
    val (order, afterSort) = afterP1 match {
      case Sort(Seq(SortOrder(so, Descending, _, _)), true, c, _) => (so, c)
      case _ => return None
    }
    val (p2, scanPlan) = afterSort match {
      case Project(l, c) => (Some(l), c)
      case _ => (None, afterSort)
    }
    for {
      // the sort key: a scorer call directly, or an attribute bound to a
      // scorer alias in P2
      (textAttr, scorer, query, dict, scoreId) <- ScorerShapes.asScorer(order)
          .map { case (a, n, q, d) => (a, n, q, d, None: Option[ExprId]) }
          .orElse(order match {
            case a: AttributeReference =>
              p2.flatMap(_.collectFirst {
                case al @ Alias(u: ScalaUDF, _)
                    if al.exprId == a.exprId && ScorerShapes.asScorer(u).isDefined =>
                  val (ta, n, q, d) = ScorerShapes.asScorer(u).get
                  (ta, n, q, d, Some(al.exprId): Option[ExprId])
              })
            case _ => None
          })
      // the sorted input must be the BARE indexed scan (modulo pruning
      // Projects): any Filter/Join in between would be dropped by the probe
      (lr, root) <- PlanShapes.bareScan(scanPlan)
      if PlanShapes.isColumnOf(lr, textAttr, textAttr.name)
      entry <- IndexCatalog.lookupText(root, textAttr.name, dict)
      // P2 may hold only the scan's own columns + the one scorer alias —
      // anything else computed there would be silently lost
      if p2.forall(_.forall {
        case a: AttributeReference => PlanShapes.isColumnOf(lr, a, a.name)
        case al: Alias => scoreId.contains(al.exprId)
        case _ => false
      })
      // every output expression must read only scan columns / the score
      outList = p1.getOrElse(afterSort.output.map(a => a: NamedExpression))
      refs = outList.flatMap(_.references.toSeq).distinct
      if refs.forall(a =>
        PlanShapes.isColumnOf(lr, a, a.name) || scoreId.contains(a.exprId))
    } yield {
      val idx = IndexStore.load(spark, entry.segDir)
      val terms = ScorerShapes.termsOf(query, dict)
      val topk = ScorerShapes.scored(idx, scorer, terms)
        .orderBy(col("_score").desc, col("doc_id"))
        .limit(k)
        .select(col("doc_id").as(entry.idCol), col("_score").as("__graft_score"))
      val neededScanCols = refs.collect {
        case a: AttributeReference if !scoreId.contains(a.exprId) => a.name
      }.distinct
      val base =
        if (neededScanCols.forall(_ == entry.idCol)) topk
        else topk
          .join(spark.read.parquet(root)
            .select((neededScanCols.toSet + entry.idCol).toSeq.map(col): _*), Seq(entry.idCol))
          // the join-back scrambles row order; the claim replaces a Sort,
          // so re-establish score order before handing the plan back
          .orderBy(col("__graft_score").desc, col(entry.idCol))
      val rPlan = base.queryExecution.optimizedPlan
      val byName = rPlan.output.map(a => a.name -> a).toMap
      def subst(a: AttributeReference): Attribute =
        if (scoreId.contains(a.exprId)) byName("__graft_score") else byName(a.name)
      val newList = outList.map {
        case a: AttributeReference => Alias(subst(a), a.name)(exprId = a.exprId)
        case al @ Alias(c, n) =>
          Alias(c.transform { case a: AttributeReference => subst(a) }, n)(exprId = al.exprId)
        case other => other
      }
      Project(newList, rPlan): LogicalPlan
    }
  }
}

/** Claims score-threshold WHERE conjuncts — `bm25(col, 'q', 'dict') >= c`
  * (also `>`, and the mirrored literal-first forms) — into an index-driven
  * semi-join. For bm25 the floor seeds the two-level WAND drive
  * (InvertedIndex.bm25MinScore; reference min_score claim,
  * duckdb_table_function.h:176-182): candidates come from the necessary
  * term set's postings only. Other scorers score their matched docs and
  * filter. Non-claimable conjuncts stay behind as residual filters. */
case class ClaimScoreFilter(spark: SparkSession) extends Rule[LogicalPlan] {

  /** `(scorerUdf, threshold, strict)` for the four comparison forms. */
  private def asThreshold(e: Expression): Option[(ScalaUDF, Double, Boolean)] = {
    def num(l: Any): Option[Double] = l match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case n: Number => Some(n.doubleValue)
      case _ => None
    }
    val parts = e match {
      case GreaterThan(u: ScalaUDF, Literal(c, _)) => Some((u, c, true))
      case GreaterThanOrEqual(u: ScalaUDF, Literal(c, _)) => Some((u, c, false))
      case LessThan(Literal(c, _), u: ScalaUDF) => Some((u, c, true))
      case LessThanOrEqual(Literal(c, _), u: ScalaUDF) => Some((u, c, false))
      case _ => None
    }
    parts.flatMap { case (u, c, strict) => num(c).map((u, _, strict)) }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case fl @ Filter(cond, child)
        if cond.exists(e => asThreshold(e).exists(t => ScorerShapes.asScorer(t._1).isDefined)) =>
      try claim(fl, cond, child) catch {
        case e: Exception =>
          logWarning(s"scorer threshold claim failed, leaving plan unchanged: $e")
          fl
      }
  }

  private def claim(fl: Filter, cond: Expression, child: LogicalPlan): LogicalPlan = {
    val parts = conjuncts(cond)
    val claimable = parts.flatMap { p =>
      for {
        (u, c, strict) <- asThreshold(p)
        (textAttr, scorer, query, dict) <- ScorerShapes.asScorer(u)
        (_, _, entry, idAttr) <- ScorerShapes.indexedScanOf(child, textAttr, dict)
        if child.outputSet.contains(idAttr)
      } yield (p, scorer, query, dict, c, strict, entry, idAttr)
    }
    if (claimable.isEmpty) return fl

    val joined = claimable.foldLeft(child) {
      case (acc, (_, scorer, query, dict, c, strict, entry, idAttr)) =>
        val idx = IndexStore.load(spark, entry.segDir)
        val terms = ScorerShapes.termsOf(query, dict)
        val matched = scorer match {
          case "bm25" =>
            val m = idx.bm25MinScore(terms, c)
            if (strict) m.filter(col("_score") > c) else m
          case other =>
            ScorerShapes.scored(idx, other, terms)
              .filter(if (strict) col("_score") > c else col("_score") >= c)
        }
        val mPlan = matched.select(col("doc_id")).queryExecution.optimizedPlan
        Join(acc, mPlan, LeftSemi,
          Some(EqualTo(idAttr, mPlan.output.head)), JoinHint.NONE)
    }
    val claimedSet = claimable.map(_._1).toSet
    parts.filterNot(claimedSet).reduceOption(CAnd(_, _))
      .map(Filter(_, joined)).getOrElse(joined)
  }
}
