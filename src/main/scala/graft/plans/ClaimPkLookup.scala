package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String
import graft.index.PkIndex
import graft.search.IndexCatalog

/** File index holding only the zone-pruned candidate files — its own type so
  * later optimizer fixpoint iterations recognize an already-claimed scan and
  * leave it alone. */
class PrunedPkFileIndex(spark: SparkSession, paths: Seq[Path])
  extends InMemoryFileIndex(spark, paths, Map.empty, None)

/** Claims selective point predicates — `WHERE pk = x` and small IN lists —
  * on a column covered by a `CREATE SECONDARY INDEX` sidecar into a
  * file-pruned scan: the reference's ART index-scan switch for selective
  * equalities (secondary_index_point_lookup.test — "fewer than
  * index_scan_max_count rows match → Index Scan, else Sequential Scan").
  *
  * The rewrite consults the per-file zone manifest (a driver FS read, cached
  * per JVM — plan-time job-free like every other claim rule) and swaps the
  * relation's FileIndex for the candidate files whose [min,max] covers a
  * key. The FULL filter stays on top, so results are exact regardless of
  * zone overlap; parquet row-group statistics prune further inside each
  * candidate file. On key-clustered data a point lookup reads one file out
  * of the whole table. */
case class ClaimPkLookup(spark: SparkSession) extends Rule[LogicalPlan] {

  private val MaxInKeys = 256

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** External-domain key values of a point conjunct on `attr`, if any. */
  private def pointKeys(e: Expression): Option[(AttributeReference, Seq[Any])] = {
    def ext(v: Any): Any = v match {
      case u: UTF8String => u.toString
      case other => other
    }
    e match {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        Some((a, Seq(ext(v))))
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null =>
        Some((a, Seq(ext(v))))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.size <= MaxInKeys &&
            vs.forall { case Literal(v, _) => v != null; case _ => false } =>
        Some((a, vs.collect { case Literal(v, _) => ext(v) }))
      case InSet(a: AttributeReference, hset)
          if hset.nonEmpty && hset.size <= MaxInKeys && !hset.contains(null) =>
        Some((a, hset.toSeq.map(ext)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case fl @ Filter(cond, child) =>
      try claim(fl, cond, child) catch {
        case e: Exception =>
          logWarning(s"pk point-lookup claim failed, keeping full scan: $e")
          fl
      }
  }

  private def claim(fl: Filter, cond: Expression, child: LogicalPlan): LogicalPlan = {
    val (lr, root) = PlanShapes.bareScan(child) match {
      case Some(x) => x
      case None => return fl
    }
    val rel = lr.relation match {
      case h: HadoopFsRelation if !h.location.isInstanceOf[PrunedPkFileIndex] => h
      case _ => return fl
    }
    // the InMemoryFileIndex swap lists leaf files only — partition values
    // recovered from directory names would be lost, so never claim a
    // partitioned relation
    if (rel.partitionSchema.nonEmpty) return fl
    // Reconcile the manifest with the relation's CURRENT file listing
    // (already cached in its FileIndex — no job): files rewritten since
    // CREATE are absent from the manifest and their zones are unknown, so
    // they must always stay candidates or a rewrite would silently drop
    // rows; manifest entries for deleted files are ignored.
    val live = rel.location.inputFiles
    val liveByKey = live.map(f => PkIndex.pathKey(f) -> f).toMap
    // among all claimable point conjuncts, prune by the most selective one
    // (any single conjunct's candidate set is a sound superset of the rows)
    val prunings = conjuncts(cond).flatMap { p =>
      for {
        (attr, keys) <- pointKeys(p)
        if PlanShapes.isColumnOf(lr, attr, attr.name)
        entry <- IndexCatalog.lookupPk(root, attr.name)
        m <- PkIndex.load(spark, entry.dir)
      } yield {
        val known = m.candidates(keys).map(PkIndex.pathKey).toSet
        val unknown = liveByKey.keySet -- m.fileKeys
        liveByKey.collect {
          case (k, f) if known(k) || unknown(k) => f
        }.toSeq
      }
    }
    prunings.sortBy(_.size).headOption match {
      case Some(cand) if cand.size < live.length =>
        val pruned = new PrunedPkFileIndex(spark, cand.map(new Path(_)))
        val newRel = rel.copy(location = pruned)(spark)
        fl.copy(child = child.transformUp {
          case l: LogicalRelation if l eq lr => l.copy(relation = newRel)
        })
      case _ => fl
    }
  }
}
