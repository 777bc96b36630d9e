package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StructType

import graft.catalog.{ObjectCatalog, TableStore, Txn}

/** Cross-session resolution + snapshot isolation for the index-as-relation
  * surface and catalog table data (reference semantics:
  * tests/sqllogic/sdb/pg/index/{vector_search,ts_offsets,inverted_index}
  * _isolation.test — a REPEATABLE READ reader keeps the catalog and data
  * state it first read, while other connections commit DDL/DML past it).
  *
  * Resolution happens on the DRIVER with the owning session active, so the
  * per-session transaction context is available at analysis time — pins
  * live in [[Txn]]'s ctx and die with the block.
  */

/** `SELECT ... FROM <index_name>` from ANY session: index relations are
  * registered as temp views only in the session that ran CREATE INDEX, but
  * the registry is JVM-shared — resolve the bare name to the indexed
  * table. Inside a REPEATABLE READ block the name→table binding pins at
  * first use, so a concurrent DROP INDEX does not break the reader's
  * later statements (pg's catalog snapshot). */
case class ResolveIndexRelation(spark: SparkSession) extends Rule[LogicalPlan] {
  /** A dropped-but-pinned table: this block scanned it before another
    * session's DROP TABLE committed, so its name keeps resolving to the
    * pinned snapshot (files deferred by retireTable's anyActivePin check). */
  private def pinnedDropped(name: String): Option[LogicalPlan] = {
    if (!Txn.snapshotActive(spark)) return None
    val qname = ObjectCatalog.qualify(name)
    if (ObjectCatalog.table(qname).isDefined) return None // live: normal path
    Txn.pinnedGet(spark, s"tabledef:${qname.toLowerCase}").map { pinned =>
      val (t, v) = pinned.asInstanceOf[(graft.catalog.ObjectCatalog.TableDef, java.lang.Long)]
      val schema = StructType.fromDDL(ObjectCatalog.sparkSchemaDdl(t.columns))
      org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(name,
        TableStore.readAt(spark, t.dir, schema, v.longValue())
          .queryExecution.analyzed)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length <= 2 &&
        pinnedDropped(u.multipartIdentifier.mkString(".").toLowerCase).isDefined =>
      pinnedDropped(u.multipartIdentifier.mkString(".").toLowerCase).get
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      val name = u.multipartIdentifier.head.toLowerCase
      val key = s"idxrel:$name"
      val rel: Option[(String, Option[String])] =
        if (Txn.snapshotActive(spark))
          Txn.pinnedGet(spark, key)
            .map(_.asInstanceOf[(String, Option[String])]).orElse(
              graft.search.PgIndexDdl.relationFor(name).map { t =>
                Txn.pinned(spark, key, t)
                  .asInstanceOf[(String, Option[String])]
              })
        else graft.search.PgIndexDdl.relationFor(name)
      rel.map { case (table, pred) =>
        val base: LogicalPlan = UnresolvedRelation(table.split("\\.").toSeq)
        pred.fold(base) { p =>
          // a PARTIAL index views only its predicate's rows
          org.apache.spark.sql.catalyst.plans.logical.Filter(
            org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseExpression(p), base)
        }
      }.getOrElse(u)
  }
}

/** REPEATABLE READ data snapshots over catalog tables: the first scan of a
  * table inside an RR/SERIALIZABLE block pins its TableStore version; every
  * scan in the block then reads the file set AS OF that version
  * ([[TableStore.filesAt]] — retired files stay under _RETIRED), so
  * another session's committed INSERT/UPDATE/DELETE is invisible until
  * COMMIT, exactly like pg's snapshot. READ COMMITTED sessions scan live.
  * The replacement projects back onto the original attribute ids, so
  * parent operators (and claim rules) are untouched. */
case class PinSnapshotReads(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!Txn.snapshotActive(spark)) plan
    else plan.resolveOperatorsUp {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        val h = lr.relation.asInstanceOf[HadoopFsRelation]
        h.location.rootPaths.headOption
          .flatMap(p => ObjectCatalog.tableByCurrentPath(p.toString)) match {
          case Some(t) =>
            val v = Txn.pinned(spark, s"tablever:${t.dir}",
              java.lang.Long.valueOf(TableStore.version(t.dir)))
              .asInstanceOf[java.lang.Long].longValue()
            // remember the TableDef too: a concurrent DROP TABLE removes
            // the catalog object, and this block's later statements then
            // resolve the bare name from this pin (ResolveIndexRelation)
            Txn.pinned(spark, s"tabledef:${t.qname.toLowerCase}", (t, java.lang.Long.valueOf(v)))
            if (v == TableStore.version(t.dir)) lr // snapshot is the live set
            else {
              val schema = StructType.fromDDL(
                ObjectCatalog.sparkSchemaDdl(t.columns))
              val snap = TableStore.readAt(spark, t.dir, schema, v)
                .queryExecution.analyzed
              val byName = snap.output.map(a => a.name.toLowerCase -> a).toMap
              val proj: Seq[NamedExpression] = lr.output.map { o =>
                Alias(byName(o.name.toLowerCase), o.name)(
                  exprId = o.exprId, qualifier = o.qualifier)
              }
              Project(proj, snap)
            }
          case None => lr
        }
    }
}
