package graft.catalog

import org.apache.spark.sql.SparkSession

/** Session transaction blocks over the object catalog and its table data —
  * the pg semantics the reference's txn corpus pins
  * (tests/sqllogic/any/pg/txn/ *.test, recovery/ddl_in_transaction.test):
  *
  *  - BEGIN starts a block; COMMIT/END ends it; ROLLBACK/ABORT undoes it.
  *  - A failed statement ABORTS the block: every later statement except
  *    COMMIT/ROLLBACK is refused with pg's 25P02 message, and COMMIT of an
  *    aborted block is converted to a rollback (aborted_block.test).
  *  - DDL is transactional (pg!): CREATE/DROP TABLE inside a block roll
  *    back with it. Undo = catalog snapshot at BEGIN (metadata-sized) +
  *    per-table data version at first touch (TableStore.rollbackTo is
  *    O(files changed since), not O(table)). Physical data of tables
  *    DROPped inside a block is retired, not deleted, until COMMIT.
  *  - Sequences are deliberately NON-transactional, as in pg: a rolled-
  *    back nextval leaves a gap.
  *  - SET LOCAL changes revert at block end, commit or abort.
  *
  * Statement failures are observed at the SQL choke points (CatalogDdl and
  * the sqllogic runner both report into [[statementFailed]]); the
  * parser-level [[gate]] then enforces the aborted state for every
  * subsequent spark.sql text, whatever its origin.
  */
object Txn {

  sealed trait State
  case object Idle extends State
  case object Active extends State
  case object Aborted extends State

  private final class Ctx(val spark: SparkSession) {
    val catalogSnap = ObjectCatalog.snapshot()
    /** table qname -> (dir, data version at first touch) */
    val tableVersions = scala.collection.mutable.LinkedHashMap.empty[String, (String, Long)]
    /** dirs of tables created in this txn (destroyed on rollback) */
    val createdDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    /** dirs of tables dropped in this txn (deleted only on commit) */
    val droppedDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    /** SET LOCAL undo: name -> previous value (None = was unset) */
    val localVars = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
  }

  @volatile private var state: State = Idle
  @volatile private var ctx: Ctx = _

  def current: State = state
  def active: Boolean = state != Idle

  def begin(spark: SparkSession): String = state match {
    case Idle =>
      ctx = new Ctx(spark); state = Active; "BEGIN"
    case _ =>
      // pg: WARNING, the block continues
      "WARNING: there is already a transaction in progress"
  }

  /** Record a table's data version before its FIRST mutation in this block. */
  def touchTable(qname: String, dir: String): Unit =
    if (state == Active && !ctx.tableVersions.contains(qname))
      ctx.tableVersions.put(qname, (dir, TableStore.version(dir)))

  def tableCreated(dir: String): Unit =
    if (state == Active) ctx.createdDirs += dir

  /** A DROP inside a block defers physical deletion to COMMIT; outside a
    * block the caller deletes immediately. Returns true when deferred. */
  def tableDropped(dir: String): Boolean = {
    if (state == Active) { ctx.droppedDirs += dir; true } else false
  }

  def localVarSet(name: String, previous: Option[String]): Unit =
    if (state == Active && !ctx.localVars.contains(name))
      ctx.localVars.put(name, previous)

  /** Mark the open block failed (25P02 until COMMIT/ROLLBACK). */
  def statementFailed(): Unit = if (state == Active) state = Aborted

  /** Refuse any statement but COMMIT/ROLLBACK while aborted — called from
    * the session parser, so it covers every spark.sql text. */
  def gate(sqlText: String): Unit =
    if (state == Aborted && !ObjectCatalog.internal.value &&
        !CatalogDdl.isTxnEnd(sqlText))
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          "current transaction is aborted, commands ignored until end of transaction block"))

  def commit(spark: SparkSession): String = state match {
    case Idle => "WARNING: there is no transaction in progress"
    case Aborted => rollback(spark); "ROLLBACK" // pg converts COMMIT of an aborted block
    case Active =>
      val c = ctx
      c.droppedDirs.foreach(TableStore.destroy) // deferred physical deletes
      restoreLocals(spark, c)
      state = Idle; ctx = null
      "COMMIT"
  }

  def rollback(spark: SparkSession): String = state match {
    case Idle => "WARNING: there is no transaction in progress"
    case _ =>
      val c = ctx
      state = Idle; ctx = null
      // data first (while the old defs still reference the dirs), then catalog
      c.tableVersions.values.foreach { case (dir, v) =>
        TableStore.rollbackTo(dir, v)
        c.spark.catalog.refreshByPath(s"$dir/current")
      }
      c.createdDirs.foreach(TableStore.destroy)
      ObjectCatalog.restore(c.spark, c.catalogSnap)
      restoreLocals(spark, c)
      "ROLLBACK"
  }

  private def restoreLocals(spark: SparkSession, c: Ctx): Unit =
    c.localVars.foreach { case (name, prev) =>
      SessionVars.restore(spark, name, prev)
    }

  /** Test hook. */
  private[graft] def reset(): Unit = { state = Idle; ctx = null }
}
