package graft.search

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.index.IndexStore

/** Registry of expression-key indexes for claim-by-semantic-equality: maps
  * (table root path, normalized expression SQL, analyzer) → (segment dir,
  * id column). ClaimTsMatch consults it when a `ts_match` first argument is
  * an expression rather than a bare column — the reference's
  * ExpressionKeys surface (catalog/inverted_index.h:233,
  * inverted_index_expressions.test). */
object ExprIndexes {
  private val reg = TrieMap.empty[(String, String, String), (String, String)]

  /** Canonical form for equality: lowercase, no backticks, no whitespace —
    * both the DDL-registered text and a resolved Catalyst expression's
    * `.sql` rendering land on the same string for the supported shapes. */
  def normalize(exprSql: String): String =
    exprSql.toLowerCase(java.util.Locale.ROOT).replace("`", "").replaceAll("\\s+", "")

  def register(tableRoot: String, exprSql: String, analyzer: String,
      segDir: String, idCol: String): Unit =
    reg.put((tableRoot, normalize(exprSql), analyzer), (segDir, idCol))

  def lookup(tableRoot: String, exprSql: String, analyzer: String): Option[(String, String)] =
    reg.get((tableRoot, normalize(exprSql), analyzer))
}

/** Minimal DDL surface for the search index — the analogue of the
  * reference's `CREATE INDEX ... WITH (analyzer = ...)` / `DROP INDEX`
  * entry points (DDL handled in server/catalog; index build in
  * server/search). Statements operate on a registered temp view and wire
  * straight into IndexStore, so a DDL-created index is the same
  * segment-store every claimed `ts_*` query uses.
  *
  * Grammar (case-insensitive keywords, single statement per call):
  * {{{
  *   CREATE SEARCH INDEX <name> ON <view> (<textCol>)
  *     WITH (id = '<idCol>' [, analyzer = '<dict>'] [, key = '<cacheKey>'])
  *   CREATE SEARCH INDEX <name> ON <view> ((<expr>))      -- expression key
  *     WITH (id = '<idCol>' [, analyzer = '<dict>'] [, key = '<cacheKey>'])
  *   DROP SEARCH INDEX <name>
  *   SHOW SEARCH INDEXES
  * }}}
  * The double-paren form (reference ExpressionKeys,
  * inverted_index_expressions.test) indexes a COMPUTED column; the index is
  * also registered with [[ExprIndexes]] so ClaimTsMatch claims
  * `ts_match(<same expr>, ...)` predicates against it by semantic
  * equality of the expression.
  * `key` scopes the segment directory (defaults to the view name — pass a
  * dataset-specific key when the same view name is rebound to different
  * data). CREATE also registers `<name>_termdict/_postings/_docstats`
  * views, so the index is immediately SQL-queryable. Incremental refresh
  * is the library/streaming path (IndexStore.appendSegment, exercised by
  * StreamingIngest) — not a DDL statement here.
  */
object Ddl {

  /** name → (segment dir, view, textCol, analyzer) for SHOW / DROP. */
  private val catalog = TrieMap.empty[String, (String, String, String, String)]

  private val createRe =
    """(?is)\s*CREATE\s+SEARCH\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(\s*(\w+)\s*\)\s*WITH\s*\((.*)\)\s*""".r
  private val createExprRe =
    """(?is)\s*CREATE\s+SEARCH\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(\(\s*(.+?)\s*\)\)\s*WITH\s*\((.*)\)\s*""".r
  private val dropRe = """(?is)\s*DROP\s+SEARCH\s+INDEX\s+(\w+)\s*""".r
  private val showRe = """(?is)\s*SHOW\s+SEARCH\s+INDEXES\s*""".r
  private val optRe = """(?s)(\w+)\s*=\s*'([^']*)'""".r

  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
    case createExprRe(name, view, exprRaw, optsStr) =>
      val opts = optRe.findAllMatchIn(optsStr)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      val idCol = opts.getOrElse("id",
        throw new IllegalArgumentException("CREATE SEARCH INDEX requires WITH (id = '...')"))
      val analyzer = opts.getOrElse("analyzer", "whitespace")
      val cacheKey = opts.getOrElse("key", s"$view-expr")
      val keyCol = "expr_key"
      val df = spark.table(view)
        .withColumn(keyCol, org.apache.spark.sql.functions.expr(exprRaw))
      IndexStore.ensure(spark, df, cacheKey, idCol, keyCol, analyzer)
      val dir = IndexStore.dirFor(cacheKey, keyCol, analyzer)
      IndexStore.registerViews(spark, dir, name)
      // root path of the scan the view wraps → claimable by expression
      // equality (bare-scan views only; anything else stays SQL-queryable
      // but unclaimed)
      spark.table(view).queryExecution.optimizedPlan.collectFirst {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.headOption.map(_.toString.stripPrefix("file:"))
          case _ => None
        }
      }.flatten.foreach { root =>
        ExprIndexes.register(root,
          spark.sessionState.sqlParser.parseExpression(exprRaw).sql, analyzer, dir, idCol)
      }
      catalog.put(name, (dir, view, s"(($exprRaw))", analyzer))
      result(spark, s"created $name")
    case createRe(name, view, textCol, optsStr) =>
      val opts = optRe.findAllMatchIn(optsStr)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      val idCol = opts.getOrElse("id",
        throw new IllegalArgumentException("CREATE SEARCH INDEX requires WITH (id = '...')"))
      val analyzer = opts.getOrElse("analyzer", "whitespace")
      val cacheKey = opts.getOrElse("key", view)
      IndexStore.ensure(spark, spark.table(view), cacheKey, idCol, textCol, analyzer)
      val dir = IndexStore.dirFor(cacheKey, textCol, analyzer)
      IndexStore.registerViews(spark, dir, name)
      IndexStore.registerStatsTables(spark, dir, name) // CBO sees the manifest stats
      catalog.put(name, (dir, view, textCol, analyzer))
      result(spark, s"created $name")
    case dropRe(name) =>
      catalog.remove(name) match {
        case Some((dir, _, _, _)) =>
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          IndexStore.invalidate(dir)
          result(spark, s"dropped $name")
        case None =>
          throw new IllegalArgumentException(s"no such search index: $name")
      }
    case showRe() =>
      import spark.implicits._
      catalog.toSeq.sortBy(_._1)
        .map { case (n, (dir, view, col, an)) => (n, view, col, an, dir) }
        .toDF("index_name", "view", "text_col", "analyzer", "location")
    case other =>
      throw new IllegalArgumentException(s"unsupported DDL: $other")
  }

  private def result(spark: SparkSession, msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("result")
  }
}
