package graft.search

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.index.IndexStore

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
  *   DROP SEARCH INDEX <name>
  *   SHOW SEARCH INDEXES
  * }}}
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
  private val dropRe = """(?is)\s*DROP\s+SEARCH\s+INDEX\s+(\w+)\s*""".r
  private val showRe = """(?is)\s*SHOW\s+SEARCH\s+INDEXES\s*""".r
  private val optRe = """(?s)(\w+)\s*=\s*'([^']*)'""".r

  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
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
