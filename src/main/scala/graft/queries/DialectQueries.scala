package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Oracle-gated entries for the DuckDB-dialect STATEMENT surface
  * (graft.catalog.DuckStatements + the query/query_table TVFs): PIVOT,
  * UNPIVOT, USING SAMPLE, PREPARE/EXECUTE, and dynamic-SQL table
  * functions — each statement goes through `spark.sql` TEXT so the parser
  * extension is what's being proven, not the DataFrame API. */
object DialectQueries {

  private def docsView(s: SparkSession, dir: String, name: String): Unit =
    Tables.documents(s, dir).createOrReplaceTempView(name)

  /** `PIVOT t ON lang IN (..) USING sum/count GROUP BY source` — the
    * statements/pivot corpus shape with an explicit IN list (deterministic
    * columns) and an aggregate pair. */
  def duckPivot(s: SparkSession, dir: String): DataFrame = {
    docsView(s, dir, "gdocs_pivot")
    s.sql(
      """PIVOT gdocs_pivot
        |ON lang IN ('en', 'de', 'fr')
        |USING sum(n_chars)
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  /** `UNPIVOT t ON c.. INTO NAME n VALUE v` (statements/unpivot corpus):
    * wide per-doc metrics melt to (doc_id, metric, v); NULL cells drop in
    * both engines. */
  def duckUnpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "cast(n_chars AS BIGINT) AS chars",
        "cast(length(text) AS BIGINT) AS len",
        "cast(doc_id % 7 AS BIGINT) AS bucket")
      .where("doc_id < 50")
      .createOrReplaceTempView("gdocs_unpivot")
    s.sql(
      """UNPIVOT gdocs_unpivot
        |ON chars, len, bucket
        |INTO NAME metric VALUE v""".stripMargin)
  }

  /** `USING SAMPLE n ROWS` (exact count) and `100% (bernoulli)` (all rows)
    * — the two deterministic contracts of the sample clause
    * (query_syntax/sample corpus asserts exactly these). */
  def duckSample(s: SparkSession, dir: String): DataFrame = {
    docsView(s, dir, "gdocs_sample")
    val rows = s.sql("SELECT doc_id FROM gdocs_sample USING SAMPLE 120 ROWS")
    val all = s.sql("SELECT doc_id FROM gdocs_sample USING SAMPLE 100% (bernoulli)")
    import org.apache.spark.sql.functions._
    rows.agg(count(lit(1)).as("n_rows"))
      .crossJoin(all.agg(count(lit(1)).as("n_all")))
  }

  /** pg prepared statements (query_syntax/prepared_statements.test): `$n`
    * numbered args bind out of order, `?` binds positionally, DEALLOCATE
    * then re-PREPARE swaps the body. */
  def preparedStmt(s: SparkSession, dir: String): DataFrame = {
    docsView(s, dir, "gdocs_prep")
    s.sql("PREPARE graft_q AS SELECT doc_id, lang FROM gdocs_prep " +
      "WHERE lang = $2 AND doc_id < $1")
    val a = s.sql("EXECUTE graft_q(300, 'en')")
    val b = s.sql("EXECUTE graft_q(100, 'de')")
    s.sql("DEALLOCATE graft_q")
    s.sql("PREPARE graft_q AS SELECT doc_id, lang FROM gdocs_prep " +
      "WHERE lang = ? AND doc_id >= ? AND doc_id < ?")
    val c = s.sql("EXECUTE graft_q('fr', 50, 400)")
    s.sql("DEALLOCATE PREPARE graft_q")
    a.unionAll(b).unionAll(c)
  }

  /** query()/query_table() dynamic-SQL TVFs
    * (cookbook/sql_features/query_and_query_table_functions.test): a
    * query_table scan joined to a query() subquery, and a query() whose
    * LITERAL is itself a dialect UNPIVOT statement — proving the TVF
    * re-enters the full parser chain (the cookbook's stack() macro trick). */
  def queryTvf(s: SparkSession, dir: String): DataFrame = {
    docsView(s, dir, "gdocs_qt")
    s.sql(
      """SELECT q.lang, count(*) AS n, cast(sum(f.half) AS BIGINT) AS half_sum
        |FROM query_table('gdocs_qt') q
        |JOIN query('SELECT doc_id, doc_id % 2 AS half FROM gdocs_qt WHERE doc_id < 200') f
        |  ON q.doc_id = f.doc_id
        |GROUP BY q.lang ORDER BY q.lang""".stripMargin)
  }

  /** The cookbook's dynamic-UNPIVOT-through-query() composition. */
  def queryUnpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "cast(n_chars AS BIGINT) AS chars",
        "cast(doc_id % 5 AS BIGINT) AS m5")
      .where("doc_id < 30")
      .createOrReplaceTempView("gdocs_qup")
    s.sql("SELECT metric, cast(sum(v) AS BIGINT) AS total FROM query(" +
      "'UNPIVOT gdocs_qup ON chars, m5 INTO NAME metric VALUE v'" +
      ") GROUP BY metric ORDER BY metric")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "duck_pivot" -> duckPivot,
    "duck_unpivot" -> duckUnpivot,
    "duck_sample" -> duckSample,
    "prepared_stmt" -> preparedStmt,
    "query_tvf" -> queryTvf,
    "query_unpivot" -> queryUnpivot)

  val oracles: Map[String, String] = Map(
    "duck_pivot" ->
      """SELECT source,
        |       CAST(sum(n_chars) FILTER (lang = 'en') AS BIGINT) AS en,
        |       CAST(sum(n_chars) FILTER (lang = 'de') AS BIGINT) AS de,
        |       CAST(sum(n_chars) FILTER (lang = 'fr') AS BIGINT) AS fr
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "duck_unpivot" ->
      """WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
        |  CAST(length(text) AS BIGINT) AS len, CAST(doc_id % 7 AS BIGINT) AS bucket
        |  FROM documents WHERE doc_id < 50)
        |SELECT doc_id, 'chars' AS metric, chars AS v FROM w
        |UNION ALL SELECT doc_id, 'len', len FROM w
        |UNION ALL SELECT doc_id, 'bucket', bucket FROM w""".stripMargin,
    "duck_sample" ->
      """SELECT CAST(120 AS BIGINT) AS n_rows,
        |       (SELECT count(*) FROM documents) AS n_all""".stripMargin,
    "prepared_stmt" ->
      """SELECT doc_id, lang FROM documents WHERE lang = 'en' AND doc_id < 300
        |UNION ALL
        |SELECT doc_id, lang FROM documents WHERE lang = 'de' AND doc_id < 100
        |UNION ALL
        |SELECT doc_id, lang FROM documents
        |WHERE lang = 'fr' AND doc_id >= 50 AND doc_id < 400""".stripMargin,
    "query_tvf" ->
      """SELECT lang, count(*) AS n, CAST(sum(doc_id % 2) AS BIGINT) AS half_sum
        |FROM documents WHERE doc_id < 200
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "query_unpivot" ->
      """WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
        |  CAST(doc_id % 5 AS BIGINT) AS m5 FROM documents WHERE doc_id < 30)
        |SELECT 'chars' AS metric, CAST(sum(chars) AS BIGINT) AS total FROM w
        |UNION ALL
        |SELECT 'm5', CAST(sum(m5) AS BIGINT) FROM w
        |ORDER BY metric""".stripMargin)
}
