package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a testdata scale-factor directory; `oracleSql` carries the
  * DuckDB-equivalent SQL for hash comparison. Entries without an oracle get a
  * rows-only check (approximate operators: LSH, IVF, …).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Search.all ++ Vectors.all ++ DedupQueries.all ++
      QueryLang.all ++ TextPipeline.all ++ Pipeline.all ++ Extras.all ++
      Surface.all ++ Storage.all ++ StreamGate.all ++ Tpch.all ++
      CatalogQueries.all ++ SearchCookbook.all ++ DialectQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Search.oracles ++ Vectors.oracles ++ DedupQueries.oracles ++
      QueryLang.oracles ++ TextPipeline.oracles ++ Pipeline.oracles ++ Extras.oracles ++
      Surface.oracles ++ Storage.oracles ++ StreamGate.oracles ++ Tpch.oracles ++
      CatalogQueries.oracles ++ SearchCookbook.oracles ++ DialectQueries.oracles
}
