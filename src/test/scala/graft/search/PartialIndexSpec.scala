package graft.search

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Partial inverted indexes (reference `CREATE INDEX ... WHERE <pred>`,
  * tests/sqllogic/sdb/pg/index/inverted_index_partial.test): the backfill
  * indexes only predicate-matching rows, a query carrying the predicate
  * claims into the index, and a query WITHOUT it must keep row evaluation
  * (a partial semi-join would silently drop rows). */
@graft.SlowTest
class PartialIndexSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def ensure(): Unit = {
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    Ddl.execute(spark,
      s"""CREATE SEARCH INDEX docs_partial_idx ON graft_documents (text)
         |WITH (id = 'doc_id', analyzer = 'simple', key = '${TestSpark.sfDir}-documents')
         |WHERE lang = 'en'""".stripMargin)
  }

  private def udfsIn(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      name: String): Seq[ScalaUDF] =
    plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case u: ScalaUDF if u.udfName.contains(name) => u })

  test("backfill indexes only the predicate-matching subset") {
    ensure()
    val indexed = spark.sql("SELECT count(*) FROM docs_partial_idx_docstats")
      .head().getLong(0)
    val en = Tables.documents(spark, TestSpark.sfDir)
      .filter("lang = 'en'").count()
    val total = Tables.documents(spark, TestSpark.sfDir).count()
    assert(indexed <= en, s"indexed $indexed docs but only $en match the predicate")
    assert(indexed < total, "partial index must not cover the full table")
    assert(indexed > 0, "predicate subset must not be empty at this sf")
  }

  test("query WITH the predicate claims into the partial index's semi-join") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE lang = 'en' AND ts_match(text, 'stream', 'simple')""".stripMargin)
    val plan = df.queryExecution.optimizedPlan
    val semiJoins = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semiJoins.nonEmpty, s"expected claimed semi-join, got:\n$plan")
    assert(udfsIn(plan, "ts_match").isEmpty,
      "ts_match must not survive as a row-eval filter when the predicate is present")
    // claimed result == row-eval truth
    val expected = Tables.documents(spark, TestSpark.sfDir)
      .filter("lang = 'en'")
      .filter(r => graft.analysis.AnalyzerRegistry.get("simple")(r.getAs[String]("text"))
        .contains("stream"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet == expected)
  }

  test("query WITHOUT the predicate keeps row evaluation (no unsound claim)") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE ts_match(text, 'stream', 'simple')""".stripMargin)
    val plan = df.queryExecution.optimizedPlan
    assert(udfsIn(plan, "ts_match").nonEmpty,
      s"a partial index must not claim a filter lacking its predicate:\n$plan")
    // and the row-eval answer covers ALL langs, not just the indexed subset
    val expected = Tables.documents(spark, TestSpark.sfDir)
      .filter(r => graft.analysis.AnalyzerRegistry.get("simple")(r.getAs[String]("text"))
        .contains("stream"))
      .select("doc_id").count()
    assert(df.count() == expected)
  }

  test("a partial registration never shadows a full index on the same key") {
    ensure() // partial on (documents, text, simple)
    // full index, same column, same analyzer, different key suffix
    Ddl.execute(spark,
      s"""CREATE SEARCH INDEX docs_full_simple ON graft_documents (text)
         |WITH (id = 'doc_id', analyzer = 'simple', key = '${TestSpark.sfDir}-documents-fullsimple')""".stripMargin)
    // after the full CREATE, an un-predicated query claims again
    val df = spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE ts_match(text, 'stream', 'simple')""".stripMargin)
    assert(udfsIn(df.queryExecution.optimizedPlan, "ts_match").isEmpty,
      "full index should serve the unpredicated query")
    // and re-creating the PARTIAL index must not steal the slot back
    Ddl.execute(spark, "DROP SEARCH INDEX docs_partial_idx")
    ensure()
    val df2 = spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE ts_match(text, 'stream', 'simple')""".stripMargin)
    assert(udfsIn(df2.queryExecution.optimizedPlan, "ts_match").isEmpty,
      "partial CREATE must not displace the full index's claim slot")
    Ddl.execute(spark, "DROP SEARCH INDEX docs_full_simple")
  }

  test("DESCRIBE surfaces the predicate; REFRESH stays inside it") {
    ensure()
    val desc = Ddl.execute(spark, "DESCRIBE SEARCH INDEX docs_partial_idx")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("predicate").exists(_.contains("lang")), s"got $desc")
    val before = spark.sql("SELECT count(*) FROM docs_partial_idx_docstats")
      .head().getLong(0)
    Ddl.execute(spark, "REFRESH SEARCH INDEX docs_partial_idx")
    val after = spark.sql("SELECT count(*) FROM docs_partial_idx_docstats")
      .head().getLong(0)
    assert(after == before,
      s"REFRESH must not pull out-of-predicate docs in: $before -> $after")
  }
}
