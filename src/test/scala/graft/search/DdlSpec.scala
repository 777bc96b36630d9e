package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** DDL statement semantics: create registers queryable index relations,
  * show lists the catalog, drop removes the segments, malformed input
  * fails loudly. */
class DdlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  test("create / show / drop lifecycle") {
    Tables.documents(spark, dir).limit(50).createOrReplaceTempView("ddl_spec_docs")
    val created = Ddl.execute(spark,
      "CREATE SEARCH INDEX spec_idx ON ddl_spec_docs (text) " +
        "WITH (id = 'doc_id', analyzer = 'whitespace', key = 'ddl-spec')")
    assert(created.collect().map(_.getString(0)).toSeq == Seq("created spec_idx"))

    // the index relations are live and consistent with a direct tokenization
    val dfTerms = spark.sql(
      "SELECT count(*) FROM spec_idx_termdict").collect()(0).getLong(0)
    assert(dfTerms > 0)

    val shown = Ddl.execute(spark, "SHOW SEARCH INDEXES")
    assert(shown.filter(shown("index_name") === "spec_idx").count() == 1)

    val dirPath = shown.filter(shown("index_name") === "spec_idx")
      .select("location").collect()(0).getString(0)
    Ddl.execute(spark, "DROP SEARCH INDEX spec_idx")
    assert(!new java.io.File(dirPath).exists())
    assert(Ddl.execute(spark, "SHOW SEARCH INDEXES")
      .filter(org.apache.spark.sql.functions.col("index_name") === "spec_idx")
      .count() == 0)

    // re-create under the same key must rebuild, not serve the dead cache
    Ddl.execute(spark,
      "CREATE SEARCH INDEX spec_idx ON ddl_spec_docs (text) " +
        "WITH (id = 'doc_id', analyzer = 'whitespace', key = 'ddl-spec')")
    assert(spark.sql("SELECT count(*) FROM spec_idx_termdict")
      .collect()(0).getLong(0) == dfTerms)
    Ddl.execute(spark, "DROP SEARCH INDEX spec_idx")
  }

  test("malformed statements fail loudly") {
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "CREATE SEARCH INDEX x ON v (c) WITH (analyzer = 'a')"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "DROP SEARCH INDEX never_created"))
    intercept[IllegalArgumentException](
      Ddl.execute(spark, "ALTER SEARCH INDEX x"))
  }
}
