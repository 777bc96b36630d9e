package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables

/** RBAC slice of the reference (optimizer/rbac.{h,cpp}; rbac corpus):
  * roles, SELECT grants, membership, SET ROLE — and the two contracts the
  * reference pins: deny-by-default for a set role, and enforcement that
  * survives optimizer manipulation (enf_disable_optimizer_bypass.test) —
  * here: the check fires on CLAIMED plans whose base scan was replaced by
  * index-artifact reads. */
class RbacSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def sql(s: String) = Ddl.execute(spark, s)

  private def denied(f: => Any): Boolean =
    try { f; false }
    catch {
      case e: Exception =>
        e.getMessage != null && e.getMessage.contains("permission denied")
    }

  private def withRole[A](role: String)(f: => A): A = {
    sql(s"SET ROLE $role")
    try f finally sql("RESET ROLE")
  }

  test("deny before grant, allow after, deny again after revoke") {
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    sql("CREATE ROLE reader1")
    assert(withRole("reader1")(denied(
      spark.table("graft_documents").count())), "must deny before grant")
    sql("GRANT SELECT ON graft_documents TO reader1")
    val n = withRole("reader1")(spark.table("graft_documents").count())
    assert(n > 0, "grant must open the table")
    sql("REVOKE SELECT ON graft_documents FROM reader1")
    assert(withRole("reader1")(denied(
      spark.table("graft_documents").count())), "revoke must close it again")
  }

  test("membership: a grant to a group role flows to its members") {
    Tables.orders(spark, TestSpark.sfDir).createOrReplaceTempView("graft_orders")
    sql("CREATE ROLE analysts")
    sql("CREATE ROLE bob")
    sql("GRANT SELECT ON graft_orders TO analysts")
    assert(withRole("bob")(denied(spark.table("graft_orders").count())))
    sql("GRANT analysts TO bob")
    assert(withRole("bob")(spark.table("graft_orders").count()) > 0)
  }

  test("a claimed index plan is as protected as its table (optimizer-bypass proof)") {
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    sql(s"""CREATE SEARCH INDEX rbac_docs_idx ON graft_documents (text)
           |WITH (id = 'doc_id', analyzer = 'whitespace',
           |      key = '${TestSpark.sfDir}-documents')""".stripMargin)
    sql("CREATE ROLE searcher")
    // the claimed plan reads index segments, not documents.parquet — the
    // enforcement must map those artifact scans back to the table
    val q = () => spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE ts_match(text, 'vector', 'whitespace')""".stripMargin).count()
    assert(withRole("searcher")(denied(q())),
      "claimed index reads must still be denied without a grant")
    sql("GRANT SELECT ON graft_documents TO searcher")
    assert(withRole("searcher")(q()) > 0)
    sql("REVOKE SELECT ON graft_documents FROM searcher")
  }

  test("SET ROLE on an unknown role fails; superuser (no role) unrestricted") {
    assertThrows[IllegalArgumentException](sql("SET ROLE no_such_role"))
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    assert(spark.table("graft_documents").count() > 0)
  }
}
