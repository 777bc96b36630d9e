package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** pg scopes transaction blocks and SET variables per CONNECTION
  * (server/network/pg/pg_wire_session.h); the Spark analogue is per
  * SparkSession. Two sessions over one JVM/SparkContext must interleave
  * BEGIN/SET/ROLLBACK with no cross-talk. */
class SessionIsolationSpec extends AnyFunSuite {

  private lazy val s1 = TestSpark.spark
  private lazy val s2 = {
    val s = s1.newSession()
    graft.search.SqlSurface.registerAll(s)
    CatalogDdl.registerFunctions(s)
    s
  }

  test("SET variables do not leak across sessions") {
    s1.sql("SET application_name = 'alpha'")
    s2.sql("SET application_name = 'beta'")
    assert(s1.sql("SHOW application_name").head.getString(0) == "alpha")
    assert(s2.sql("SHOW application_name").head.getString(0) == "beta")
    s1.sql("RESET application_name")
    assert(s2.sql("SHOW application_name").head.getString(0) == "beta")
    s2.sql("RESET application_name")
  }

  test("interleaved transaction blocks are independent") {
    s1.sql("CREATE TABLE iso_t1 (v INT)")
    s1.sql("INSERT INTO iso_t1 VALUES (1)")

    // s1 opens a block and mutates; s2 is NOT in a block — its statements
    // run and commit immediately, and s1's rollback does not undo them
    s1.sql("BEGIN")
    s1.sql("INSERT INTO iso_t1 VALUES (2)")
    assert(Txn.currentFor(s1) == Txn.Active)
    assert(Txn.currentFor(s2) == Txn.Idle)

    s2.sql("CREATE TABLE iso_t2 (v INT)")
    s2.sql("INSERT INTO iso_t2 VALUES (10)")

    // a failure in s2 must not abort s1's open block
    intercept[Exception](s2.sql("INSERT INTO iso_t2 VALUES (bad_col)"))
    assert(Txn.currentFor(s1) == Txn.Active)

    s1.sql("ROLLBACK")
    assert(s1.sql("SELECT count(*) FROM iso_t1").head.getLong(0) == 1)
    // s2's table survived s1's rollback
    assert(s2.sql("SELECT count(*) FROM iso_t2").head.getLong(0) == 1)

    // aborted state gates only its own session
    s2.sql("BEGIN")
    intercept[Exception](s2.sql("DROP TABLE iso_does_not_exist RESTRICT"))
    assert(Txn.currentFor(s2) == Txn.Aborted)
    val e = intercept[Exception](s2.sql("SELECT 1"))
    assert(e.getMessage.contains("current transaction is aborted"))
    assert(s1.sql("SELECT 1 AS one").head.getInt(0) == 1) // s1 unaffected
    s2.sql("ROLLBACK")

    s1.sql("DROP TABLE iso_t1")
    s2.sql("DROP TABLE iso_t2")
  }

  test("SET LOCAL reverts in its own session only") {
    s1.sql("SET myvar = 'keep1'")
    s2.sql("SET myvar = 'keep2'")
    s1.sql("BEGIN")
    s1.sql("SET LOCAL myvar = 'inblock'")
    assert(s1.sql("SHOW myvar").head.getString(0) == "inblock")
    assert(s2.sql("SHOW myvar").head.getString(0) == "keep2")
    s1.sql("COMMIT")
    assert(s1.sql("SHOW myvar").head.getString(0) == "keep1")
    assert(s2.sql("SHOW myvar").head.getString(0) == "keep2")
    s1.sql("RESET myvar"); s2.sql("RESET myvar")
  }
}
