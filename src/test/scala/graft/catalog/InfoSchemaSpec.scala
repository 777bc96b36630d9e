package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** information_schema views resolve as two-part relations and reflect
  * catalog + RBAC state live (reference: server/pg/information_schema/,
  * rbac corpus isr_applicable_roles / xcat_applicable_enabled_roles). */
class InfoSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def sql(q: String) = spark.sql(q).collect()

  test("tables / columns / views / schemata reflect DDL") {
    sql("CREATE SCHEMA isch")
    sql("CREATE TABLE isch.orders (id BIGINT PRIMARY KEY, total DOUBLE, " +
      "note TEXT, created DATE)")
    sql("CREATE VIEW isch.totals AS SELECT id, total FROM isch.orders")

    assert(sql("SELECT table_name, table_type FROM information_schema.tables " +
      "WHERE table_schema = 'isch' ORDER BY table_name").map(r =>
      (r.getString(0), r.getString(1))).toSeq ==
      Seq(("orders", "BASE TABLE"), ("totals", "VIEW")))

    val cols = sql("SELECT column_name, ordinal_position, is_nullable, data_type " +
      "FROM information_schema.columns WHERE table_schema = 'isch' " +
      "AND table_name = 'orders' ORDER BY ordinal_position")
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(cols == Seq(
      ("id", 1, "NO", "bigint"),
      ("total", 2, "YES", "double precision"),
      ("note", 3, "YES", "text"),
      ("created", 4, "YES", "date")))

    assert(sql("SELECT view_definition FROM information_schema.views " +
      "WHERE table_name = 'totals'").head.getString(0)
      .contains("SELECT id, total FROM isch.orders"))
    assert(sql("SELECT schema_name FROM information_schema.schemata " +
      "WHERE schema_name = 'isch'").length == 1)

    // live: a drop disappears without any refresh call
    sql("DROP TABLE isch.orders CASCADE")
    assert(sql("SELECT * FROM information_schema.tables " +
      "WHERE table_schema = 'isch'").isEmpty)
    sql("DROP SCHEMA isch")
  }

  test("constraints and key_column_usage") {
    sql("CREATE TABLE isc_t (id INT PRIMARY KEY, code TEXT UNIQUE, " +
      "qty INT, CONSTRAINT isc_t_qty_check CHECK (qty >= 0))")
    val cons = sql("SELECT constraint_name, constraint_type FROM " +
      "information_schema.table_constraints WHERE table_name = 'isc_t' " +
      "ORDER BY constraint_name").map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cons == Seq(("isc_t_code_key", "UNIQUE"), ("isc_t_pkey", "PRIMARY KEY"),
      ("isc_t_qty_check", "CHECK")))
    assert(sql("SELECT column_name FROM information_schema.key_column_usage " +
      "WHERE constraint_name = 'isc_t_pkey'").head.getString(0) == "id")
    assert(sql("SELECT check_clause FROM information_schema.check_constraints " +
      "WHERE constraint_name = 'isc_t_qty_check'").head.getString(0) == "qty >= 0")
    sql("DROP TABLE isc_t")
  }

  test("roles and privileges views") {
    sql("CREATE TABLE isp_t (a INT, b INT)")
    sql("INSERT INTO isp_t VALUES (1, 2)")
    sql("CREATE ROLE isp_reader")
    sql("CREATE ROLE isp_admin")
    sql("GRANT isp_reader TO isp_admin")
    sql("GRANT SELECT ON isp_t TO isp_reader")

    assert(sql("SELECT grantee, role_name, is_grantable FROM " +
      "information_schema.applicable_roles WHERE grantee = 'isp_admin'")
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("isp_admin", "isp_reader", "NO")))

    val tp = sql("SELECT grantee, table_name, privilege_type, is_grantable " +
      "FROM information_schema.table_privileges WHERE grantee = 'isp_reader'")
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(tp == Seq(("isp_reader", "isp_t", "SELECT", "NO")), tp.toString)

    // enabled_roles follows SET ROLE (inheritance closure)
    sql("SET ROLE isp_admin")
    val enabled = sql("SELECT role_name FROM information_schema.enabled_roles " +
      "ORDER BY role_name").map(_.getString(0)).toSeq
    sql("RESET ROLE")
    assert(enabled == Seq("isp_admin", "isp_reader"))
    assert(sql("SELECT role_name FROM information_schema.enabled_roles").isEmpty)

    // column-scoped grant -> column_privileges rows, one per column
    sql("GRANT SELECT (a) ON isp_t TO isp_admin WITH GRANT OPTION")
    val cp = sql("SELECT grantee, column_name, privilege_type, is_grantable " +
      "FROM information_schema.column_privileges WHERE grantee = 'isp_admin'")
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(cp == Seq(("isp_admin", "a", "SELECT", "YES")), cp.toString)

    sql("DROP ROLE isp_admin"); sql("DROP ROLE isp_reader")
    sql("DROP TABLE isp_t")
  }
}
