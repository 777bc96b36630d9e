package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-12 semantic fixes: pg NULL-tolerant UNIQUE, CTAS with USING in
  * the query body, CASCADE-rollback view re-registration order,
  * EXPORT/IMPORT serial-width + generated-column round-trip, and the
  * closed-form distributed sequence block allocation. */
class AdviceFixSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def sql(q: String) = spark.sql(q).collect()

  test("UNIQUE admits multiple NULLs (pg NULL <> NULL)") {
    sql("CREATE TABLE afx_u (id INT PRIMARY KEY, tag TEXT UNIQUE)")
    sql("INSERT INTO afx_u VALUES (1, NULL), (2, NULL), (3, 'x')")
    assert(sql("SELECT count(*) AS n FROM afx_u").head.getLong(0) == 3)
    // another NULL appends fine; a duplicate non-NULL still errors
    sql("INSERT INTO afx_u VALUES (4, NULL)")
    val e = intercept[Exception](sql("INSERT INTO afx_u VALUES (5, 'x')"))
    assert(e.getMessage.contains("duplicate key"))
    // UPDATE moving a key column with >=2 NULLs present must not be refused
    sql("UPDATE afx_u SET tag = 'y' WHERE id = 3")
    assert(sql("SELECT tag FROM afx_u WHERE id = 3").head.getString(0) == "y")
    sql("DROP TABLE afx_u")
  }

  test("ON CONFLICT ignores NULL-keyed rows when checking double-update") {
    sql("CREATE TABLE afx_c (k INT UNIQUE, v TEXT)")
    sql("INSERT INTO afx_c VALUES (1, 'a')")
    // two NULL-key rows in one batch never conflict — both insert
    sql("INSERT INTO afx_c VALUES (NULL, 'n1'), (NULL, 'n2'), (1, 'b') " +
      "ON CONFLICT (k) DO UPDATE SET v = 'b'")
    assert(sql("SELECT count(*) AS n FROM afx_c").head.getLong(0) == 3)
    assert(sql("SELECT v FROM afx_c WHERE k = 1").head.getString(0) == "b")
    sql("DROP TABLE afx_c")
  }

  test("CTAS whose query contains JOIN ... USING stays in the catalog") {
    sql("CREATE TABLE afx_a (id INT, x TEXT)")
    sql("CREATE TABLE afx_b (id INT, y TEXT)")
    sql("INSERT INTO afx_a VALUES (1, 'ax'), (2, 'bx')")
    sql("INSERT INTO afx_b VALUES (1, 'ay')")
    sql("CREATE TABLE afx_j AS SELECT id, x, y FROM afx_a JOIN afx_b USING (id)")
    // catalog-managed: UPDATE (an ObjectCatalog-only verb) must work on it
    assert(ObjectCatalog.table("afx_j").isDefined)
    sql("UPDATE afx_j SET y = 'z' WHERE id = 1")
    assert(sql("SELECT y FROM afx_j").head.getString(0) == "z")
    sql("DROP TABLE afx_j"); sql("DROP TABLE afx_a"); sql("DROP TABLE afx_b")
  }

  test("ROLLBACK of DROP TABLE CASCADE restores base before dependent view") {
    sql("CREATE TABLE afx_rt (id INT)")
    sql("INSERT INTO afx_rt VALUES (7)")
    sql("CREATE VIEW afx_rv AS SELECT id FROM afx_rt")
    sql("BEGIN")
    sql("DROP TABLE afx_rt CASCADE")
    sql("ROLLBACK")
    assert(sql("SELECT id FROM afx_rv").head.getInt(0) == 7)
    sql("DROP TABLE afx_rt CASCADE")
  }

  test("EXPORT/IMPORT round-trips BIGSERIAL width and generated columns") {
    val dir = java.nio.file.Files.createTempDirectory("afx_exp").toString
    sql("CREATE TABLE afx_e (id BIGSERIAL PRIMARY KEY, v INT, " +
      "twice INT GENERATED ALWAYS AS (v * 2) STORED)")
    sql("INSERT INTO afx_e (v) VALUES (10), (20)")
    sql(s"EXPORT DATABASE '$dir'")
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "schema.sql")))
    assert(ddl.contains("BIGSERIAL"), ddl)
    assert(ddl.contains("GENERATED ALWAYS AS (v * 2) STORED"), ddl)
    sql("DROP TABLE afx_e")
    sql(s"IMPORT DATABASE '$dir'")
    val t = ObjectCatalog.table("afx_e").get
    assert(t.columns.find(_.name == "id").get.sparkType.equalsIgnoreCase("BIGINT"))
    assert(t.columns.find(_.name == "twice").get.generated.contains("v * 2"))
    // generated column still computes after import
    sql("INSERT INTO afx_e (v) VALUES (30)")
    assert(sql("SELECT twice FROM afx_e WHERE v = 30").head.getInt(0) == 60)
    sql("DROP TABLE afx_e")
  }

  test("sequence bulk block is closed-form and ids assign distributively") {
    sql("CREATE TABLE afx_s (id SERIAL, v INT)")
    // multi-partition insert: ids must be dense 1..n in __ord order
    sql("INSERT INTO afx_s (v) SELECT id AS v FROM range(1000)")
    val r = sql("SELECT min(id) AS a, max(id) AS b, count(DISTINCT id) AS c FROM afx_s").head
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) == (1, 1000, 1000L))
    sql("DROP TABLE afx_s")

    // closed form: a large reservation is instant and lands the counter
    sql("CREATE SEQUENCE afx_big")
    val s = ObjectCatalog.sequence("afx_big").get
    val t0 = System.nanoTime()
    val first = SequenceOps.nextBlock(s, 100000000L)
    assert(first == 1L)
    assert(SequenceOps.nextval(s) == 100000001L)
    assert((System.nanoTime() - t0) < 2e9, "block reservation not O(1)")
    sql("DROP SEQUENCE afx_big")

    // CYCLE wrap in closed form matches stepwise semantics
    sql("CREATE SEQUENCE afx_cyc MAXVALUE 5 CYCLE")
    val sc = ObjectCatalog.sequence("afx_cyc").get
    assert(SequenceOps.nextBlock(sc, 7) == 1L) // 1..5 then 1,2
    assert(SequenceOps.nextval(sc) == 3L)
    sql("DROP SEQUENCE afx_cyc")
  }
}
