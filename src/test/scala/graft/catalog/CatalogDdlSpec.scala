package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** pg catalog semantics: dependency-tracked DROP RESTRICT/CASCADE,
  * sequences + SERIAL defaults, catalog-table DML with constraints,
  * transaction blocks, session variables, system views, and restart
  * recovery — the behaviors the reference's ddl/txn/recovery corpora pin. */
class CatalogDdlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark // catalog dir isolated by TestSpark

  private def sql(q: String) = spark.sql(q).collect()

  test("create table / insert / select / drop cascade with view dependency") {
    sql("CREATE TABLE cds_t (id INT, v TEXT)")
    assert(sql("INSERT INTO cds_t VALUES (1, 'a'), (2, 'b')").head.getLong(0) == 2)
    sql("CREATE VIEW cds_v AS SELECT id, v FROM cds_t")
    assert(sql("SELECT id, v FROM cds_v ORDER BY id").map(r =>
      (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))

    // RESTRICT refused while the view depends on the table
    val e = intercept[Exception](sql("DROP TABLE cds_t"))
    assert(e.getMessage.contains("cannot drop table cds_t because other objects depend on it"))
    val e2 = intercept[Exception](sql("DROP TABLE cds_t RESTRICT"))
    assert(e2.getMessage.contains("because other objects depend on it"))
    // data untouched by the refused drop
    assert(sql("SELECT count(*) FROM cds_t").head.getLong(0) == 2)

    sql("DROP TABLE cds_t CASCADE")
    assert(intercept[Exception](sql("SELECT * FROM cds_v")).getMessage != null)
    assert(intercept[Exception](sql("SELECT * FROM cds_t")).getMessage != null)
  }

  test("view-on-view chains drop in dependency order") {
    sql("CREATE TABLE cds_base (id INT)")
    sql("INSERT INTO cds_base VALUES (10), (20)")
    sql("CREATE VIEW cds_v1 AS SELECT id FROM cds_base")
    sql("CREATE VIEW cds_v2 AS SELECT id FROM cds_v1")
    assert(sql("SELECT id FROM cds_v2 ORDER BY id").map(_.getInt(0)).toSeq == Seq(10, 20))
    val e = intercept[Exception](sql("DROP VIEW cds_v1"))
    assert(e.getMessage.contains("cannot drop view cds_v1"))
    sql("DROP VIEW cds_v1 CASCADE") // drops v2 too
    assert(intercept[Exception](sql("SELECT * FROM cds_v2")).getMessage != null)
    sql("DROP TABLE cds_base")
  }

  test("sequences: start/increment/cycle, nextval/currval, serial defaults") {
    sql("CREATE SEQUENCE cds_serial START WITH 1 MAXVALUE 3 CYCLE")
    assert(sql("SELECT nextval('cds_serial') AS v").head.getLong(0) == 1)
    assert(sql("SELECT currval('cds_serial') AS v").head.getLong(0) == 1)
    assert(sql("SELECT nextval('cds_serial') AS v").head.getLong(0) == 2)
    assert(sql("SELECT nextval('cds_serial') AS v").head.getLong(0) == 3)
    assert(sql("SELECT nextval('cds_serial') AS v").head.getLong(0) == 1) // cycled
    sql("DROP SEQUENCE cds_serial")

    sql("CREATE SEQUENCE cds_cap START WITH 2 MAXVALUE 3")
    assert(sql("SELECT nextval('cds_cap') AS v").head.getLong(0) == 2)
    assert(sql("SELECT nextval('cds_cap') AS v").head.getLong(0) == 3)
    val e = intercept[Exception](sql("SELECT nextval('cds_cap') AS v"))
    assert(e.getMessage.contains("reached maximum value"))
    sql("DROP SEQUENCE cds_cap")

    // SERIAL: implicit owned sequence, gap-free block allocation per batch
    sql("CREATE TABLE cds_s (id SERIAL PRIMARY KEY, name TEXT)")
    sql("INSERT INTO cds_s (name) VALUES ('a'), ('b')")
    assert(sql("SELECT id, name FROM cds_s ORDER BY id").map(r =>
      (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))
    // owned sequence refuses a standalone drop
    val e3 = intercept[Exception](sql("DROP SEQUENCE cds_s_id_seq"))
    assert(e3.getMessage.contains("depend on it"))
    sql("DROP TABLE cds_s CASCADE")
    assert(ObjectCatalog.get("cds_s_id_seq").isEmpty) // dropped with its table
  }

  test("shared sequence default across schemas; DROP SCHEMA CASCADE strips defaults") {
    sql("CREATE SCHEMA cds_res")
    sql("CREATE SCHEMA cds_team_a")
    sql("CREATE SCHEMA cds_team_b")
    sql("CREATE SEQUENCE cds_res.shared_seq START 7000")
    sql("CREATE TABLE cds_team_a.cand (id INT DEFAULT nextval('cds_res.shared_seq'), note TEXT)")
    sql("CREATE TABLE cds_team_b.cand (id INT DEFAULT nextval('cds_res.shared_seq'), note TEXT)")
    sql("INSERT INTO cds_team_a.cand (note) VALUES ('a1')")
    sql("INSERT INTO cds_team_b.cand (note) VALUES ('b1')")

    val e = intercept[Exception](sql("DROP SCHEMA cds_res"))
    assert(e.getMessage.contains("cannot drop schema cds_res"))
    sql("DROP SCHEMA cds_res CASCADE")

    // tables survive with data; defaults now NULL
    sql("INSERT INTO cds_team_a.cand (note) VALUES ('a2')")
    val rows = sql("SELECT id, note FROM cds_team_a.cand ORDER BY note")
      .map(r => (if (r.isNullAt(0)) -1 else r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((7000, "a1"), (-1, "a2")))
    assert(sql("SELECT id FROM cds_team_b.cand").head.getInt(0) == 7001)
    sql("DROP SCHEMA cds_team_a CASCADE")
    sql("DROP SCHEMA cds_team_b CASCADE")
  }

  test("constraints: not-null and duplicate-key violations abort the insert") {
    sql("CREATE TABLE cds_pk (id INT PRIMARY KEY, v TEXT NOT NULL)")
    sql("INSERT INTO cds_pk VALUES (1, 'x')")
    val dup = intercept[Exception](sql("INSERT INTO cds_pk VALUES (1, 'y')"))
    assert(dup.getMessage.contains("duplicate key value violates unique constraint"))
    val nn = intercept[Exception](sql("INSERT INTO cds_pk VALUES (2, NULL)"))
    assert(nn.getMessage.contains("violates not-null constraint"))
    // failed inserts left nothing behind
    assert(sql("SELECT count(*) FROM cds_pk").head.getLong(0) == 1)
    sql("DROP TABLE cds_pk")
  }

  test("update/delete rewrite only matching files") {
    sql("CREATE TABLE cds_dml (id INT, grp TEXT, v INT)")
    sql("INSERT INTO cds_dml VALUES (1,'a',10),(2,'a',20)")
    sql("INSERT INTO cds_dml VALUES (3,'b',30),(4,'b',40)") // second file
    assert(sql("UPDATE cds_dml SET v = v + 1 WHERE grp = 'a'").head.getLong(0) == 2)
    assert(sql("SELECT sum(v) FROM cds_dml").head.getLong(0) == 11 + 21 + 30 + 40)
    assert(sql("DELETE FROM cds_dml WHERE id = 3").head.getLong(0) == 1)
    assert(sql("SELECT count(*) FROM cds_dml").head.getLong(0) == 3)
    // delete with no match touches nothing
    assert(sql("DELETE FROM cds_dml WHERE id = 99").head.getLong(0) == 0)
    sql("DROP TABLE cds_dml")
  }

  test("transaction block: rollback undoes DML and DDL; sequences keep gaps") {
    sql("CREATE TABLE cds_tx (id INT, v TEXT)")
    sql("INSERT INTO cds_tx VALUES (1, 'keep')")
    sql("BEGIN")
    sql("INSERT INTO cds_tx VALUES (2, 'tx')")
    sql("UPDATE cds_tx SET v = 'changed' WHERE id = 1")
    sql("CREATE TABLE cds_tx_new (x INT)")
    sql("INSERT INTO cds_tx_new VALUES (9)")
    assert(sql("SELECT count(*) FROM cds_tx").head.getLong(0) == 2)
    sql("ROLLBACK")
    assert(sql("SELECT v FROM cds_tx WHERE id = 1").head.getString(0) == "keep")
    assert(sql("SELECT count(*) FROM cds_tx").head.getLong(0) == 1)
    assert(intercept[Exception](sql("SELECT * FROM cds_tx_new")).getMessage != null)

    // commit keeps
    sql("BEGIN")
    sql("INSERT INTO cds_tx VALUES (3, 'kept')")
    sql("COMMIT")
    assert(sql("SELECT count(*) FROM cds_tx").head.getLong(0) == 2)
    sql("DROP TABLE cds_tx")
  }

  test("aborted block refuses statements until COMMIT/ROLLBACK; COMMIT becomes rollback") {
    sql("CREATE TABLE cds_ab (id INT)")
    sql("BEGIN")
    sql("INSERT INTO cds_ab VALUES (1)")
    intercept[Exception](sql("SELECT * FROM cds_no_such_table"))
    Txn.statementFailed() // the connection choke point reports the failure
    val e = intercept[Exception](sql("SELECT 1"))
    assert(e.getMessage.contains("current transaction is aborted"))
    val e2 = intercept[Exception](sql("INSERT INTO cds_ab VALUES (2)"))
    assert(e2.getMessage.contains("current transaction is aborted"))
    sql("COMMIT") // pg converts to rollback
    assert(sql("SELECT count(*) FROM cds_ab").head.getLong(0) == 0)
    sql("DROP TABLE cds_ab")
  }

  test("DROP TABLE inside a transaction restores table and data on rollback") {
    sql("CREATE TABLE cds_dt (id INT)")
    sql("INSERT INTO cds_dt VALUES (5), (6)")
    sql("BEGIN")
    sql("DROP TABLE cds_dt")
    assert(intercept[Exception](sql("SELECT * FROM cds_dt")).getMessage != null)
    Txn.statementFailed()
    sql("ROLLBACK")
    assert(sql("SELECT count(*) FROM cds_dt").head.getLong(0) == 2)
    sql("DROP TABLE cds_dt")
  }

  test("session variables: SET/SHOW/RESET and SET LOCAL transaction scope") {
    sql("SET cds_var = 'hello'")
    assert(sql("SHOW cds_var").head.getString(0) == "hello")
    sql("SET cds_var TO 'world'")
    assert(sql("SHOW cds_var").head.getString(0) == "world")
    sql("BEGIN")
    sql("SET LOCAL cds_var = 'inner'")
    assert(sql("SHOW cds_var").head.getString(0) == "inner")
    sql("COMMIT")
    assert(sql("SHOW cds_var").head.getString(0) == "world") // LOCAL reverted
    sql("RESET cds_var")
    assert(intercept[Exception](sql("SHOW cds_var")).getMessage
      .contains("unrecognized configuration parameter"))
    // engine knob mapping: the sdb spelling drives the real conf
    sql("SET sdb_levenshtein_max_terms = 5")
    assert(spark.conf.get("spark.graft.levenshteinMaxTerms") == "5")
    sql("RESET sdb_levenshtein_max_terms")
  }

  test("system views reflect the catalog") {
    sql("CREATE SCHEMA cds_sys")
    sql("CREATE TABLE cds_sys.t1 (id INT)")
    sql("CREATE VIEW cds_sys.v1 AS SELECT id FROM cds_sys.t1")
    sql("CREATE SEQUENCE cds_sys.s1 START 5")
    graft.catalog.SysCatalog.ensureFresh(spark)
    assert(sql("SELECT tablename FROM pg_tables WHERE schemaname='cds_sys'")
      .map(_.getString(0)).toSeq == Seq("t1"))
    assert(sql("SELECT viewname FROM pg_views WHERE schemaname='cds_sys'")
      .map(_.getString(0)).toSeq == Seq("v1"))
    assert(sql("SELECT start_value FROM pg_sequences WHERE sequencename='s1'")
      .head.getLong(0) == 5)
    assert(sql("SELECT nspname FROM pg_namespace WHERE nspname='cds_sys'").length == 1)
    sql("DROP SCHEMA cds_sys CASCADE")
    graft.catalog.SysCatalog.ensureFresh(spark)
    assert(sql("SELECT count(*) FROM pg_tables WHERE schemaname='cds_sys'")
      .head.getLong(0) == 0)
  }

  test("restart recovery: a fresh session replays the durable catalog") {
    sql("CREATE SCHEMA cds_rec")
    sql("CREATE TABLE cds_rec.t (id INT, v TEXT)")
    sql("INSERT INTO cds_rec.t VALUES (1, 'persisted')")
    sql("CREATE VIEW cds_rec.v AS SELECT v FROM cds_rec.t WHERE id = 1")
    sql("CREATE SEQUENCE cds_rec.s START 100")
    sql("SELECT nextval('cds_rec.s')")

    // simulate a process restart: drop session registrations + in-JVM state
    ObjectCatalog.internalSql(spark, "DROP DATABASE IF EXISTS cds_rec CASCADE")
    val keep = ObjectCatalog.baseDirOverride
    ObjectCatalog.reset()
    ObjectCatalog.baseDirOverride = keep

    // first statement of the "new session" resolves through the reloaded
    // catalog (ensureSession fires lazily from the parser)
    assert(sql("SELECT v FROM cds_rec.v").head.getString(0) == "persisted")
    // dependency graph survived: RESTRICT still refused
    val e = intercept[Exception](sql("DROP TABLE cds_rec.t"))
    assert(e.getMessage.contains("because other objects depend on it"))
    // sequence state survived (continues, not restarts)
    assert(sql("SELECT nextval('cds_rec.s') AS v").head.getLong(0) == 101)
    sql("DROP SCHEMA cds_rec CASCADE")
  }

  test("ALTER TABLE ADD COLUMN DEFAULT nextval fills existing rows in order") {
    sql("CREATE TABLE cds_alter (s VARCHAR)")
    sql("INSERT INTO cds_alter VALUES ('hello'), ('world')")
    sql("CREATE SEQUENCE cds_alter_seq START 1")
    sql("ALTER TABLE cds_alter ADD COLUMN id INTEGER DEFAULT nextval('cds_alter_seq')")
    assert(sql("SELECT s, id FROM cds_alter ORDER BY id").map(r =>
      (r.getString(0), r.getInt(1))).toSeq == Seq(("hello", 1), ("world", 2)))
    sql("ALTER TABLE cds_alter RENAME COLUMN id TO rid")
    assert(sql("SELECT rid FROM cds_alter ORDER BY rid").map(_.getInt(0)).toSeq == Seq(1, 2))
    sql("ALTER TABLE cds_alter DROP COLUMN rid")
    assert(sql("SELECT * FROM cds_alter").head.schema.fieldNames.toSeq == Seq("s"))
    sql("DROP TABLE cds_alter CASCADE")
    sql("DROP SEQUENCE cds_alter_seq")
  }

  test("enum range predicates compile to a pushable IN-set (EnumOrder)") {
    sql("DROP TYPE IF EXISTS cds_mood CASCADE")
    sql("CREATE TYPE cds_mood AS ENUM ('sad', 'ok', 'happy')")
    sql("CREATE TABLE cds_moods (id INT, m cds_mood)")
    sql("INSERT INTO cds_moods VALUES (1,'sad'),(2,'ok'),(3,'happy')")
    val df = spark.sql("SELECT id FROM cds_moods WHERE m > 'sad'")
    // the rewrite is a string IN-set, not an ordinal computation — the
    // predicate must reach the parquet scan as a pushed filter
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("IN (ok,happy)") || optimized.contains("m IN"),
      s"expected membership rewrite in:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [") &&
      physical.contains("In(m"), s"enum IN-set not pushed:\n$physical")
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    // enum-to-enum comparison compares positions
    sql("INSERT INTO cds_moods VALUES (4,'sad')")
    assert(spark.sql(
      "SELECT count(*) FROM cds_moods a JOIN cds_moods b ON a.id < b.id AND a.m < b.m")
      .head().getLong(0) == 3) // (1,2),(1,3),(2,3): sad<ok, sad<happy, ok<happy
    sql("DROP TABLE cds_moods CASCADE")
    sql("DROP TYPE cds_mood")
  }

  test("CTAS and function dependency tracking") {
    sql("CREATE TABLE cds_src (n INT)")
    sql("INSERT INTO cds_src VALUES (1), (2), (3)")
    sql("CREATE TABLE cds_copy AS SELECT n * 10 AS n10 FROM cds_src")
    assert(sql("SELECT sum(n10) FROM cds_copy").head.getLong(0) == 60)

    sql("CREATE FUNCTION cds_count() AS (SELECT count(*) FROM cds_src)")
    assert(sql("SELECT cds_count() AS c").head.getLong(0) == 3)
    val e = intercept[Exception](sql("DROP TABLE cds_src"))
    assert(e.getMessage.contains("because other objects depend on it"))
    sql("DROP TABLE cds_src CASCADE") // drops the function too
    assert(ObjectCatalog.get("cds_count").isEmpty)
    sql("DROP TABLE cds_copy")
  }
}
