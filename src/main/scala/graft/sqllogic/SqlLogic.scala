package graft.sqllogic

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** A sqllogictest runner over SparkSession — the same corpus shape as the
  * reference's primary test format (tests/sqllogic/README.md:1-38; 1,233
  * `.test` files run by a sqllogictest-rs runner against a live server).
  * Here the "server" is the SparkSession with the graft SQL surface
  * (SqlSurface functions + Ddl verbs) registered, so `.test` files exercise
  * CREATE SEARCH/VECTOR/SECONDARY INDEX, `ts_*` predicates, scorers and
  * plain SQL exactly as the reference files do over pg-wire.
  *
  * File format (the reference's simplified dialect):
  * {{{
  * statement ok
  * <sql, until blank line>
  *
  * statement error <optional expected-message substring>
  * <sql>
  *
  * expect-plan <substring>            # optional, attaches to the NEXT query
  * query
  * <sql>
  * ----
  * <tab-separated golden rows; first line is the column-name header>
  * }}}
  * `#` lines are comments; records are blank-line separated. `$TESTDATA`
  * in SQL text expands to the scale-factor directory under test.
  *
  * `expect-plan` is the Spark-appropriate analogue of the reference's
  * EXPLAIN ANALYZE goldens (e.g. secondary_index_point_lookup.test's
  * "Type: Index Scan" box): engine plan text is not portable, so the
  * assertion is a substring over the executed plan plus the scan
  * FileIndex class names (where claim rules like ClaimPkLookup leave
  * their mark).
  *
  * Value formatting: NULL for nulls, Scala `toString` for numerics (exact
  * for the integer-typed goldens the corpus uses), `[a, b]` for arrays —
  * golden files are produced by [[record]], so both sides share one
  * formatter. Ordering is the query's own ORDER BY (the corpus always
  * orders; there is no implicit rowsort).
  */
object SqlLogic {

  sealed trait Rec { def line: Int }
  final case class Statement(sql: String, expectError: Option[String],
      line: Int, expectCount: Option[Long] = None) extends Rec
  final case class Query(sql: String, expected: Seq[String],
      planExpect: Seq[String], line: Int) extends Rec
  /** The recovery corpus' crash+restart step (`connection after_crash`):
    * wipe every in-JVM catalog registration and reload from disk. */
  final case class Restart(line: Int) extends Rec
  /** `connection <name> [user=u password=p]` — run the NEXT record on the
    * named session, as the reference's multi-connection corpus does (291
    * files: txn visibility, rbac per-user enforcement; the directive is
    * repeated before every record it applies to — per-record scope, like
    * sqllogictest-rs). Each name lazily maps to its own SparkSession
    * (`newSession()` — shared catalog + data, private txn/var/role state,
    * mirroring pg's shared-server/per-connection split); `user=` sets that
    * session's role, modelling authentication. */
  final case class Connection(name: String, user: Option[String],
      line: Int) extends Rec

  final case class Failure(file: String, line: Int, message: String) {
    override def toString: String = s"$file:$line — $message"
  }

  def parse(content: String): Seq[Rec] = {
    val lines = content.split("\n", -1)
    val recs = ArrayBuffer.empty[Rec]
    var i = 0
    var pendingPlan = ArrayBuffer.empty[String]
    def collectSql(from: Int): (String, Int) = {
      var j = from
      val b = ArrayBuffer.empty[String]
      while (j < lines.length && lines(j).trim.nonEmpty && lines(j) != "----") {
        b += lines(j); j += 1
      }
      (b.mkString("\n"), j)
    }
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.isEmpty || l.startsWith("#")) { i += 1 }
      else if (l == "restart") { recs += Restart(i + 1); i += 1 }
      else if (l.startsWith("connection ")) {
        val parts = l.stripPrefix("connection ").trim.split("\\s+")
        val user = parts.drop(1).collectFirst {
          case p if p.startsWith("user=") => p.stripPrefix("user=") }
        recs += Connection(parts(0), user, i + 1); i += 1
      }
      else if (l.startsWith("expect-plan ")) {
        pendingPlan += l.stripPrefix("expect-plan ").trim; i += 1
      } else if (l == "statement ok" || l.startsWith("statement error") ||
          l.startsWith("statement count ")) {
        val expectErr =
          if (!l.startsWith("statement error")) None
          else Some(l.stripPrefix("statement error").trim)
        val expectCount =
          if (l.startsWith("statement count "))
            Some(l.stripPrefix("statement count ").trim.toLong)
          else None
        val (sql, j) = collectSql(i + 1)
        recs += Statement(sql, expectErr, i + 1, expectCount)
        i = j
      } else if (l == "query" || l.startsWith("query ")) {
        val (sql, j) = collectSql(i + 1)
        var k = j
        val expected = ArrayBuffer.empty[String]
        if (k < lines.length && lines(k) == "----") {
          k += 1
          while (k < lines.length && lines(k).nonEmpty) { expected += lines(k); k += 1 }
        }
        recs += Query(sql, expected.toSeq, pendingPlan.toSeq, i + 1)
        pendingPlan = ArrayBuffer.empty[String]
        i = k
      } else sys.error(s"sqllogic parse error at line ${i + 1}: $l")
    }
    recs.toSeq
  }

  def format(v: Any): String = v match {
    case null => "NULL"
    case s: String => s
    case a: scala.collection.Seq[_] => a.map(format).mkString("[", ", ", "]")
    case a: Array[_] => a.map(format).mkString("[", ", ", "]")
    case r: Row => r.toSeq.map(format).mkString("{", ", ", "}")
    case other => other.toString
  }

  /** UNION-typed output columns present as the ACTIVE MEMBER's text at the
    * client boundary — the reference's WrapUnsupportedTypes cast
    * (wrap_unsupported_types.cpp:40-45) happens on its pg-wire edge, and
    * this runner is ours. Internal plans (DML sources, CTAS bodies, stored
    * data) keep the tagged struct untouched. */
  private def presentUnions(df: DataFrame): DataFrame =
    if (!df.schema.exists(f => graft.catalog.UnionType.isUnion(f.dataType))) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case s: org.apache.spark.sql.types.StructType
            if graft.catalog.UnionType.isUnion(s) =>
          graft.catalog.UnionType.renderCol(df.col(s"`${f.name}`"), s).as(f.name)
        case _ => df.col(s"`${f.name}`")
      }
    }.toSeq: _*)

  private def rows(df0: DataFrame): Seq[String] = {
    val df = presentUnions(df0)
    df.columns.mkString("\t") +:
      df.collect().toSeq.map(_.toSeq.map(format).mkString("\t"))
  }

  /** Top-level ';' split (quote-aware) — the pg simple-protocol
    * multi-statement form (`BEGIN; SELECT 1; COMMIT;`,
    * any/pg/simple/multi_statement.test). The last statement's result is
    * the record's result. */
  private def splitStatements(sql: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inStr = false; var start = 0; var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == ';') { out += sql.substring(start, i); start = i + 1 }
      i += 1
    }
    out += sql.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def execute(spark: SparkSession, sql: String): DataFrame = {
    graft.search.SqlSurface.registerAll(spark)
    graft.catalog.CatalogDdl.registerFunctions(spark)
    graft.catalog.SysCatalog.ensureFresh(spark)
    try {
      val stmts = splitStatements(sql)
      stmts.map { s =>
        if (graft.search.Ddl.handles(s))
          graft.search.Ddl.execute(spark, s)
        else spark.sql(s) // CatalogDdl statements dispatch via the parser
      }.last
    } catch { case e: Throwable =>
      // a failed statement aborts an open transaction block (pg 25P02);
      // this runner is the reference corpus' connection choke point
      graft.catalog.Txn.statementFailedFor(spark)
      throw e
    }
  }

  private def planHaystack(df: DataFrame): String = {
    val scans = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.getClass.getName
          case other => other.getClass.getName
        }
    }
    df.queryExecution.executedPlan.toString + "\n" + scans.mkString("\n")
  }

  /** Run one file's content; returns accumulated failures (empty = pass). */
  def run(spark: SparkSession, name: String, content: String,
      testdata: String): Seq[Failure] = {
    val fails = ArrayBuffer.empty[Failure]
    val sessions = scala.collection.mutable.Map("default" -> spark)
    var next = spark // session for the NEXT record; reverts to default after
    def connect(cname: String, user: Option[String]): Unit = {
      next = sessions.getOrElseUpdate(cname, {
        val s = spark.newSession()
        graft.search.SqlSurface.registerAll(s)
        graft.catalog.CatalogDdl.registerFunctions(s)
        s
      })
      // authentication: the connection runs AS this role (pg session
      // authorization); absent user= the connection is the superuser
      user match {
        case Some(u) => next.conf.set(graft.search.Rbac.RoleConf, u.toLowerCase)
        case None => ()
      }
    }
    def take(): SparkSession = { val s = next; next = spark; s }
    parse(content.replace("$TESTDATA", testdata)).foreach {
      case Connection(cname, user, _) => connect(cname, user)
      case Restart(_) =>
        graft.catalog.ObjectCatalog.simulateRestart(take())
      case Statement(sql, None, line, expectCount) =>
        try {
          val rows = execute(take(), sql).collect()
          expectCount.foreach { want =>
            val got = rows.headOption.map(_.getLong(0)).getOrElse(-1L)
            if (got != want)
              fails += Failure(name, line, s"expected count $want, got $got")
          }
        } catch { case e: Exception =>
          fails += Failure(name, line, s"statement failed: ${e.getMessage}") }
      case Statement(sql, Some(substr), line, _) =>
        try {
          execute(take(), sql).collect()
          fails += Failure(name, line, "expected an error, statement succeeded")
        } catch { case e: Exception =>
          // match against the whole cause chain: Spark wraps UDF and task
          // failures, and the interesting message is usually the root cause
          val msg = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).take(10)
            .map(t => String.valueOf(t.getMessage)).mkString(" | ")
          if (substr.nonEmpty && !msg.contains(substr))
            fails += Failure(name, line,
              s"error message '${msg.take(300)}' does not contain '$substr'")
        }
      case Query(sql, expected, planExpect, line) =>
        try {
          val df = execute(take(), sql)
          val got = rows(df)
          if (got != expected)
            fails += Failure(name, line,
              s"result mismatch\n  expected: ${expected.mkString(" | ")}\n  got:      ${got.mkString(" | ")}")
          planExpect.foreach { needle =>
            // `!substr` asserts ABSENCE — how claim rewrites are pinned when
            // the claimed plan has no distinctive text of its own (e.g. the
            // ts_dict pushdown is visible only as the tokenize DISAPPEARING)
            if (needle.startsWith("!")) {
              if (planHaystack(df).contains(needle.drop(1)))
                fails += Failure(name, line,
                  s"plan must NOT contain '${needle.drop(1)}'")
            } else if (!planHaystack(df).contains(needle))
              fails += Failure(name, line, s"plan does not contain '$needle'")
          }
        } catch { case e: Exception =>
          fails += Failure(name, line, s"query failed: ${e.getMessage}") }
    }
    fails.toSeq
  }

  /** Record mode (the sqllogictest `--record` analogue): re-run every query
    * and splice its actual output into the golden section, returning the
    * completed file content. Statements and comments pass through. */
  def record(spark: SparkSession, content: String, testdata: String): String = {
    val out = ArrayBuffer.empty[String]
    val lines = content.split("\n", -1)
    var i = 0
    val sessions = scala.collection.mutable.Map("default" -> spark)
    var next = spark
    def take(): SparkSession = { val s = next; next = spark; s }
    while (i < lines.length) {
      val l = lines(i).trim
      if (l == "statement ok" || l.startsWith("statement error") ||
          l.startsWith("statement count ")) {
        out += lines(i); i += 1
        val sqlB = ArrayBuffer.empty[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          sqlB += lines(i); out += lines(i); i += 1
        }
        if (!l.startsWith("statement error"))
          execute(take(),
            sqlB.mkString("\n").replace("$TESTDATA", testdata)).collect()
        else
          try execute(take(),
            sqlB.mkString("\n").replace("$TESTDATA", testdata)).collect()
          catch { case _: Exception => () }
      } else if (l == "restart") {
        out += lines(i); i += 1
        graft.catalog.ObjectCatalog.simulateRestart(take())
      } else if (l.startsWith("connection ")) {
        out += lines(i); i += 1
        val parts = l.stripPrefix("connection ").trim.split("\\s+")
        next = sessions.getOrElseUpdate(parts(0), {
          val s = spark.newSession()
          graft.search.SqlSurface.registerAll(s)
          graft.catalog.CatalogDdl.registerFunctions(s)
          s
        })
        parts.drop(1).collectFirst {
          case p if p.startsWith("user=") => p.stripPrefix("user=") }
          .foreach(u => next.conf.set(graft.search.Rbac.RoleConf, u.toLowerCase))
      } else if (l == "query" || l.startsWith("query ")) {
        out += lines(i); i += 1
        val sqlB = ArrayBuffer.empty[String]
        while (i < lines.length && lines(i).trim.nonEmpty && lines(i) != "----") {
          sqlB += lines(i); out += lines(i); i += 1
        }
        // skip any stale golden
        if (i < lines.length && lines(i) == "----") {
          i += 1
          while (i < lines.length && lines(i).nonEmpty) i += 1
        }
        out += "----"
        out ++= rows(execute(take(),
          sqlB.mkString("\n").replace("$TESTDATA", testdata)))
      } else { out += lines(i); i += 1 }
    }
    out.mkString("\n").replaceAll("\n{3,}$", "\n")
  }

  /** CLI: `runMain graft.sqllogic.SqlLogicMain [--record] <dir-or-file> <testdata-dir>` */
  def main(args: Array[String]): Unit = {
    val rec = args.contains("--record")
    val rest = args.filterNot(_ == "--record")
    val (target, testdata) = (rest(0), rest(1))
    val spark = graft.GraftSession.local()
    val files = {
      val p = Paths.get(target)
      if (Files.isDirectory(p))
        Files.list(p).filter(_.toString.endsWith(".test")).sorted.toArray.toSeq
          .map(_.asInstanceOf[java.nio.file.Path])
      else Seq(p)
    }
    var failed = 0
    files.foreach { f =>
      val content = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      if (rec) {
        Files.write(f, record(spark, content, testdata)
          .getBytes(StandardCharsets.UTF_8))
        println(s"RECORDED ${f.getFileName}")
      } else {
        val fails = run(spark, f.getFileName.toString, content, testdata)
        if (fails.isEmpty) println(s"PASS ${f.getFileName}")
        else { failed += 1; println(s"FAIL ${f.getFileName}"); fails.foreach(x => println(s"  $x")) }
      }
    }
    if (failed > 0) sys.exit(1)
  }
}
