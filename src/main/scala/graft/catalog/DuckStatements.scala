package graft.catalog

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DuckDB-dialect STATEMENT forms the reference's SQL surface accepts as
  * whole statements (reference corpus: site_docs/sql/statements/pivot,
  * /unpivot, query_syntax/sample, query_syntax/prepared_statements.test,
  * cookbook/sql_features/query_and_query_table_functions.test). Each is a
  * pure TEXT REWRITE into the equivalent Spark SQL — the rewritten
  * statement goes back through the session parser, so Catalyst plans,
  * optimizes and executes it exactly like hand-written Spark SQL (the
  * dialect layer adds zero execution machinery):
  *
  *  - `PIVOT tbl ON cols [IN (..)] USING aggs [GROUP BY ..][ORDER BY ..]
  *    [LIMIT n]` → Spark's `SELECT * FROM (proj) PIVOT (aggs FOR cols IN
  *    (values))`. DuckDB auto-detects the pivoted values; we enumerate
  *    them with one DISTINCT query at plan time (the output's column list
  *    — inherently driver-sized for any sane pivot, exactly what DuckDB's
  *    own binder does).
  *  - `UNPIVOT tbl ON cols [EXCLUDE form] INTO NAME n VALUE v` → Spark's
  *    `UNPIVOT (v FOR n IN (cols))` clause (NULL rows dropped by both
  *    engines).
  *  - `.. USING SAMPLE n[%|PERCENT|ROWS] [(method[, seed])] [REPEATABLE
  *    (seed)]` → `TABLESAMPLE` over the prefix query. `n ROWS` maps to
  *    Spark's exact row sample; percentage forms keep Bernoulli
  *    per-row sampling semantics.
  *  - `PREPARE name AS stmt` / `EXECUTE name(args)` / `DEALLOCATE
  *    [PREPARE] name|ALL` — pg prepared statements. `?` positional and
  *    `$n` numbered placeholders are spliced OUTSIDE string literals with
  *    the (parenthesized) argument expression text, then the result goes
  *    back through the full session parser, so a prepared PIVOT or a
  *    prepared `query_table($1)` both work. Statements are per-JVM like
  *    the session-var store (single-session driver contract).
  */
object DuckStatements {

  // ---- statement recognizers ------------------------------------------------

  private val pivotRe = """(?is)^\s*PIVOT\s+(.*?)\s+ON\s+(.*)$""".r
  private val unpivotRe = """(?is)^\s*UNPIVOT\s+(.*?)\s+ON\s+(.*)$""".r
  private val prepareRe = """(?is)^\s*PREPARE\s+([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(.*?)\s*;?\s*$""".r
  private val executeRe =
    """(?is)^\s*EXECUTE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:\(\s*(.*?)\s*\))?\s*;?\s*$""".r
  private val deallocRe =
    """(?is)^\s*DEALLOCATE\s+(?:PREPARE\s+)?(ALL|[A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r
  private val sampleRe =
    """(?is)^(.*\S)\s+USING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*(%|PERCENT|ROWS)?\s*(?:\(\s*([A-Za-z]+)?\s*(?:,\s*(\d+))?\s*\))?\s*(?:REPEATABLE\s*\(\s*(\d+)\s*\))?\s*;?\s*$""".r

  def handles(sql: String): Boolean = sql match {
    case executeRe(name, _) if name.equalsIgnoreCase("IMMEDIATE") => false
    case pivotRe(_*) | unpivotRe(_*) | prepareRe(_*) | executeRe(_*) |
        deallocRe(_*) => true
    case sampleRe(_*) => true
    case _ => false
  }

  /** Parse-time entry: rewrite + re-parse through the delegate chain. */
  def plan(spark: SparkSession, parser: ParserInterface,
      sql: String): LogicalPlan = sql match {
    case prepareRe(name, stmt) =>
      DuckCommand(s"prepare:${name.toLowerCase(Locale.ROOT)}", stmt)
    case deallocRe(name) =>
      DuckCommand(s"deallocate:${name.toLowerCase(Locale.ROOT)}", "")
    case executeRe(name, args) =>
      parser.parsePlan(executeText(name, Option(args).getOrElse("")))
    case pivotRe(_*) => parser.parsePlan(rewritePivot(spark, sql))
    case unpivotRe(_*) => parser.parsePlan(rewriteUnpivot(spark, sql))
    case sampleRe(prefix, n, unit, method, seed1, seed2) =>
      parser.parsePlan(rewriteSample(prefix, n, Option(unit), Option(method),
        Option(seed1).orElse(Option(seed2))))
    case other => throw new IllegalArgumentException(s"not a duck statement: $other")
  }

  // ---- prepared statements ---------------------------------------------------

  /** name → statement text. Per-JVM, like SessionVars (the driver contract
    * is one session per process); DEALLOCATE ALL clears. */
  private val prepared = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[catalog] def runPrepare(name: String, stmt: String): String = {
    prepared.put(name, stmt)
    s"prepared $name"
  }

  private[catalog] def runDeallocate(name: String): String = {
    if (name == "all") { prepared.clear(); "deallocated all" }
    else if (prepared.remove(name) != null) s"deallocated $name"
    else throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" ->
        s"""prepared statement "$name" does not exist"""))
  }

  /** Splice EXECUTE arguments into the stored text: `$n` takes args(n-1),
    * bare `?` takes them left-to-right — both only OUTSIDE single-quoted
    * strings (pg treats $1 inside quotes as text). Each splice is the
    * parenthesized argument EXPRESSION text, so constants and simple
    * expressions both bind without a literal-rendering layer. */
  private def executeText(nameRaw: String, argsRaw: String): String = {
    val name = nameRaw.toLowerCase(Locale.ROOT)
    val stmt = Option(prepared.get(name)).getOrElse(
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" ->
          s"""prepared statement "$name" does not exist""")))
    val args = splitTopLevel(argsRaw).map(_.trim).filter(_.nonEmpty)
    val out = new StringBuilder
    var i = 0; var inStr = false; var positional = 0
    def arg(k: Int): String = {
      if (k < 0 || k >= args.length) throw new IllegalArgumentException(
        s"prepared statement $name: parameter ${k + 1} has no argument (got ${args.length})")
      "(" + args(k) + ")"
    }
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'') inStr = false
        i += 1
      } else c match {
        case '\'' => inStr = true; out.append(c); i += 1
        case '$' if i + 1 < stmt.length && stmt.charAt(i + 1).isDigit =>
          var j = i + 1
          while (j < stmt.length && stmt.charAt(j).isDigit) j += 1
          out.append(arg(stmt.substring(i + 1, j).toInt - 1))
          i = j
        case '?' =>
          out.append(arg(positional)); positional += 1; i += 1
        case _ => out.append(c); i += 1
      }
    }
    out.toString
  }

  // ---- PIVOT ------------------------------------------------------------------

  /** `PIVOT src ON c1 [IN (v..)], c2 USING agg1 [AS a], agg2 [GROUP BY g..]
    * [ORDER BY ..] [LIMIT n]`. The projection under Spark's PIVOT clause is
    * the group columns + pivot columns + the agg inputs, so Spark's
    * "group by everything else" matches DuckDB's explicit/implicit rows. */
  private def rewritePivot(spark: SparkSession, sql: String): String = {
    val (src, rest) = sourceAndRest(sql, "PIVOT")
    val m = """(?is)^(.*?)\s+USING\s+(.*?)(?:\s+GROUP\s+BY\s+(.*?))?(?:\s+ORDER\s+BY\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""".r
      .findFirstMatchIn(rest).getOrElse(throw new IllegalArgumentException(
        s"PIVOT needs ON .. USING ..: $sql"))
    val onPart = m.group(1); val usingPart = m.group(2)
    val groupBy = Option(m.group(3)); val orderBy = Option(m.group(4))
    val limit = Option(m.group(5))

    // ON items: `col` or `col IN (v1, v2, ..)`
    val onItems = splitTopLevel(onPart).map(_.trim).map { item =>
      """(?is)^([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*\((.*)\)\s*$""".r
        .findFirstMatchIn(item) match {
        case Some(mm) => (mm.group(1),
          Some(splitTopLevel(mm.group(2)).map(_.trim)))
        case None => (item, None)
      }
    }
    val onCols = onItems.map(_._1)

    // pivoted values: the IN lists' cartesian product when every ON column
    // has one, else ONE distinct scan (driver-sized: it IS the column list)
    val values: Seq[Seq[String]] =
      if (onItems.forall(_._2.isDefined))
        onItems.map(_._2.get).foldLeft(Seq(Seq.empty[String])) {
          (acc, vs) => acc.flatMap(row => vs.map(v => row :+ v))
        }
      else {
        // capped enumeration: pivot output columns are driver-sized by
        // construction, so past the cap the pivot column is almost surely
        // mis-typed (an id, a timestamp) — fail fast with a named error
        // instead of shuffling the full distinct set of a 100 TB table
        val cap = spark.conf.getOption("spark.graft.pivotMaxValues")
          .map(_.toInt).getOrElse(10000)
        val rows = spark.sql(
          s"SELECT DISTINCT ${onCols.mkString(", ")} FROM $src ORDER BY ${onCols.mkString(", ")}")
          .limit(cap + 1).collect()
        if (rows.length > cap) throw new IllegalArgumentException(
          s"PIVOT ON ${onCols.mkString(", ")} exceeds $cap distinct values " +
            "(spark.graft.pivotMaxValues); pivot columns must be low-cardinality " +
            "— add an IN (...) list or pivot a categorical column")
        rows.toSeq.map(_.toSeq.map {
          case null => "NULL"
          case s: String => "'" + s.replace("'", "''") + "'"
          case v => v.toString
        })
      }
    if (values.isEmpty) throw new IllegalArgumentException(
      s"PIVOT ON ${onCols.mkString(", ")}: no values to pivot")

    def colAlias(vs: Seq[String]): String =
      vs.map(_.stripPrefix("'").stripSuffix("'")).mkString("_")
    val inList = values.map { vs =>
      val tuple = if (vs.length == 1) vs.head else vs.mkString("(", ", ", ")")
      s"$tuple AS `${colAlias(vs)}`"
    }.mkString(", ")
    val forCols = if (onCols.length == 1) onCols.head
      else onCols.mkString("(", ", ", ")")

    val aggs = splitTopLevel(usingPart).map(_.trim)
    // agg inputs feed the inner projection (Spark groups by the REST)
    val aggInputs = aggs.flatMap(a =>
      """\(([^()]*)\)""".r.findAllMatchIn(a).flatMap(mm =>
        splitTopLevel(mm.group(1)).map(_.trim))
        .filter(s => s.matches("(?i)[A-Za-z_][A-Za-z0-9_]*") && !s.equalsIgnoreCase("*")))
    val proj = groupBy match {
      case Some(g) =>
        (splitTopLevel(g).map(_.trim) ++ onCols ++ aggInputs).distinct.mkString(", ")
      case None => "*"
    }
    val tail = orderBy.map(o => s" ORDER BY $o").getOrElse("") +
      limit.map(l => s" LIMIT $l").getOrElse("")
    s"SELECT * FROM (SELECT $proj FROM $src) PIVOT (${aggs.mkString(", ")} FOR $forCols IN ($inList))$tail"
  }

  // ---- UNPIVOT ---------------------------------------------------------------

  private def rewriteUnpivot(spark: SparkSession, sql: String): String = {
    val (src, rest) = sourceAndRest(sql, "UNPIVOT")
    val m = """(?is)^(.*?)\s+INTO\s+NAME\s+([A-Za-z_][A-Za-z0-9_]*)\s+VALUES?\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+ORDER\s+BY\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""".r
      .findFirstMatchIn(rest).getOrElse(throw new IllegalArgumentException(
        s"UNPIVOT needs ON .. INTO NAME n VALUE v: $sql"))
    val onPart = m.group(1).trim
    val nameCol = m.group(2); val valueCol = m.group(3)
    val orderBy = Option(m.group(4)); val limit = Option(m.group(5))

    // `COLUMNS(* EXCLUDE (a, b))` → every source column minus the excluded
    val cols: Seq[String] =
      """(?is)^COLUMNS\s*\(\s*\*\s*EXCLUDE\s*\((.*)\)\s*\)$""".r
        .findFirstMatchIn(onPart) match {
        case Some(mm) =>
          val excl = splitTopLevel(mm.group(1)).map(_.trim.toLowerCase(Locale.ROOT)).toSet
          spark.sql(s"SELECT * FROM $src LIMIT 0").columns.toSeq
            .filterNot(c => excl.contains(c.toLowerCase(Locale.ROOT)))
        case None => splitTopLevel(onPart).map(_.trim)
      }
    val tail = orderBy.map(o => s" ORDER BY $o").getOrElse("") +
      limit.map(l => s" LIMIT $l").getOrElse("")
    s"SELECT * FROM $src UNPIVOT ($valueCol FOR $nameCol IN (${cols.mkString(", ")}))$tail"
  }

  // ---- USING SAMPLE -----------------------------------------------------------

  /** DuckDB defaults: a bare number = ROWS (reservoir), `%`/PERCENT =
    * per-row Bernoulli-style sampling. Spark's `n ROWS` is an exact-count
    * sample and PERCENT is Bernoulli — the same contract the reference
    * corpus asserts (exact counts for ROWS, statement-ok for %). */
  private def rewriteSample(prefix: String, n: String, unit: Option[String],
      method: Option[String], seed: Option[String]): String = {
    val isRows = unit.forall(_.equalsIgnoreCase("ROWS")) &&
      !unit.exists(u => u == "%" || u.equalsIgnoreCase("PERCENT"))
    method.map(_.toLowerCase(Locale.ROOT)).foreach {
      case "bernoulli" | "system" | "reservoir" => ()
      case other => throw new IllegalArgumentException(
        s"unknown sampling method: $other")
    }
    val spec = if (isRows) s"${n.toDouble.toLong} ROWS" else s"$n PERCENT"
    val rep = seed.map(s => s" REPEATABLE ($s)").getOrElse("")
    // Spark's aliasedQuery grammar is `(query) sample? tableAlias` — the
    // sample clause must precede the alias
    s"SELECT * FROM ($prefix) TABLESAMPLE ($spec)$rep __graft_sample"
  }

  // ---- helpers ----------------------------------------------------------------

  /** The statement's source relation: either a balanced `( .. )` subquery
    * or a bare identifier, returning (sourceText, textAfterON). */
  private def sourceAndRest(sql: String, verb: String): (String, String) = {
    val t = sql.trim.replaceFirst(s"(?is)^$verb\\s+", "")
    if (t.startsWith("(")) {
      var depth = 0; var i = 0; var inStr = false
      while (i < t.length && (depth > 0 || i == 0)) {
        val c = t.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
        i += 1
      }
      val src = t.substring(0, i)
      val rest = t.substring(i).replaceFirst("(?is)^\\s*ON\\s+", "")
      (src, rest)
    } else {
      val m = """(?is)^(\S+)\s+ON\s+(.*)$""".r.findFirstMatchIn(t)
        .getOrElse(throw new IllegalArgumentException(s"$verb needs ON: $sql"))
      (m.group(1), m.group(2))
    }
  }

  /** Split on top-level commas (parens and single-quoted strings opaque). */
  private[catalog] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    val last = s.substring(start)
    if (last.trim.nonEmpty || start < s.length) out += last
    out.result().filter(_.trim.nonEmpty)
  }
}

/** PREPARE / DEALLOCATE as eagerly-executed leaf commands (EXECUTE is a
  * pure rewrite and never reaches here). */
case class DuckCommand(verb: String, payload: String)
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", org.apache.spark.sql.types.StringType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val msg = verb.split(":", 2) match {
      case Array("prepare", name) => DuckStatements.runPrepare(name, payload)
      case Array("deallocate", name) => DuckStatements.runDeallocate(name)
      case other => throw new IllegalStateException(s"bad duck verb: ${other.mkString(":")}")
    }
    Seq(org.apache.spark.sql.Row(msg))
  }
}
