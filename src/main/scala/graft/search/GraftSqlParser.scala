package graft.search

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Session-parser extension making the index DDL first-class `spark.sql`
  * text — the reference extends the SQL grammar the same way (its parser
  * accepts `CREATE SEARCH INDEX` etc. as statements,
  * /root/reference/server/pg/commands/create_index.cpp), so a SQL-only
  * client can manage indexes without a library call. Statements [[Ddl]]
  * recognizes become an eagerly-executed command; every other string —
  * and every other parser entry point — delegates to the Spark parser
  * untouched. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  /** Shared front half of both plan entry points: the transaction-abort
    * gate (pg 25P02 — every statement but COMMIT/ROLLBACK is refused while
    * a block is aborted), then lazy catalog replay so a FRESH session's
    * very first `SELECT ... FROM t` resolves durable catalog objects (the
    * recovery corpus' restart step), then graft statement dispatch. */
  private def dispatch(sqlText0: String): Option[LogicalPlan] = {
    // pg expression spellings ([..] lists, ::T[n], <-> distances) rewrite
    // to Spark SQL text first, so both graft statements and plain Spark
    // SQL accept them (PgDialect is a no-op when none are present)
    val sqlText = PgDialect.rewrite(sqlText0)
    graft.catalog.Txn.gate(sqlText)
    if (!graft.catalog.ObjectCatalog.internal.value)
      org.apache.spark.sql.SparkSession.getActiveSession
        .foreach(graft.catalog.ObjectCatalog.ensureSession)
    if (Ddl.handles(sqlText)) Some(GraftDdlCommand(sqlText))
    else if (EsSql.handles(sqlText)) Some(GraftEsCommand(sqlText))
    else if (PgIndexDdl.handles(sqlText)) Some(GraftPgIndexCommand(sqlText))
    else if (graft.catalog.CatalogDdl.handles(sqlText))
      Some(GraftCatalogCommand(sqlText))
    else if (graft.catalog.DuckStatements.handles(sqlText))
      // `this` as the re-parse target so a rewritten/prepared statement
      // re-enters the full dispatch chain (a prepared PIVOT works)
      Some(graft.catalog.DuckStatements.plan(
        org.apache.spark.sql.SparkSession.active, this, sqlText))
    else None
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    dispatch(sqlText).getOrElse(delegate.parsePlan(PgDialect.rewrite(sqlText)))

  // the interface DEFAULT drops the ParameterContext on the floor (it just
  // calls parsePlan), so named/positional parameters MUST forward to the
  // delegate's real override or spark.sql(text, args) stops binding
  override def parsePlanWithParameters(sqlText: String,
      parameterContext: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    dispatch(sqlText).getOrElse(
      delegate.parsePlanWithParameters(PgDialect.rewrite(sqlText),
        parameterContext))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** The parsed form of a graft DDL statement: a leaf command executed
  * eagerly by Spark's command machinery (like native DDL), running the
  * same [[Ddl.execute]] the Scala API uses — one implementation, two
  * surfaces. */
case class GraftDdlCommand(sql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (Ddl.isShow(sql))
      Seq("index_name", "view", "text_col", "analyzer", "location")
        .map(n => AttributeReference(n, StringType, nullable = false)())
    else if (Ddl.isDescribe(sql))
      Seq("stat", "value")
        .map(n => AttributeReference(n, StringType, nullable = false)())
    else Seq(AttributeReference("result", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    Ddl.execute(spark, sql).collect().toSeq
}

/** pg-spelled index DDL (`CREATE INDEX ... USING inverted(...)` /
  * `DROP INDEX`) as an eager leaf command — same pattern as
  * [[GraftDdlCommand]]. */
/** `CALL es_*` lifecycle statements — one string column whose name the
  * verb fixes at parse time (acknowledged / mappings). */
case class GraftEsCommand(sql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = {
    // match the CALL verb itself, not a substring of the whole statement —
    // `CALL es_create_index('x_es_mapping', …)` is a legal index name and
    // must still ack (r15 ADVICE)
    val col =
      if ("""(?is)^\s*CALL\s+es_mapping\s*\(""".r.findFirstIn(sql).isDefined)
        "mappings"
      else "acknowledged"
    Seq(AttributeReference(col, StringType, nullable = false)())
  }
  override def run(spark: SparkSession): Seq[Row] =
    EsSql.execute(spark, sql).collect().toSeq
}

case class GraftPgIndexCommand(sql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    PgIndexDdl.execute(spark, sql).collect().toSeq
}

/** Catalog DDL/DML/txn statements as eagerly-executed leaf commands — the
  * same two-surface pattern as [[GraftDdlCommand]]. Output shape is fixed
  * at parse time: DML returns a `count` row (the sqllogic `statement count`
  * contract), SHOW <var> returns one column named after the variable,
  * everything else one `result` string. */
case class GraftCatalogCommand(sql: String) extends LeafRunnableCommand {
  import graft.catalog.CatalogDdl

  override val output: Seq[Attribute] =
    CatalogDdl.returningCols(sql) match {
      // RETURNING projects typed values; the command's schema is fixed at
      // parse time, so values render as strings (the pg text protocol
      // shape) under the clause's column names
      case Some(cols) =>
        cols.map(c => AttributeReference(c, StringType, nullable = true)())
      case None if CatalogDdl.isDml(sql) =>
        Seq(AttributeReference("count", org.apache.spark.sql.types.LongType,
          nullable = false)())
      case None => CatalogDdl.showVarName(sql) match {
        case Some(n) => Seq(AttributeReference(n, StringType, nullable = false)())
        case None => Seq(AttributeReference("result", StringType, nullable = false)())
      }
    }

  override def run(spark: SparkSession): Seq[Row] = {
    val df = CatalogDdl.execute(spark, sql)
    if (CatalogDdl.returningCols(sql).isDefined) {
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map(c => col(s"`$c`").cast("string")): _*)
        .collect().toSeq
    } else df.collect().toSeq
  }
}
