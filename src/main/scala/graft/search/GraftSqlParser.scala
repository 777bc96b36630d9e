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
  override def parsePlan(sqlText: String): LogicalPlan =
    if (Ddl.handles(sqlText)) GraftDdlCommand(sqlText)
    else delegate.parsePlan(sqlText)

  // the interface DEFAULT drops the ParameterContext on the floor (it just
  // calls parsePlan), so named/positional parameters MUST forward to the
  // delegate's real override or spark.sql(text, args) stops binding
  override def parsePlanWithParameters(sqlText: String,
      parameterContext: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    if (Ddl.handles(sqlText)) GraftDdlCommand(sqlText)
    else delegate.parsePlanWithParameters(sqlText, parameterContext)

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
