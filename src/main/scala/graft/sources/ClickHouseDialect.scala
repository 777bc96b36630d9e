package graft.sources

import java.sql.Types
import java.util.Locale

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse JDBC dialect — the dialect-handling leg of the foreign-server
  * scan (reference attaches ClickHouse through an FDW,
  * /root/reference/third_party/duckdb_clickhouse pushdown tests; Spark
  * ships a Postgres dialect but none for ClickHouse, so without this an
  * attached ClickHouse URL gets ANSI quoting and type guesses that break
  * on `Nullable(...)`/unsigned types).
  *
  * Covers the read path (ClickHouse type names → Catalyst types, through
  * `Nullable`/`LowCardinality` wrappers), the write path (Catalyst →
  * ClickHouse DDL types), and backtick identifier quoting. Registered once
  * via [[ClickHouseDialect.register]] (GraftSession does it), after which
  * any `jdbc:clickhouse:` URL resolves here — there is no ClickHouse
  * server in this container, so the dialect is exercised at the unit level
  * (JdbcDialectSpec) exactly like Spark's own dialect suites.
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:clickhouse")

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** Unwrap `Nullable(T)` / `LowCardinality(T)` to the inner type name. */
  @annotation.tailrec
  private[sources] def unwrap(typeName: String): String = {
    val t = typeName.trim
    val m = "^(Nullable|LowCardinality)\\((.*)\\)$".r.findFirstMatchIn(t)
    m match {
      case Some(g) => unwrap(g.group(2))
      case None => t
    }
  }

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = unwrap(typeName) match {
    case "String" => Some(StringType)
    case t if t.startsWith("FixedString") => Some(StringType)
    case "UInt8" => Some(ShortType) // unsigned: widen so the range fits
    case "UInt16" => Some(IntegerType)
    case "UInt32" => Some(LongType)
    case "UInt64" => Some(DecimalType(20, 0))
    case "Int8" => Some(ByteType)
    case "Int16" => Some(ShortType)
    case "Int32" => Some(IntegerType)
    case "Int64" => Some(LongType)
    case "Float32" => Some(FloatType)
    case "Float64" => Some(DoubleType)
    case "Date" | "Date32" => Some(DateType)
    case t if t.startsWith("DateTime") => Some(TimestampType)
    case t if t.startsWith("Decimal(") =>
      "Decimal\\((\\d+)\\s*,\\s*(\\d+)\\)".r.findFirstMatchIn(t)
        .map(g => DecimalType(g.group(1).toInt, g.group(2).toInt))
    case "Bool" => Some(BooleanType)
    case "UUID" => Some(StringType)
    case _ => None // let Spark's JDBC-type fallback decide
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    case BooleanType => Some(JdbcType("Bool", Types.BOOLEAN))
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case DateType => Some(JdbcType("Date", Types.DATE))
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case d: DecimalType => Some(JdbcType(s"Decimal(${d.precision}, ${d.scale})", Types.DECIMAL))
    case _ => None
  }

  // ClickHouse TRUNCATE never cascades
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
