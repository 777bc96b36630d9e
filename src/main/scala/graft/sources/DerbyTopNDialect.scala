package graft.sources

import java.sql.Types
import java.util.Locale
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Derby dialect override restoring LIMIT pushdown correctness.
  *
  * Spark's built-in DerbyDialect returns an EMPTY `getLimitClause` (Derby
  * has no `LIMIT n` spelling) while the DSv2 scan builder still reports the
  * TopN as pushed — so `ORDER BY … LIMIT k` over a `JDBCTableCatalog` table
  * sorts remotely but streams the WHOLE table back, and Spark, believing
  * the push succeeded, applies no limit of its own (observed: 150 rows for
  * a LIMIT 10). Derby does support the SQL:2008 spelling
  * `FETCH FIRST n ROWS ONLY`, which is exactly what the reference's
  * foreign postgres scan pushes in its TopN test
  * (tests/sqllogic/sdb/pg/duckdb_postgres/topn_optional_pgscan.test_slow) —
  * registering this dialect (prepended, so it wins over the built-in)
  * makes the remote return k rows, the only shape that survives a large
  * remote table.
  */
object DerbyTopNDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(Locale.ROOT).startsWith("jdbc:derby")

  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""

  override def getOffsetClause(offset: Integer): String =
    if (offset > 0) s"OFFSET $offset ROWS" else ""

  // Type mappings mirror the built-in DerbyDialect (fully shadowed by
  // this registration): REAL reads as FLOAT; strings write as CLOB,
  // byte/short as SMALLINT, decimals capped at Derby's 31-digit max.
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    if (sqlType == Types.REAL) Some(FloatType) else None

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("CLOB", Types.CLOB))
    case ByteType | ShortType => Some(JdbcType("SMALLINT", Types.SMALLINT))
    case BooleanType => Some(JdbcType("BOOLEAN", Types.BOOLEAN))
    case t: DecimalType if t.precision > 31 =>
      Some(JdbcType(s"DECIMAL(31,${math.min(t.scale, 31)})", Types.DECIMAL))
    case _ => None
  }

  private val registered = new AtomicBoolean(false)

  /** Replace (not shadow) the built-in dialect: with both registered,
    * JdbcDialects.get wraps the matches in an AggregatedDialect whose
    * getLimitClause falls back to the DEFAULT `LIMIT n` — the one spelling
    * Derby rejects. Unregister the built-in first so this dialect is the
    * single match. */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) {
      JdbcDialects.unregisterDialect(JdbcDialects.get("jdbc:derby:probe"))
      JdbcDialects.registerDialect(this)
    }
}
