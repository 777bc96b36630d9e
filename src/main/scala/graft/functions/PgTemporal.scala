package graft.functions

import java.time.{Instant, LocalDateTime, ZoneId}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, TextStyle}
import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pg `expr AT TIME ZONE 'zone'` — the direction depends on the operand
  * type, exactly as in pg (reference surface:
  * tests/sqllogic/sdb/pg/simple/collate_timezone.test):
  *
  *  - naive TIMESTAMP (Spark TIMESTAMP_NTZ) → interpret the wall-clock in
  *    `zone`, producing the instant (Spark TIMESTAMP);
  *  - TIMESTAMPTZ (Spark TIMESTAMP, an instant) → the wall-clock of that
  *    instant in `zone` (Spark TIMESTAMP_NTZ).
  *
  * [[graft.search.PgDialect]] rewrites the keyword form to this call. A
  * DATE or STRING operand coerces through NTZ first (pg casts similarly).
  * Interpreted eval: zone conversion is never a scan hot path.
  */
case class AtTimeZone(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "at_time_zone"
  override def nullable: Boolean = true

  private lazy val naiveInput: Boolean = left.dataType match {
    case TimestampNTZType | StringType | DateType => true
    case TimestampType => false
    case other => throw new IllegalArgumentException(
      s"AT TIME ZONE requires a timestamp operand, got ${other.simpleString}")
  }

  override def dataType: DataType =
    if (naiveInput) TimestampType else TimestampNTZType

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val z = right.eval(input)
    if (v == null || z == null) return null
    val zone = ZoneId.of(z.toString)
    if (naiveInput) {
      val ntzMicros = left.dataType match {
        case TimestampNTZType => v.asInstanceOf[Long]
        case DateType => v.asInstanceOf[Int].toLong * 86400L * 1000000L
        case StringType =>
          DateTimeUtils.localDateTimeToMicros(
            LocalDateTime.parse(v.toString.trim.replace(" ", "T")))
      }
      val ldt = DateTimeUtils.microsToLocalDateTime(ntzMicros)
      DateTimeUtils.instantToMicros(ldt.atZone(zone).toInstant)
    } else {
      val instant = DateTimeUtils.microsToInstant(v.asInstanceOf[Long])
      DateTimeUtils.localDateTimeToMicros(
        LocalDateTime.ofInstant(instant, zone))
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** DuckDB `strptime(text, format)` with the %-code format language
  * (reference: collate_timezone.test parses `%Y-%m-%d %H:%M:%S.%g %Z`).
  * A format containing a zone code (%Z/%z) produces an instant
  * (TIMESTAMP); otherwise the naive TIMESTAMP_NTZ. The zone-abbreviation
  * text (%Z: `CST`, `EDT`, …) resolves against the US zones DuckDB's ICU
  * data prefers. The result type depends on the FORMAT, so the format
  * must be a literal (it always is in the corpus). */
case class Strptime(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "strptime"
  override def nullable: Boolean = true

  private lazy val fmtText: String = right match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case _ => throw new IllegalArgumentException(
      "strptime: format must be a string literal")
  }

  private lazy val zoned: Boolean =
    fmtText.contains("%Z") || fmtText.contains("%z")

  override def dataType: DataType =
    if (zoned) TimestampType else TimestampNTZType

  @transient private lazy val formatter: DateTimeFormatter =
    Strptime.build(fmtText)

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val parsed = formatter.parse(v.toString.trim)
    if (zoned) {
      val zdt = java.time.ZonedDateTime.from(parsed)
      DateTimeUtils.instantToMicros(zdt.toInstant)
    } else {
      DateTimeUtils.localDateTimeToMicros(LocalDateTime.from(parsed))
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object Strptime {
  /** North-American zone abbreviations are ambiguous; prefer the zones
    * DuckDB/ICU resolve them to. */
  private val preferredZones: java.util.Set[ZoneId] = Set(
    "America/Chicago", "America/New_York", "America/Denver",
    "America/Los_Angeles", "America/Anchorage", "Pacific/Honolulu",
    "Europe/London", "Europe/Paris", "Australia/Sydney", "Asia/Tokyo",
    "Asia/Kolkata", "UTC").map(ZoneId.of).asJava

  private[functions] def build(fmt: String): DateTimeFormatter = {
    val b = new DateTimeFormatterBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => b.appendPattern("yyyy")
          case 'y' => b.appendPattern("yy")
          case 'm' => b.appendPattern("MM")
          case 'd' => b.appendPattern("dd")
          case 'H' => b.appendPattern("HH")
          case 'I' => b.appendPattern("hh")
          case 'p' => b.appendPattern("a")
          case 'M' => b.appendPattern("mm")
          case 'S' => b.appendPattern("ss")
          case 'g' => b.appendPattern("SSS")    // duck milliseconds
          case 'f' => b.appendPattern("SSSSSS") // duck microseconds
          case 'j' => b.appendPattern("DDD")
          case 'Z' => b.appendZoneText(TextStyle.SHORT, preferredZones)
          case 'z' => b.appendPattern("xx")
          case 'b' => b.appendPattern("MMM")
          case 'B' => b.appendPattern("MMMM")
          case 'a' => b.appendPattern("EEE")
          case 'A' => b.appendPattern("EEEE")
          case '%' => b.appendLiteral('%')
          case other => throw new IllegalArgumentException(
            s"strptime: unsupported format code %$other")
        }
        i += 2
      } else { b.appendLiteral(c); i += 1 }
    }
    b.toFormatter(Locale.US)
  }
}
