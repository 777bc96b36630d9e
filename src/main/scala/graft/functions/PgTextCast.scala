package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `'{1,2,3}'::int[]` / `'[1,2,3]'::int[]` — string→LIST casts accepting
  * BOTH the PostgreSQL array text dialect (`{...}`, record elements
  * `"(a,b)"` with `\"`/`\\` escapes) and the DuckDB list text dialect
  * (`[...]`, struct elements `{'k': v}`), as the reference's cast layer
  * does (tests/sqllogic/sdb/pg/simple/array_cast_dialects.test; the
  * reference patched DuckDB's SplitStringList to accept `{` alongside
  * `[`).
  *
  * [[PgDialect]] routes a STRING-LITERAL operand of an array/struct cast
  * here (`from_pg_text('...','<ddl>')`); non-literal operands keep the
  * plain Spark cast. Literal-driven and never in a scan hot path, so
  * interpreted eval (CodegenFallback) is the right cost point.
  */
case class FromPgText(child: Expression, ddl: String)
    extends UnaryExpression with CodegenFallback {

  override lazy val dataType: DataType = DataType.fromDDL(ddl)
  override def nullable: Boolean = true
  override def prettyName: String = "from_pg_text"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PgListText.parse(v.toString, dataType)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Recursive-descent parser for pg array / duck list text into Catalyst
  * values. Both dialects in all positions; quoting rules per dialect:
  * pg uses `"..."` with backslash escapes, duck uses `'...'` with `''`. */
object PgListText {

  def parse(s: String, dt: DataType): Any = value(s.trim, dt)

  private def fail(s: String, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"""malformed ${dt.simpleString} text: "$s"""")

  private def value(s0: String, dt: DataType): Any = {
    val s = s0.trim
    dt match {
      case at: ArrayType => array(s, at)
      case st: StructType => struct(s, st)
      case _ => scalar(s, dt)
    }
  }

  private def array(s: String, at: ArrayType): Any = {
    if (s.isEmpty) return null
    val open = s.charAt(0)
    if (open != '{' && open != '[') fail(s, at)
    val close = if (open == '{') '}' else ']'
    if (s.last != close) fail(s, at)
    val inner = s.substring(1, s.length - 1).trim
    if (inner.isEmpty) return new GenericArrayData(Array.empty[Any])
    val items = splitTop(inner)
    new GenericArrayData(items.map { raw =>
      element(raw.trim, at.elementType)
    }.toArray)
  }

  /** One array element: quoted forms unwrap (then the INNER text parses per
    * the element type); unquoted NULL is SQL null. */
  private def element(raw: String, et: DataType): Any = {
    if (raw.isEmpty) return null
    if (raw.charAt(0) == '"') value(unquotePg(raw), et)
    else if (raw.charAt(0) == '\'') et match {
      case StringType => UTF8String.fromString(unquoteDuck(raw))
      case _ => value(unquoteDuck(raw), et)
    }
    else if (raw.equalsIgnoreCase("null")) null
    else value(raw, et)
  }

  private def struct(s: String, st: StructType): Any = {
    if (s.isEmpty) return null
    if (s.charAt(0) == '(') {
      // pg record text: positional, empty field = NULL, "..." quoting
      if (s.last != ')') fail(s, st)
      val fields = splitTop(s.substring(1, s.length - 1))
      if (fields.length != st.fields.length) fail(s, st)
      InternalRow.fromSeq(fields.zip(st.fields).map { case (raw0, f) =>
        val raw = raw0.trim
        if (raw.isEmpty) null
        else if (raw.charAt(0) == '"') value(unquotePg(raw), f.dataType)
        else value(raw, f.dataType)
      })
    } else if (s.charAt(0) == '{') {
      // duck struct text: {'k': v, ...} — by-name, missing field = NULL
      if (s.last != '}') fail(s, st)
      val pairs = splitTop(s.substring(1, s.length - 1)).map { p =>
        val i = topLevelColon(p)
        if (i < 0) fail(s, st)
        val key0 = p.substring(0, i).trim
        val key =
          if (key0.nonEmpty && (key0.charAt(0) == '\'' || key0.charAt(0) == '"'))
            key0.substring(1, key0.length - 1)
          else key0
        key.toLowerCase -> p.substring(i + 1).trim
      }.toMap
      InternalRow.fromSeq(st.fields.toSeq.map { f =>
        pairs.get(f.name.toLowerCase) match {
          case None => null
          case Some(raw) => element(raw, f.dataType)
        }
      })
    } else fail(s, st)
  }

  private def scalar(s: String, dt: DataType): Any = {
    if (s.isEmpty || s.equalsIgnoreCase("null")) return null
    val t =
      if (s.length >= 2 && s.charAt(0) == '\'' && s.last == '\'') unquoteDuck(s)
      else if (s.length >= 2 && s.charAt(0) == '"' && s.last == '"') unquotePg(s)
      else s
    dt match {
      case StringType => UTF8String.fromString(t)
      case IntegerType => t.trim.toInt
      case LongType => t.trim.toLong
      case ShortType => t.trim.toShort
      case ByteType => t.trim.toByte
      case DoubleType => t.trim.toDouble
      case FloatType => t.trim.toFloat
      case BooleanType => t.trim.toLowerCase match {
        case "t" | "true" | "yes" | "on" | "1" => true
        case "f" | "false" | "no" | "off" | "0" => false
        case _ => fail(s, dt)
      }
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(BigDecimal(t.trim), d.precision, d.scale)
      case DateType =>
        java.time.LocalDate.parse(t.trim).toEpochDay.toInt
      case TimestampType =>
        java.sql.Timestamp.valueOf(t.trim.replace("T", " ")).getTime * 1000L
      case _ => fail(s, dt)
    }
  }

  /** Split on top-level commas, respecting (), {}, [], pg `"` quoting
    * (backslash escapes) and duck `'` quoting (doubled-quote escapes). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var i = 0; var start = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          i += 1
          while (i < s.length && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\') i += 1
            i += 1
          }
        case '\'' =>
          i += 1
          var closed = false
          while (!closed && i < s.length) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
              else closed = true
            }
            if (!closed) i += 1
          }
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Index of the first top-level ':' (duck struct key separator). */
  private def topLevelColon(s: String): Int = {
    var depth = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var closed = false
          while (!closed && i < s.length) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
              else closed = true
            }
            if (!closed) i += 1
          }
        case '(' | '{' | '[' => depth += 1
        case ')' | '}' | ']' => depth -= 1
        case ':' if depth == 0 => return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** pg `"..."` quoting: `\"` and `\\` escapes. */
  private def unquotePg(raw: String): String = {
    val b = new StringBuilder
    var i = 1
    while (i < raw.length - 1) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length - 1) { b += raw.charAt(i + 1); i += 2 }
      else { b += c; i += 1 }
    }
    b.toString
  }

  /** duck `'...'` quoting: `''` escape. */
  private def unquoteDuck(raw: String): String =
    raw.substring(1, raw.length - 1).replace("''", "'")
}
