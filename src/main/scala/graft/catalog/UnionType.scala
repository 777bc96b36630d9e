package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DuckDB tagged UNION type re-expressed as a struct-with-tag
  * (SURVEY §1.2; reference simple/union.test, wrap_unsupported_types.cpp):
  * `UNION(num INTEGER, str VARCHAR)` stores as
  * `STRUCT<__utag: STRING, num: INT, str: STRING>` with exactly one
  * non-null member per row. The reserved `__utag` first field IS the union
  * marker — no catalog metadata needed, so CTAS-derived unions keep their
  * behavior. The reference renders the active member as text at the client
  * boundary (its WrapUnsupportedTypes cast); [[graft.plans.RenderUnions]]
  * is our analogue at the root of a user query plan. */
object UnionType {

  val Tag = "__utag"

  def isUnion(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.headOption.exists(f => f.name == Tag && f.dataType == StringType)
    case _ => false
  }

  def members(s: StructType): Seq[StructField] = s.fields.drop(1).toSeq

  /** Active member rendered as text — the client-boundary presentation. */
  def renderCol(c: Column, s: StructType): Column = {
    val tag = c.getField(Tag)
    members(s).foldRight(lit(null).cast(StringType)) { (f, acc) =>
      when(tag === f.name, c.getField(f.name).cast(StringType)).otherwise(acc)
    }
  }

  /** Which member an untagged incoming value coerces to: the first member
    * whose type category matches (pg/DuckDB pick the best implicit cast;
    * for the disjoint member types unions are used with, first-match is
    * that rule). */
  def memberFor(incoming: DataType, target: StructType): Option[StructField] = {
    val ms = members(target)
    def cat(dt: DataType): Int = dt match {
      case _: StringType => 1
      case _: NumericType => 2
      case _: BooleanType => 3
      case _: DateType | _: TimestampType => 4
      case _ => 5
    }
    ms.find(f => f.dataType == incoming)
      .orElse(ms.find(f => cat(f.dataType) == cat(incoming)))
      .orElse(ms.find(f => Cast.canCast(incoming, f.dataType)))
  }

  /** Coerce an arbitrary incoming column to the full union struct:
    * identical struct passes through; a struct-with-tag maps members by
    * NAME (absent ones null — the partial struct union_value builds); an
    * atomic value coerces into its matching member with the tag set. */
  def coerce(c: Column, incoming: DataType, target: StructType): Column = {
    val ms = members(target)
    def full(tag: Column, valueOf: StructField => Column): Column =
      struct((tag.as(Tag) +: ms.map(f => valueOf(f).cast(f.dataType).as(f.name))): _*)
    incoming match {
      case s: StructType if s == target => c
      case s: StructType if isUnion(s) =>
        full(c.getField(Tag),
          f => if (s.fieldNames.contains(f.name)) c.getField(f.name)
               else lit(null))
      case NullType => full(lit(null).cast(StringType), _ => lit(null))
      case other =>
        val m = memberFor(other, target).getOrElse(
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              s"no union member accepts a value of type ${other.simpleString}")))
        full(lit(m.name), f => if (f.name == m.name) c else lit(null))
    }
  }
}
