package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** pg enum ORDER semantics over string-stored labels (reference
  * server/catalog/enum_type.cpp; any/pg/ddl/enum.test — `illness >
  * 'panicataka'` compares DECLARATION positions, not strings, and ORDER BY
  * an enum column sorts by position).
  *
  * Enum columns are physically strings; their declaration order rides the
  * relation's field METADATA (`graft.enum.labels`, attached when the
  * object catalog registers the table) into every resolved
  * AttributeReference. This rule then rewrites:
  *
  *  - `enumCol <op> 'label'` (and the flipped form) into a MEMBERSHIP test
  *    over the labels that ARE in range — `illness > 'panicataka'` becomes
  *    `illness IN ('depression','norma')`. String IN-sets are
  *    data-source-pushable, so the enum predicate still prunes at the
  *    parquet scan (an ordinal computation would not); an unknown label
  *    yields the pg-consistent empty result (`false`).
  *  - `enumColA <op> enumColB` into a comparison of positions
  *    (`array_position` over the label array — both sides computed).
  *  - `ORDER BY enumCol` into ordering by position, preserving
  *    direction/null placement (output column text is unchanged).
  *
  * Equality and IN keep native string semantics (labels are unique), so
  * they stay fully pushable untouched.
  */
case class EnumOrder(spark: SparkSession) extends Rule[LogicalPlan] {

  private def labelsOf(e: Expression): Option[Seq[String]] = e match {
    case a: AttributeReference if a.metadata.contains("graft.enum.labels") =>
      Some(a.metadata.getStringArray("graft.enum.labels").toSeq)
    case _ => None
  }

  private def litText(e: Expression): Option[String] = e match {
    case Literal(v, StringType) if v != null => Some(v.toString)
    case Cast(Literal(v, StringType), _, _, _) if v != null => Some(v.toString)
    case _ => None
  }

  private def position(labels: Seq[String], e: Expression): Expression =
    ArrayPosition(
      CreateArray(labels.map(l => Literal(org.apache.spark.unsafe.types.UTF8String
        .fromString(l), StringType))), e)

  /** Labels whose position satisfies `cmp` against the literal's position;
    * None when the literal is not a declared label (pg would error at
    * analysis — an empty match is the conservative result here). */
  private def inRange(labels: Seq[String], lit: String,
      cmp: (Int, Int) => Boolean): Option[Seq[String]] = {
    val i = labels.indexOf(lit)
    if (i < 0) None else Some(labels.zipWithIndex.collect {
      case (l, j) if cmp(j, i) => l
    })
  }

  private def membership(attr: Expression, keep: Seq[String]): Expression =
    if (keep.isEmpty) And(IsNotNull(attr), Literal.FalseLiteral)
    else In(attr, keep.map(l =>
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(l), StringType)))

  private def rewriteCmp(b: BinaryComparison): Option[Expression] = {
    val cmp: Option[(Int, Int) => Boolean] = b match {
      case _: GreaterThan => Some(_ > _)
      case _: GreaterThanOrEqual => Some(_ >= _)
      case _: LessThan => Some(_ < _)
      case _: LessThanOrEqual => Some(_ <= _)
      case _ => None // equality keeps string semantics
    }
    cmp.flatMap { c =>
      (labelsOf(b.left), labelsOf(b.right), litText(b.right), litText(b.left)) match {
        // enumCol <op> 'label'
        case (Some(labels), _, Some(l), _) =>
          Some(inRange(labels, l, c) match {
            case Some(keep) => membership(b.left, keep)
            case None => And(IsNotNull(b.left), Literal.FalseLiteral)
          })
        // 'label' <op> enumCol  (flip the comparison)
        case (_, Some(labels), _, Some(l)) =>
          Some(inRange(labels, l, (x, y) => c(y, x)) match {
            case Some(keep) => membership(b.right, keep)
            case None => And(IsNotNull(b.right), Literal.FalseLiteral)
          })
        // enumColA <op> enumColB: compare declaration positions
        case (Some(labels), Some(_), _, _) =>
          Some(b.withNewChildren(Seq(
            position(labels, b.left), position(labels, b.right))))
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      case b: BinaryComparison if rewriteCmp(b).isDefined => rewriteCmp(b).get
      case s @ SortOrder(child, _, _, _) if labelsOf(child).isDefined =>
        s.copy(child = position(labelsOf(child).get, child))
    }
}
