package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.types._

import ObjectCatalog.{ColumnDef, SequenceDef, TableDef, ViewDef}

/** SQL-standard `information_schema` views over the object catalog + RBAC
  * state — the BI-tool entry point the reference ships as a full pg
  * module (/root/reference/server/pg/information_schema/, and the views
  * its rbac corpus reads: tests/sqllogic/any/pg/rbac/cp_information_schema
  * .test, isr_applicable_roles.test, xcat_applicable_enabled_roles.test).
  *
  * Resolution is ANALYZER-TIME: [[relation]] materializes the requested
  * view as a [[LocalRelation]] snapshot of driver-side metadata the moment
  * an `information_schema.X` relation resolves (see
  * graft.plans.ResolveInformationSchema) — always current, no refresh
  * machinery, no registration, and inherently metadata-sized (these ARE
  * catalog heap projections in pg too; nothing here touches data files).
  */
object InfoSchema {

  val Catalog = "graft"

  /** pg data_type rendering of a column's declared spark type
    * (information_schema.columns.data_type uses pg's verbose names). */
  private def pgType(sparkType: String): String = {
    val t = sparkType.trim.toUpperCase(java.util.Locale.ROOT)
    if (t.startsWith("DECIMAL")) "numeric"
    else if (t.startsWith("ARRAY")) "ARRAY"
    else t match {
      case "INT" | "INTEGER" => "integer"
      case "BIGINT" | "LONG" => "bigint"
      case "SMALLINT" | "SHORT" => "smallint"
      case "TINYINT" | "BYTE" => "smallint" // pg has no int1
      case "STRING" | "TEXT" | "VARCHAR" => "text"
      case "DOUBLE" => "double precision"
      case "FLOAT" | "REAL" => "real"
      case "BOOLEAN" => "boolean"
      case "DATE" => "date"
      case "TIMESTAMP" | "TIMESTAMP_LTZ" => "timestamp without time zone"
      case "TIMESTAMP_NTZ" => "timestamp without time zone"
      case "BINARY" => "bytea"
      case other => other.toLowerCase(java.util.Locale.ROOT)
    }
  }

  private def yn(b: Boolean): String = if (b) "YES" else "NO"

  private def rel(schema: StructType, rows: Seq[Row]): LogicalPlan =
    LocalRelation.fromExternalRows(DataTypeUtils.toAttributes(schema), rows)

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  private def objs = ObjectCatalog.objects.values.toSeq.sortBy(_.qname)

  /** scan-root path -> (schema, table) for privilege views: RBAC grants
    * key by the scanned path; catalog tables resolve exactly, other roots
    * (indexed external views) render their last path segment. */
  private def rootName(root: String): (String, String) = {
    val byDir = objs.collectFirst {
      case t: TableDef if root == t.dir || root.startsWith(t.dir + "/") =>
        (t.schema, t.name)
    }
    byDir.getOrElse {
      val seg = root.stripSuffix("/").split("/").last
      ("public", seg.stripSuffix(".parquet"))
    }
  }

  /** Constraint rows shared by table_constraints / key_column_usage /
    * check_constraints: (cschema, cname, tschema, tname, ctype,
    * keyCol or null, checkClause or null). pg auto-names:
    * `<table>_pkey`, `<table>_<col>_key`, explicit CHECK names kept. */
  private def constraintRows: Seq[(String, String, String, String, String, String, String)] =
    objs.collect { case t: TableDef =>
      val pk = t.columns.filter(_.primaryKey).map(c =>
        (t.schema, s"${t.name}_pkey", t.schema, t.name, "PRIMARY KEY", c.name, null: String))
      val uq = t.columns.filter(c => c.unique && !c.primaryKey).map(c =>
        (t.schema, s"${t.name}_${c.name}_key", t.schema, t.name, "UNIQUE", c.name, null: String))
      val ck = t.checks.map { case (n, e) =>
        (t.schema, n, t.schema, t.name, "CHECK", null: String, e) }
      pk ++ uq ++ ck
    }.flatten

  /** Privilege rows: (grantee, tschema, tname, privilege, grantable,
    * column or null). Table-level SELECT grants emit one row with null
    * column; column grants one row per column (pg column_privileges). */
  private def privilegeRows: Seq[(String, String, String, String, String, String)] = {
    val sel = graft.search.Rbac.selectGrantRows.flatMap {
      case (root, role, cols, go) =>
        val (sch, tn) = rootName(root)
        cols match {
          case None => Seq((role, sch, tn, "SELECT", yn(go), null: String))
          case Some(cs) =>
            cs.toSeq.sorted.map(c => (role, sch, tn, "SELECT", yn(go), c))
        }
    }
    val wr = graft.search.Rbac.writeGrantRows.map { case (root, role, p) =>
      val (sch, tn) = rootName(root)
      (role, sch, tn, p.toUpperCase(java.util.Locale.ROOT), "NO", null: String)
    }
    (sel ++ wr).sortBy(r => (r._2, r._3, r._1, r._4, String.valueOf(r._6)))
  }

  /** The information_schema view named `name`, or None if unknown. */
  def relation(spark: SparkSession, name: String): Option[LogicalPlan] = {
    ObjectCatalog.ensureLoaded()
    val owner = "postgres"
    name match {
      case "information_schema_catalog_name" =>
        Some(rel(st("catalog_name" -> StringType), Seq(Row(Catalog))))

      case "schemata" =>
        val names = ("public" +: ObjectCatalog.schemas.keys.toSeq).distinct.sorted
        Some(rel(
          st("catalog_name" -> StringType, "schema_name" -> StringType,
            "schema_owner" -> StringType),
          names.map(n => Row(Catalog, n, owner))))

      case "tables" =>
        Some(rel(
          st("table_catalog" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "table_type" -> StringType),
          objs.collect {
            case t: TableDef => Row(Catalog, t.schema, t.name, "BASE TABLE")
            case v: ViewDef => Row(Catalog, v.schema, v.name, "VIEW")
          }))

      case "views" =>
        Some(rel(
          st("table_catalog" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "view_definition" -> StringType),
          objs.collect { case v: ViewDef => Row(Catalog, v.schema, v.name, v.sql) }))

      case "columns" =>
        val rows = objs.collect { case t: TableDef =>
          t.columns.zipWithIndex.map { case (c, i) =>
            Row(Catalog, t.schema, t.name, c.name, i + 1,
              c.default.orNull, yn(!(c.notNull || c.primaryKey)),
              pgType(c.sparkType))
          }
        }.flatten
        Some(rel(
          st("table_catalog" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "column_name" -> StringType,
            "ordinal_position" -> IntegerType, "column_default" -> StringType,
            "is_nullable" -> StringType, "data_type" -> StringType),
          rows))

      case "sequences" =>
        Some(rel(
          st("sequence_catalog" -> StringType, "sequence_schema" -> StringType,
            "sequence_name" -> StringType, "start_value" -> LongType,
            "increment" -> LongType, "cycle_option" -> StringType),
          objs.collect { case s: SequenceDef =>
            Row(Catalog, s.schema, s.name, s.start, s.inc, yn(s.cycle)) }))

      case "table_constraints" =>
        Some(rel(
          st("constraint_catalog" -> StringType, "constraint_schema" -> StringType,
            "constraint_name" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "constraint_type" -> StringType),
          constraintRows.map { case (cs, cn, ts, tn, ct, _, _) =>
            Row(Catalog, cs, cn, ts, tn, ct) }))

      case "key_column_usage" =>
        Some(rel(
          st("constraint_name" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "column_name" -> StringType,
            "ordinal_position" -> IntegerType),
          constraintRows.filter(_._6 != null).map { case (_, cn, ts, tn, _, col, _) =>
            Row(cn, ts, tn, col, 1) }))

      case "check_constraints" =>
        Some(rel(
          st("constraint_schema" -> StringType, "constraint_name" -> StringType,
            "check_clause" -> StringType),
          constraintRows.filter(_._7 != null).map { case (cs, cn, _, _, _, _, cl) =>
            Row(cs, cn, cl) }))

      case "enabled_roles" =>
        Some(rel(st("role_name" -> StringType),
          graft.search.Rbac.enabledRolesOf(spark).map(Row(_))))

      case "applicable_roles" =>
        Some(rel(
          st("grantee" -> StringType, "role_name" -> StringType,
            "is_grantable" -> StringType),
          graft.search.Rbac.membershipRows.map { case (m, r, admin) =>
            Row(m, r, yn(admin)) }))

      case "administrable_role_authorizations" =>
        Some(rel(
          st("grantee" -> StringType, "role_name" -> StringType,
            "is_grantable" -> StringType),
          graft.search.Rbac.membershipRows.collect { case (m, r, true) =>
            Row(m, r, "YES") }))

      case "table_privileges" =>
        Some(rel(
          st("grantor" -> StringType, "grantee" -> StringType,
            "table_catalog" -> StringType, "table_schema" -> StringType,
            "table_name" -> StringType, "privilege_type" -> StringType,
            "is_grantable" -> StringType),
          privilegeRows.filter(_._6 == null).map { case (g, ts, tn, p, go, _) =>
            Row(owner, g, Catalog, ts, tn, p, go) }))

      case "role_table_grants" =>
        // pg: table_privileges restricted to grants whose grantee is an
        // enabled role (or PUBLIC); a superuser session sees all of them
        val enabled = graft.search.Rbac.enabledRolesOf(spark).toSet
        val rows = privilegeRows.filter(_._6 == null).filter { r =>
          enabled.isEmpty || enabled.contains(r._1) || r._1 == "public" }
        Some(rel(
          st("grantor" -> StringType, "grantee" -> StringType,
            "table_schema" -> StringType, "table_name" -> StringType,
            "privilege_type" -> StringType, "is_grantable" -> StringType),
          rows.map { case (g, ts, tn, p, go, _) => Row(owner, g, ts, tn, p, go) }))

      case "column_privileges" =>
        Some(rel(
          st("grantor" -> StringType, "grantee" -> StringType,
            "table_schema" -> StringType, "table_name" -> StringType,
            "column_name" -> StringType, "privilege_type" -> StringType,
            "is_grantable" -> StringType),
          privilegeRows.filter(_._6 != null).map { case (g, ts, tn, p, go, c) =>
            Row(owner, g, ts, tn, c, p, go) }))

      case _ => None
    }
  }
}
