package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import ObjectCatalog.{FunctionDef, SequenceDef, TableDef, ViewDef}

/** pg_catalog introspection: the system views and functions the reference's
  * system corpus drives (tests/sqllogic/any/pg/system/ *.test,
  * sdb/pg/system/ *.test — pg_tables/pg_views/pg_namespace/pg_settings,
  * current_database()/current_schema()/version(), pg_typeof, and the rbac
  * catalogs pg_roles/pg_auth_members the cat_* tests read).
  *
  * Each view is a tiny LocalRelation snapshot of driver-side catalog state
  * (these ARE metadata tables — pg materializes them from its catalog heap
  * the same way). They re-register only when a catalog/rbac/vars version
  * counter moved, so per-statement freshness checks are a long compare,
  * not eight view rebuilds.
  */
object SysCatalog {

  private val lastVersion =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Long]())

  private def stamp(spark: SparkSession): Long =
    ObjectCatalog.versionCounter * 1000003L ^
      graft.search.Rbac.stateVersion * 31L ^ SessionVars.varsVersion ^
      graft.search.PgIndexDdl.stateVersion * 131L

  def ensureFresh(spark: SparkSession): Unit = {
    val v = stamp(spark)
    val prev = lastVersion.get(spark)
    if (prev != null && prev == v) return
    refresh(spark)
    lastVersion.put(spark, v)
  }

  private def mkView(spark: SparkSession, name: String, schema: StructType,
      rows: Seq[Row]): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema).createOrReplaceTempView(name)
  }

  def refresh(spark: SparkSession): Unit = {
    ObjectCatalog.ensureLoaded()
    val objs = ObjectCatalog.objects.values.toSeq.sortBy(_.qname)

    mkView(spark, "pg_namespace",
      StructType(Seq(StructField("nspname", StringType, false))),
      ("public" +: ObjectCatalog.schemas.keys.toSeq).distinct.sorted.map(Row(_)))

    mkView(spark, "pg_tables",
      StructType(Seq(
        StructField("schemaname", StringType, false),
        StructField("tablename", StringType, false),
        StructField("tableowner", StringType, false))),
      objs.collect { case t: TableDef => Row(t.schema, t.name, currentUser(spark)) })

    mkView(spark, "pg_views",
      StructType(Seq(
        StructField("schemaname", StringType, false),
        StructField("viewname", StringType, false),
        StructField("definition", StringType, false))),
      objs.collect { case v: ViewDef => Row(v.schema, v.name, v.sql) })

    mkView(spark, "pg_sequences",
      StructType(Seq(
        StructField("schemaname", StringType, false),
        StructField("sequencename", StringType, false),
        StructField("start_value", LongType, false),
        StructField("increment_by", LongType, false),
        StructField("cycle", BooleanType, false),
        StructField("last_value", LongType, true))),
      objs.collect { case s: SequenceDef =>
        Row(s.schema, s.name, s.start, s.inc, s.cycle,
          SequenceOps.lastValue(s.file).map(java.lang.Long.valueOf).orNull)
      })

    // pg_class + pg_index: enough of pg's relation catalog for the index
    // corpus' introspection join (`pg_index.indexrelid = pg_class.oid`,
    // sdb/pg/index/basic.test). oids are stable name hashes — pg's are
    // allocation-order ints, but no test depends on the values, only on
    // the join lining up.
    def oid(qname: String): Long =
      (scala.util.hashing.MurmurHash3.stringHash(qname) & 0x7fffffffL) + 16384L
    val pgIdx = graft.search.PgIndexDdl.catalogRows
    // access methods: this engine's two index families (the reloptions
    // corpus joins pg_class.relam -> pg_am; inverted_index_options.test)
    val amOid = Map("inverted" -> 9001L, "secondary" -> 9002L)
    mkView(spark, "pg_am",
      StructType(Seq(
        StructField("oid", LongType, false),
        StructField("amname", StringType, false))),
      amOid.toSeq.sortBy(_._2).map { case (n, o) => Row(o, n) })
    val classRows =
      objs.collect {
        case t: TableDef => Row(oid(t.qname), t.name, "r", null, null)
        case v: ViewDef => Row(oid(v.qname), v.name, "v", null, null)
        case s: SequenceDef => Row(oid(s.qname), s.name, "S", null, null)
      } ++ pgIdx.map { r =>
        Row(oid(s"idx:${r.name}"), r.name, "i",
          java.lang.Long.valueOf(amOid(r.am)), r.reloptions)
      }
    mkView(spark, "pg_class",
      StructType(Seq(
        StructField("oid", LongType, false),
        StructField("relname", StringType, false),
        StructField("relkind", StringType, false),
        StructField("relam", LongType, true),
        StructField("reloptions", StringType, true))),
      classRows)
    // indisunique/indisvalid render as pg's text bools (`t`/`f`) — the
    // corpus reads them as output cells, never as predicates
    mkView(spark, "pg_index",
      StructType(Seq(
        StructField("indexrelid", LongType, false),
        StructField("indrelid", LongType, false),
        StructField("indisunique", StringType, false),
        StructField("indisvalid", StringType, false))),
      pgIdx.map { r =>
        Row(oid(s"idx:${r.name}"), oid(ObjectCatalog.qualify(r.table)),
          if (r.unique) "t" else "f", "t")
      })

    mkView(spark, "pg_proc_graft",
      StructType(Seq(
        StructField("schemaname", StringType, false),
        StructField("proname", StringType, false),
        StructField("prosrc", StringType, false))),
      objs.collect { case f: FunctionDef => Row(f.schema, f.name, f.body) })

    mkView(spark, "pg_roles",
      StructType(Seq(
        StructField("rolname", StringType, false),
        StructField("rolinherit", BooleanType, false),
        StructField("rolcanlogin", BooleanType, false))),
      graft.search.Rbac.roleRows.map { case (n, inh) => Row(n, inh, true) })

    mkView(spark, "pg_auth_members",
      StructType(Seq(
        StructField("member", StringType, false),
        StructField("roleid", StringType, false),
        StructField("admin_option", BooleanType, false))),
      graft.search.Rbac.membershipRows.map { case (m, r, a) => Row(m, r, a) })

    mkView(spark, "pg_description",
      StructType(Seq(
        StructField("objtype", StringType, false),
        StructField("objname", StringType, false),
        StructField("description", StringType, false))),
      ObjectCatalog.comments.toSeq.sorted.map { case (k, v) =>
        val Array(kind, name) = k.split(":", 2)
        Row(kind, name, v)
      })

    mkView(spark, "pg_type",
      StructType(Seq(
        StructField("typname", StringType, false),
        StructField("typcategory", StringType, false),
        StructField("enumlabels", ArrayType(StringType), true))),
      objs.collect { case e: ObjectCatalog.EnumDef =>
        Row(e.name, "E", e.labels)
      })

    mkView(spark, "pg_constraint",
      StructType(Seq(
        StructField("conname", StringType, false),
        StructField("contype", StringType, false),
        StructField("conrelid", StringType, false))),
      objs.collect { case t: TableDef =>
        t.checks.map { case (n, _) => Row(n, "c", t.name) } ++
          t.columns.filter(_.primaryKey).map(c => Row(s"${t.name}_pkey", "p", t.name)) ++
          t.columns.filter(c => c.unique && !c.primaryKey)
            .map(c => Row(s"${t.name}_${c.name}_key", "u", t.name))
      }.flatten)

    mkView(spark, "pg_settings",
      StructType(Seq(
        StructField("name", StringType, false),
        StructField("setting", StringType, false))),
      SessionVars.all(spark).map { case (n, v) => Row(n, v) })
  }

  private def currentUser(spark: SparkSession): String =
    graft.search.Rbac.currentRole(spark).getOrElse("graft")

  private val fnReady =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Spark DDL type name -> pg spelling (pg_typeof contract). */
  private[catalog] def pgTypeName(spark: String): String = {
    val s = spark.toLowerCase
    s match {
      case "int" | "integer" => "integer"
      case "bigint" | "long" => "bigint"
      case "smallint" | "short" => "smallint"
      case "string" => "text"
      case "double" => "double precision"
      case "float" => "real"
      case "boolean" => "boolean"
      case "date" => "date"
      case "timestamp" => "timestamp without time zone"
      case "binary" => "bytea"
      case d if d.startsWith("decimal") => "numeric"
      case d if d.startsWith("array") => s.stripPrefix("array<").stripSuffix(">") match {
        case inner => pgTypeName(inner) + "[]"
      }
      case other => other
    }
  }

  def registerFunctions(spark: SparkSession): Unit = if (fnReady.add(spark)) {
    spark.udf.register("current_database", () => "graft")
    spark.udf.register("current_schema", () => "public")
    spark.udf.register("pg_backend_pid", () => 1)
    spark.udf.register("version",
      () => s"graft (spark ${spark.version}) on PostgreSQL-compatible surface")
    // pg_typeof: typeof() exists natively but speaks Spark type names;
    // the pg corpus expects pg spellings (integer/text/double precision)
    spark.udf.register("pg_typeof_name", (t: String) => pgTypeName(t))
  }
}
