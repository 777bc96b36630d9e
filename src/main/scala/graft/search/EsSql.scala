package graft.search

import java.util.Locale

import scala.collection.immutable.ListMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

import graft.catalog.ObjectCatalog

/** The reference's ES index lifecycle as SQL statements + table functions
  * (SURVEY §3.3; server/connector/functions/es.cpp:64-70, handlers.cpp;
  * sqllogic corpus sdb/pg/es): an ES index IS a table in the `es`
  * schema — `_id` VARCHAR PK, one typed column per mapped property
  * (alphabetical, ES normalization), `_source` JSON text — plus an
  * inverted index over the text properties under the ES `standard`
  * analyzer (lowercase, no stemming).
  *
  *   CALL es_create_index(name, body) / es_mapping / es_drop_index /
  *   CALL es_refresh(name | '')          — '' refreshes every ES index
  *   es_doc(name, id, json) / es_bulk(name, ndjson)  — table functions
  *     emitting rows SHAPED LIKE the target table, consumed via
  *     INSERT ... SELECT (the write path of _bulk / _doc PUT)
  *   es_cat_indices()                    — _cat/indices
  *
  * The mapping (with its text-vs-keyword distinction, which column types
  * alone cannot recover) persists as `_ES_MAPPING` INSIDE the table's
  * directory — it lives and dies with the table, and a fresh session
  * re-reads it lazily. */
object EsSql {

  private val om = new ObjectMapper()

  private val callRe =
    """(?is)^\s*CALL\s+(es_create_index|es_mapping|es_drop_index|es_refresh)\s*\(\s*'((?:[^']|'')*)'\s*(?:,\s*'((?:[^']|'')*)'\s*)?\)\s*;?\s*$""".r

  def handles(sql: String): Boolean = sql match {
    case callRe(_, _, _) => true
    case _ => false
  }

  /** ES type → (column DDL type, spark type). */
  private def colType(esType: String, field: String): (String, DataType) =
    esType match {
      case "text" | "keyword" => ("VARCHAR", StringType)
      case "integer" => ("INTEGER", IntegerType)
      case "long" => ("BIGINT", LongType)
      case "short" | "byte" => ("SMALLINT", ShortType)
      case "double" => ("DOUBLE", DoubleType)
      case "float" => ("REAL", FloatType)
      case "boolean" => ("BOOLEAN", BooleanType)
      case "date" => ("TIMESTAMP", TimestampType)
      case other => throw new IllegalArgumentException(
        s"no handler for type [$other] declared on field [$field]")
    }

  private def err(msg: String) = new IllegalArgumentException(msg)

  private def unesc(s: String) = s.replace("''", "'")

  /** Backing-table identifier for a reference-valid ES index name
    * ([a-z0-9._+-], es.cpp:92-108). The reference keeps such names "safe
    * inside double-quoted SQL identifiers" (es.cpp:89-91); Spark-side
    * catalog plumbing composes identifiers unquoted, so the ES surface maps
    * names at its boundary instead: a name that is already a plain
    * identifier passes through verbatim (every pre-existing index keeps its
    * table name), and a name with '-'/'+'/'.' spells them as '_' plus a
    * short digest of the ORIGINAL name. The mangled output is itself in the
    * pass-through alphabet, so the mapping alone is NOT collision-proof (a
    * user index literally named like another name's mangled spelling, or a
    * 6-hex digest-prefix clash); every lookup therefore re-verifies the
    * `_ES_NAME` sidecar against the requested spelling ([[nameMatches]]) —
    * a clash surfaces as "no such index" / an explicit collision error,
    * never as an operation addressing the wrong backing table. The original
    * spelling persists as an `_ES_NAME` sidecar next to `_ES_MAPPING`, so
    * es_cat_indices() and every CALL verb speak the user's name; only
    * direct SQL on the backing table uses the mapped identifier. */
  private def mangle(name: String): String =
    if (name.matches("[a-z0-9_]+")) name
    else name.map(c => if ("-+.".contains(c)) '_' else c) + "_" +
      org.apache.commons.codec.digest.DigestUtils.md5Hex(name).substring(0, 6)

  /** Backing table identifier for an ES index name. */
  private def tbl(name: String): String = s"es.${mangle(name)}"

  /** Whether the backing table at `t` really is the index the user named:
    * a mapped table's `_ES_NAME` sidecar must spell exactly the requested
    * name, and a sidecar-less (pass-through) table only answers to a name
    * that needed no mapping. Guards every name-addressed lookup against
    * mangle collisions (digest-prefix clash, or a literal pass-through name
    * equal to another name's mangled spelling). */
  private def nameMatches(spark: SparkSession, t: ObjectCatalog.TableDef,
      name: String): Boolean = {
    val p = s"${t.dir}/_ES_NAME"
    if (graft.index.IndexStore.exists(spark, p))
      graft.index.IndexStore.readString(spark, p) == name
    else mangle(name) == name
  }

  /** User-facing name of a backing table: the `_ES_NAME` sidecar when the
    * name needed mapping, the table name itself otherwise. */
  private def displayName(spark: SparkSession, t: ObjectCatalog.TableDef): String = {
    val p = s"${t.dir}/_ES_NAME"
    if (graft.index.IndexStore.exists(spark, p))
      graft.index.IndexStore.readString(spark, p)
    else t.name
  }

  /** name → alphabetical (field → es type); None when the table is not an
    * ES index (no sidecar). */
  private def mappingOf(spark: SparkSession, name: String): Option[ListMap[String, String]] =
    ObjectCatalog.table(tbl(name)) match {
      case Some(t) if !nameMatches(spark, t, name) => None // mangle collision
      case _ => mappingOfId(spark, mangle(name))
    }

  /** Same, keyed by the backing table's (mangled) catalog name. */
  private def mappingOfId(spark: SparkSession, id: String): Option[ListMap[String, String]] =
    ObjectCatalog.table(s"es.$id").flatMap { t =>
      val p = s"${t.dir}/_ES_MAPPING"
      if (!graft.index.IndexStore.exists(spark, p)) None
      else {
        val node = om.readTree(graft.index.IndexStore.readString(spark, p))
        val it = node.fields()
        var m = ListMap.empty[String, String]
        while (it.hasNext) { val e = it.next(); m += (e.getKey -> e.getValue.asText) }
        Some(m)
      }
    }

  private def requireIndex(spark: SparkSession, name: String): ListMap[String, String] =
    mappingOf(spark, name).getOrElse(throw err(s"no such index [$name]"))

  // pg wire renders booleans as t/f — the CALL results match the
  // reference's client text directly
  private def ack(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("t").toDF("acknowledged")
  }

  private def textIndexName(name: String) = s"es_${name}_text"

  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
    case callRe(verb, rawName, rawBody) =>
      val name = unesc(rawName)
      verb.toLowerCase(Locale.ROOT) match {
        case "es_create_index" => createIndex(spark, name, Option(rawBody).map(unesc).getOrElse(""))
        case "es_mapping" =>
          val m = requireIndex(spark, name)
          val props = m.map { case (f, t) => s""""$f":{"type":"$t"}""" }
            .mkString("{\"properties\":{", ",", "}}")
          import spark.implicits._
          Seq(props).toDF("mappings")
        case "es_drop_index" =>
          requireIndex(spark, name)
          if (m2v(spark, name).nonEmpty)
            spark.sql(s"DROP INDEX IF EXISTS ${textIndexName(mangle(name))}")
          spark.sql(s"DROP TABLE ${tbl(name)}")
          ack(spark)
        case "es_refresh" =>
          val targets =
            if (name.isEmpty) ObjectCatalog.tablesInSchema("es").map(_.name)
              .filter(id => mappingOfId(spark, id).isDefined)
            else { requireIndex(spark, name); Seq(mangle(name)) }
          targets.foreach(id => spark.sql(s"VACUUM (REFRESH_TABLE) es.$id"))
          ack(spark)
      }
  }

  /** The text-typed properties — the inverted index's member set. */
  private def m2v(spark: SparkSession, name: String): Seq[String] =
    mappingOf(spark, name).toSeq.flatMap(_.collect { case (f, "text") => f })

  private def createIndex(spark: SparkSession, name: String, body: String): DataFrame = {
    // reference ValidateIndexName (es.cpp:92-108): lowercase [a-z0-9._+-],
    // ≤255, not "."/"..", not starting with '-'/'_'/'+'. Names with '-',
    // '+' or '.' are valid and accepted; [[mangle]] maps them onto the
    // engine's identifier alphabet at the SQL-composition boundary
    // (r16 ADVICE — the r15 blanket rejection was a parity gap).
    if (name.isEmpty || name.length > 255 || name == "." || name == ".." ||
        "-_+".contains(name.head) || !name.matches("[a-z0-9._+-]+"))
      throw err(s"invalid index name [$name]")
    ObjectCatalog.table(tbl(name)).foreach { t =>
      if (nameMatches(spark, t, name))
        throw err(s"index [$name] already exists")
      else
        // digest-prefix clash or a pass-through name equal to another
        // name's mangled spelling — refuse rather than share a backing
        // table between two distinct index names
        throw err(s"index name [$name] collides with the internal " +
          s"identifier of existing index [${displayName(spark, t)}]")
    }
    val props: ListMap[String, String] =
      if (body.trim.isEmpty) ListMap.empty
      else {
        val root =
          try om.readTree(body)
          catch { case _: Exception =>
            throw err(s"failed to parse mapping for index [$name]") }
        if (root == null) throw err(s"failed to parse mapping for index [$name]")
        val p = root.path("mappings").path("properties")
        val it = p.fields()
        var fields = Vector.empty[(String, String)]
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.startsWith("_")) throw err(s"invalid field name [${e.getKey}]")
          val t = e.getValue.path("type").asText("")
          colType(t, e.getKey) // validates the type name
          fields :+= (e.getKey -> t)
        }
        ListMap(fields.sortBy(_._1): _*)
      }
    spark.sql("CREATE SCHEMA IF NOT EXISTS es")
    val cols = props.map { case (f, ty) => s"$f ${colType(ty, f)._1}" }
    spark.sql(s"""CREATE TABLE ${tbl(name)} (_id VARCHAR PRIMARY KEY${
      if (cols.isEmpty) "" else cols.mkString(", ", ", ", "")}, _source VARCHAR)""")
    val t = ObjectCatalog.table(tbl(name)).get
    if (mangle(name) != name)
      graft.index.IndexStore.writeStringAtomic(spark, s"${t.dir}/_ES_NAME", name)
    graft.index.IndexStore.writeStringAtomic(spark, s"${t.dir}/_ES_MAPPING",
      om.writeValueAsString {
        val n = om.createObjectNode()
        props.foreach { case (f, ty) => n.put(f, ty) }
        n
      })
    val textProps = props.collect { case (f, "text") => f }.toSeq
    if (textProps.nonEmpty) {
      // the ES `standard` analyzer: lowercase, no stemming
      spark.sql("""CREATE OR REPLACE TEXT SEARCH DICTIONARY es_standard(
        template = 'text', locale = 'en_US.UTF-8', case = 'lower',
        stemming = false, accent = false, frequency = true, position = true)""")
      spark.sql(s"CREATE INDEX ${textIndexName(mangle(name))} ON ${tbl(name)} USING " +
        s"inverted(_id, ${textProps.map(f => s"$f es_standard").mkString(", ")})")
    }
    ack(spark)
  }

  // ---- table functions -----------------------------------------------------

  private def schemaOf(m: ListMap[String, String]): StructType =
    StructType(
      StructField("_id", StringType) +:
        m.map { case (f, t) => StructField(f, colType(t, f)._2) }.toSeq :+
        StructField("_source", StringType))

  /** Strictly-typed property value from the doc's JSON node — a type
    * mismatch is the reference's mapper error, never a silent null. */
  private def valueOf(node: JsonNode, esType: String, field: String): Any =
    esType match {
      case "long" | "integer" | "short" | "byte" =>
        if (!node.isIntegralNumber) throw err(
          s"failed to parse field [$field] of type [$esType]")
        esType match {
          case "long" => node.asLong()
          case "integer" => node.asInt()
          case _ => node.asInt().toShort
        }
      case "double" | "float" =>
        if (!node.isNumber) throw err(
          s"failed to parse field [$field] of type [$esType]")
        if (esType == "double") node.asDouble() else node.asDouble().toFloat
      case "boolean" =>
        if (!node.isBoolean) throw err(
          s"failed to parse field [$field] of type [boolean]")
        node.asBoolean()
      case "date" =>
        if (node.isIntegralNumber)
          new java.sql.Timestamp(node.asLong()) // epoch millis, ES default
        else if (node.isTextual) {
          val s = node.asText()
          try java.sql.Timestamp.from(java.time.Instant.parse(s))
          catch { case _: Exception =>
            try java.sql.Timestamp.from(java.time.LocalDate.parse(s)
              .atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
            catch { case _: Exception => throw err(
              s"failed to parse field [$field] of type [date]") }
          }
        } else throw err(s"failed to parse field [$field] of type [date]")
      case _ =>
        if (!node.isTextual) throw err(
          s"failed to parse field [$field] of type [$esType]")
        node.asText()
    }

  /** One parsed document → a table-shaped Row. Rejects trailing content
    * after the JSON value (it would store invalid JSON in _source). */
  private def docRow(m: ListMap[String, String], id: String, json: String): Row = {
    val parser = om.getFactory.createParser(json)
    val tree =
      try om.readTree[JsonNode](parser)
      catch { case _: Exception => throw err(s"failed to parse document") }
    if (parser.nextToken() != null)
      throw err(s"document [$id] has trailing content after the JSON value")
    val vals = m.map { case (f, t) =>
      val n = tree.path(f)
      if (n.isMissingNode || n.isNull) null else valueOf(n, t, f)
    }.toSeq
    Row.fromSeq(id +: vals :+ om.writeValueAsString(tree))
  }

  private def localPlan(spark: SparkSession, rows: Seq[Row],
      schema: StructType): LogicalPlan =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema).queryExecution.analyzed

  private def strArg(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
        if s != null => s.toString
    case _ => throw err(s"$fn: argument ${pos + 1} must be a string literal")
  }

  private def esDocTvf(spark: SparkSession, args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "es_doc(index, id, document)")
    val name = strArg(args(0), "es_doc", 0)
    val m = requireIndex(spark, name)
    val id = strArg(args(1), "es_doc", 1)
    localPlan(spark, Seq(docRow(m, id, strArg(args(2), "es_doc", 2))), schemaOf(m))
  }

  private def esBulkTvf(spark: SparkSession, args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "es_bulk(index, ndjson)")
    val name = strArg(args(0), "es_bulk", 0)
    val m = requireIndex(spark, name)
    val lines = strArg(args(1), "es_bulk", 1).split("\n").map(_.trim)
      .filter(_.nonEmpty).toSeq
    if (lines.isEmpty) throw err("no requests added")
    val rows = Vector.newBuilder[Row]
    var i = 0
    var n = 0
    while (i < lines.length) {
      val action = om.readTree(lines(i))
      val verbs = { val it = action.fieldNames(); val b = Vector.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result() }
      val verb = verbs.headOption.getOrElse("")
      if (verb != "index" && verb != "create")
        throw err(s"expected one of [create, index] but found [$verb]")
      if (i + 1 >= lines.length)
        throw err("bulk action is missing its document (document is missing)")
      val idNode = action.path(verb).path("_id")
      val id =
        if (idNode.isMissingNode || idNode.isNull)
          // ES autogenerates 20-char ids; deterministic here (retry-safe)
          org.apache.commons.codec.digest.DigestUtils
            .md5Hex(s"$name|$n|${lines(i + 1)}").substring(0, 20)
        else idNode.asText()
      rows += docRow(m, id, lines(i + 1))
      n += 1
      i += 2
    }
    localPlan(spark, rows.result(), schemaOf(m))
  }

  private def esCatTvf(spark: SparkSession, args: Seq[Expression]): LogicalPlan = {
    require(args.isEmpty, "es_cat_indices()")
    val rows = ObjectCatalog.tablesInSchema("es")
      .filter(t => mappingOfId(spark, t.name).isDefined)
      .map(t => Row(displayName(spark, t), spark.table(s"es.${t.name}").count()))
    localPlan(spark, rows, StructType(Seq(
      StructField("index", StringType), StructField("docs_count", LongType))))
  }

  def functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      (FunctionIdentifier("es_doc"),
        new ExpressionInfo("graft.search.EsSql", "es_doc"),
        (args: Seq[Expression]) => esDocTvf(SparkSession.active, args)),
      (FunctionIdentifier("es_bulk"),
        new ExpressionInfo("graft.search.EsSql", "es_bulk"),
        (args: Seq[Expression]) => esBulkTvf(SparkSession.active, args)),
      (FunctionIdentifier("es_cat_indices"),
        new ExpressionInfo("graft.search.EsSql", "es_cat_indices"),
        (args: Seq[Expression]) => esCatTvf(SparkSession.active, args)))
}
