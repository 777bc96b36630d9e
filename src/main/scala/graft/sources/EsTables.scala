package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.analysis.AnalyzerRegistry
import graft.search.{EsDsl, TsQueryExec}

/** Elasticsearch-compatible write/read path — the Spark analogue of the
  * reference's `es` schema (/root/reference/server/connector/functions/
  * es.cpp:64-70: tables with `_id` VARCHAR PK + `_source` JSON; `es_bulk`
  * :124, `_doc` GET :211-247, `_search` via dsl.cpp). An "index" is a
  * parquet directory of (_id, _source) rows; `_bulk` parses the ndjson
  * action/document pairs; `search` translates the query DSL and row-evaluates
  * it over an analyzed `_source` field (the un-indexed path — building an
  * inverted index over `_source` composes via IndexStore like any table).
  */
object EsTables {

  private def dir(root: String, name: String) = s"$root/es_$name"

  /** es_bulk: ndjson `{"index":{"_id":...}}` action lines each followed by a
    * document line. Returns the indexed doc count. `overwrite` recreates the
    * index (es_create_index + bulk in one call). */
  def bulk(spark: SparkSession, root: String, name: String,
      ndjson: Seq[String], overwrite: Boolean = false): Long = {
    val rows = ndjson.map(_.trim).filter(_.nonEmpty).grouped(2).map { pair =>
      val action = JsonMethods.parse(pair.head)
      val id = (action \ "index" \ "_id") match {
        case JString(s) => s
        case JInt(n) => n.toString
        case _ => throw new IllegalArgumentException(s"es_bulk: bad action ${pair.head}")
      }
      (id, JsonMethods.compact(JsonMethods.render(JsonMethods.parse(pair(1)))))
    }.toSeq
    import spark.implicits._
    rows.toDF("_id", "_source").write
      .mode(if (overwrite) "overwrite" else "append")
      .parquet(dir(root, name))
    rows.size.toLong
  }

  /** The es.<name> relation: (_id, _source). */
  def table(spark: SparkSession, root: String, name: String): DataFrame =
    spark.read.parquet(dir(root, name))

  /** _doc GET: `SELECT "_source" FROM es.x WHERE "_id" = ...` (es handlers
    * :211-247). */
  def docSource(spark: SparkSession, root: String, name: String, id: String): DataFrame =
    table(spark, root, name).filter(col("_id") === id).select(col("_source"))

  /** _mapping: field → type inferred from the stored _source docs
    * (handlers.cpp:1087). */
  def mapping(spark: SparkSession, root: String, name: String): DataFrame = {
    val parsed = spark.read.json(
      table(spark, root, name).select(col("_source").as("value"))
        .as(org.apache.spark.sql.Encoders.STRING))
    import spark.implicits._
    parsed.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
      .toDF("field", "es_type")
  }

  /** _cat/indices: name + doc count (handlers.cpp:1107). */
  def catIndices(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names =
      if (!fs.exists(new org.apache.hadoop.fs.Path(root))) Seq.empty[String]
      else fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).filter(_.startsWith("es_")).map(_.stripPrefix("es_")).toSeq
    names.map(n => (n, table(spark, root, n).count())).toDF("index", "docs_count")
  }

  /** _count endpoint (handlers.cpp:972). */
  def count(spark: SparkSession, root: String, name: String,
      dslJson: String, field: String = "text"): Long =
    search(spark, root, name, dslJson, field).count()

  /** Scroll-style keyset pagination — `WHERE "_id" > cursor ORDER BY "_id"
    * LIMIT size` (handlers.cpp:323-459; the cursor is the last _id of the
    * previous page, the base64url wrapping being wire-protocol dressing). */
  def scroll(spark: SparkSession, root: String, name: String,
      after: Option[String], size: Int): DataFrame = {
    val base = table(spark, root, name)
    after.fold(base)(c => base.filter(col("_id") > c))
      .orderBy(col("_id")).limit(size)
  }

  /** _search: query DSL over a JSON field of `_source`, row-evaluated —
    * returns matching `_id`s (handlers.cpp:636; dsl.cpp translation). */
  def search(spark: SparkSession, root: String, name: String,
      dslJson: String, field: String = "text",
      dict: String = "whitespace"): DataFrame = {
    val analyzer = AnalyzerRegistry.get(dict)
    // a top-level bool keeps full counting semantics: every must matches, no
    // must_not matches, and >= minimum_should_match of the should branches
    // match — counted per branch in the row-eval, exactly dsl.cpp:326-349
    val pred: Seq[String] => Boolean = EsDsl.parse(dslJson, analyzer) match {
      case Right(q) => toks => TsQueryExec.evalTokens(q, toks)
      case Left(b) => toks =>
        b.must.forall(TsQueryExec.evalTokens(_, toks)) &&
          !b.mustNot.exists(TsQueryExec.evalTokens(_, toks)) &&
          (b.should.isEmpty || b.minShouldMatch <= 0 ||
            b.should.count(TsQueryExec.evalTokens(_, toks)) >= b.minShouldMatch)
    }
    val matches = udf((src: String) => pred(analyzer.tokens(src)))
    table(spark, root, name)
      .filter(matches(get_json_object(col("_source"), s"$$.$field")))
      .select(col("_id"))
  }
}
