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

  /** The expression DDL registers the extracted JSON field as an
    * expression-key index (`((get_json_object(_source, '$.field')))`) — the
    * same catalog every `ts_match` claim resolves through, so [[search]]
    * finds it and drives from postings. The reference reaches the identical
    * state by translating DSL→SQL and letting the iresearch claim walk pick
    * it up (dsl.cpp:147-204 → iresearch_plan claimed scan). */
  def createIndex(spark: SparkSession, root: String, name: String,
      field: String = "text", dict: String = "whitespace"): Unit = {
    val view = s"es_${name}_v".replaceAll("[^A-Za-z0-9_]", "_")
    table(spark, root, name).createOrReplaceTempView(view)
    val idxName = s"es_${name}_${field}_idx".replaceAll("[^A-Za-z0-9_]", "_")
    graft.search.Ddl.execute(spark,
      s"CREATE SEARCH INDEX $idxName ON $view ((get_json_object(_source, '$$.$field'))) " +
        s"WITH (id = '_id', analyzer = '$dict', key = '$root-es-$name-$field')")
  }

  /** _search: query DSL over a JSON field of `_source` — returns matching
    * `_id`s (handlers.cpp:636; dsl.cpp translation).
    *
    * If [[createIndex]] registered a search index over this field, the DSL
    * drives the INDEX: each branch becomes a postings match
    * (TsQueryExec.matching) and the bool combines them with semi/anti joins
    * + a minimum_should_match branch count — the plan is a LeftSemi join
    * against index segments, never a full `_source` tokenize-and-scan (at
    * scale an un-indexed ES query re-analyzes the whole corpus per call).
    * Without an index it row-evaluates, result-identical. */
  def search(spark: SparkSession, root: String, name: String,
      dslJson: String, field: String = "text",
      dict: String = "whitespace"): DataFrame = {
    val analyzer = AnalyzerRegistry.get(dict)
    val req = EsDsl.parseRequest(dslJson, analyzer)
    applyPage(spark, root, name, hitsFor(spark, root, name, req.clause, field, dict), req)
  }

  /** The unpaged hit set for a parsed query — shared by [[search]] (which
    * pages it) and [[aggs]] (ES aggregations run over ALL hits, ignoring
    * from/size). */
  private def hitsFor(spark: SparkSession, root: String, name: String,
      clause: EsDsl.Clause, field: String,
      dict: String): DataFrame =
    graft.search.ExprIndexes.lookup(
        dir(root, name), s"get_json_object(_source, '$$.$field')", dict) match {
      case Some((segDir, idCol)) =>
        claimedSearch(spark, root, name, segDir, idCol, clause, field, dict)
      case None =>
        rowEvalSearch(spark, root, name, clause, AnalyzerRegistry.get(dict), field)
    }

  /** Request-level `sort`/`from`/`size` (dsl.cpp:434-456, 680-697): sort
    * keys come from `_source` (numeric fields compare numerically via the
    * inferred mapping — never lexicographic '10' < '9'); `_id` sorts the
    * key itself and is always the final tiebreak, so pages are
    * deterministic. */
  private def applyPage(spark: SparkSession, root: String, name: String,
      hits: DataFrame, req: EsDsl.Request): DataFrame = {
    if (req.sort.isEmpty && req.from == 0 && req.size.isEmpty) return hits
    val needSource = req.sort.exists(_._1 != "_id")
    val base = if (needSource) hits.join(table(spark, root, name), "_id") else hits
    val types: Map[String, String] =
      if (!needSource) Map.empty
      else mapping(spark, root, name).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val keys = req.sort.map { case (f, asc) =>
      val c =
        if (f == "_id") col("_id")
        else types.get(f) match {
          case Some(t) if t == "bigint" || t == "double" =>
            get_json_object(col("_source"), s"$$.$f").cast("double")
          case _ => get_json_object(col("_source"), s"$$.$f")
        }
      if (asc) c.asc else c.desc
    } :+ col("_id").asc
    var out = base.orderBy(keys: _*).select(col("_id"))
    if (req.from > 0) out = out.offset(req.from)
    req.size.foreach(s => out = out.limit(s))
    out
  }

  /** `aggs` terms buckets over the query's hits (dsl.cpp:525-552): GROUP BY
    * the JSON `_source` field, buckets ordered doc_count DESC then key ASC,
    * top `size` per aggregation. Multiple aggregations union with their
    * names. Numeric fields keep their mapping type for the key text. */
  def aggs(spark: SparkSession, root: String, name: String,
      dslJson: String, field: String = "text",
      dict: String = "whitespace"): DataFrame = {
    val analyzer = AnalyzerRegistry.get(dict)
    val req = EsDsl.parseRequest(dslJson, analyzer)
    require(req.aggs.nonEmpty, "ES DSL: request has no aggs")
    val hits = hitsFor(spark, root, name, req.clause, field, dict)
    val withSource = hits.join(table(spark, root, name), "_id")
    val out = req.aggs.map {
      case EsDsl.TermsAgg(aName, aField, aSize, topHits) =>
        val buckets = withSource
          .groupBy(get_json_object(col("_source"), s"$$.$aField").as("key"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("doc_count"))
          .orderBy(col("doc_count").desc, col("key"))
          .limit(aSize)
        val bucketRows = buckets
          .select(lit(aName).as("agg"), col("key"), col("doc_count"),
            lit(null).cast("double").as("value"))
        topHits match {
          case None => bucketRows
          case Some(EsDsl.TopHitsAgg(thName, sz, aSort)) =>
            // bucket-nested top_hits — "top N docs per terms bucket"
            // (handlers.cpp/dsl.cpp agg surface): ONE window pass,
            // row_number partitioned by the bucket key over the request's
            // already-reduced hits, kept only for surviving buckets (semi
            // join on the top-size bucket frame). Flat-frame rendering:
            // agg = "<terms>.<top_hits>", key = "<bucket>:<_id>",
            // doc_count = 1-based rank within the bucket.
            val types: Map[String, String] = mapping(spark, root, name)
              .collect().map(r => r.getString(0) -> r.getString(1)).toMap
            val keys = aSort.map { case (f, asc) =>
              val c =
                if (f == "_id") col("_id")
                else types.get(f) match {
                  case Some(t) if t == "bigint" || t == "double" =>
                    get_json_object(col("_source"), s"$$.$f").cast("double")
                  case _ => get_json_object(col("_source"), s"$$.$f")
                }
              if (asc) c.asc else c.desc
            } :+ col("_id").asc
            import org.apache.spark.sql.expressions.Window
            val w = Window.partitionBy(col("bkey")).orderBy(keys: _*)
            val hitRows = withSource
              .withColumn("bkey", get_json_object(col("_source"), s"$$.$aField"))
              .join(buckets.select(col("key").as("bkey")), Seq("bkey"), "left_semi")
              .withColumn("rnk", row_number().over(w))
              .filter(col("rnk") <= sz)
              .select(lit(s"$aName.$thName").as("agg"),
                concat(col("bkey"), lit(":"), col("_id")).as("key"),
                col("rnk").cast("long").as("doc_count"),
                lit(null).cast("double").as("value"))
            bucketRows.unionByName(hitRows)
        }
      case EsDsl.DateHistogramAgg(aName, aField, interval) =>
        // calendar_interval → date_trunc bucket; key rendered as the
        // bucket-start ISO second (ES key_as_string shape)
        withSource
          .groupBy(date_trunc(interval,
            to_timestamp(get_json_object(col("_source"), s"$$.$aField"))).as("k"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("doc_count"))
          .select(lit(aName).as("agg"),
            date_format(col("k"), "yyyy-MM-dd'T'HH:mm:ss").as("key"),
            col("doc_count"), lit(null).cast("double").as("value"))
      case EsDsl.HistogramAgg(aName, aField, interval) =>
        // fixed-width numeric buckets: key = floor(v / interval) * interval
        // (ES histogram), empty buckets omitted (min_doc_count default 1
        // behavior — bucket back-fill is presentation, not aggregation)
        val v = get_json_object(col("_source"), s"$$.$aField").cast("double")
        withSource.filter(v.isNotNull)
          .groupBy((floor(v / interval) * interval).as("k"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("doc_count"))
          .orderBy(col("k"))
          .select(lit(aName).as("agg"), col("k").cast("string").as("key"),
            col("doc_count"), lit(null).cast("double").as("value"))
      case EsDsl.FiltersAgg(aName, buckets) =>
        // one named bucket per sub-query, counted over the request's hit
        // set (ES filters agg) — each bucket is a residual row-eval over
        // the already-reduced hits, so cost is |hits| × |buckets|
        buckets.map { case (bName, bClause) =>
          val m = udf((id: String, src: String) =>
            evalClause(bClause, field, analyzer, id, src))
          withSource.filter(m(col("_id"), col("_source")))
            .agg(org.apache.spark.sql.functions.count(lit(1)).as("doc_count"))
            .select(lit(aName).as("agg"), lit(bName).as("key"),
              col("doc_count"), lit(null).cast("double").as("value"))
        }.reduce(_ unionByName _)
      case EsDsl.TopHitsAgg(aName, sz, aSort) =>
        // request-level top_hits: the top `size` hit _ids in sort order
        // (key = _id, doc_count = 1-based rank); the bucket-nested form
        // rides inside the TermsAgg branch above.
        val types: Map[String, String] = mapping(spark, root, name).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        val keys = aSort.map { case (f, asc) =>
          val c =
            if (f == "_id") col("_id")
            else types.get(f) match {
              case Some(t) if t == "bigint" || t == "double" =>
                get_json_object(col("_source"), s"$$.$f").cast("double")
              case _ => get_json_object(col("_source"), s"$$.$f")
            }
          if (asc) c.asc else c.desc
        } :+ col("_id").asc
        import org.apache.spark.sql.expressions.Window
        withSource.orderBy(keys: _*).limit(sz)
          .withColumn("doc_count",
            row_number().over(Window.orderBy(keys: _*)).cast("long"))
          .select(lit(aName).as("agg"), col("_id").as("key"),
            col("doc_count"), lit(null).cast("double").as("value"))
      case EsDsl.MetricAgg(aName, kind, aField) =>
        val v = get_json_object(col("_source"), s"$$.$aField").cast("double")
        val e = kind match {
          case "min" => min(v)
          case "max" => max(v)
          case "avg" => avg(v)
          case "sum" => sum(v)
          case "value_count" => org.apache.spark.sql.functions.count(v).cast("double")
          // exact here (matches the oracle); at corpus scale swap for
          // approx_count_distinct — ES's cardinality is itself a HLL
          case "cardinality" => countDistinct(v).cast("double")
        }
        withSource.agg(e.as("value"))
          .select(lit(aName).as("agg"), lit(null).cast("string").as("key"),
            lit(null).cast("long").as("doc_count"), col("value"))
    }
    out.reduce(_ unionByName _)
  }

  /** Doc-level clause evaluation over a raw `_source` — the row-eval
    * fallback and the residual for non-indexed fields on the claimed path.
    * Tokenizes each referenced field at most once per row; bools recurse
    * with full counting semantics (dsl.cpp:326-349). */
  private[sources] def evalClause(c: EsDsl.Clause, defaultField: String,
      analyzer: graft.analysis.Analyzer, id: String, source: String): Boolean = {
    lazy val json = JsonMethods.parse(source)
    val cache = scala.collection.mutable.HashMap.empty[String, Seq[String]]
    def toksOf(f: String): Seq[String] = cache.getOrElseUpdate(f,
      (json \ f) match {
        case JString(s) => analyzer.tokens(s)
        case JNothing | JNull => Seq.empty
        case v => analyzer.tokens(JsonMethods.compact(JsonMethods.render(v)))
      })
    def go(c: EsDsl.Clause): Boolean = c match {
      case EsDsl.TokenClause(fOpt, q) =>
        TsQueryExec.evalTokens(q, toksOf(fOpt.getOrElse(defaultField)))
      case EsDsl.ExistsClause(f) => (json \ f) match {
        case JNothing | JNull => false
        case _ => true
      }
      case EsDsl.IdsClause(vs) => vs.contains(id)
      case EsDsl.BoolClause(must, mustNot, should, msm) =>
        must.forall(go) && !mustNot.exists(go) &&
          (should.isEmpty || msm <= 0 || should.count(go) >= msm)
    }
    go(c)
  }

  /** The indexed path: clauses over the INDEXED field become postings
    * matches combined with semi/anti joins + a minimum_should_match branch
    * count; doc-level clauses (exists/ids) and other-field clauses stay
    * DataFrame filters intersected the same way — the plan is LeftSemi
    * joins against index segments, never a full `_source` tokenize-and-scan
    * for the indexed branches. */
  private def claimedSearch(spark: SparkSession, root: String, name: String,
      segDir: String, idCol: String, clause: EsDsl.Clause,
      field: String, dict: String): DataFrame = {
    val idx = graft.index.IndexStore.load(spark, segDir)
    val analyzer = AnalyzerRegistry.get(dict)
    val all = table(spark, root, name)
    def allIds: DataFrame = all.select(col("_id").as("doc_id"))
    def hits(c: EsDsl.Clause): DataFrame = c match {
      case EsDsl.TokenClause(fOpt, q) if fOpt.forall(_ == field) =>
        TsQueryExec.matching(idx, q).select(col("doc_id"))
      case tc: EsDsl.TokenClause =>
        // un-indexed field: row-eval residual over _source (multi_match's
        // other legs)
        val m = udf((id: String, src: String) =>
          evalClause(tc, field, analyzer, id, src))
        all.filter(m(col("_id"), col("_source"))).select(col("_id").as("doc_id"))
      case EsDsl.ExistsClause(f) =>
        all.filter(get_json_object(col("_source"), s"$$.$f").isNotNull)
          .select(col("_id").as("doc_id"))
      case EsDsl.IdsClause(vs) =>
        all.filter(col("_id").isin(vs: _*)).select(col("_id").as("doc_id"))
      case EsDsl.BoolClause(must, mustNot, should, msm) =>
        val mustDf = must.map(hits).reduceOption(
          (a, c) => a.join(c, Seq("doc_id"), "left_semi"))
        val shouldDf =
          if (should.isEmpty || msm <= 0) None
          else Some(should.zipWithIndex
            .map { case (q, i) => hits(q).withColumn("_b", lit(i)) }
            .reduce(_ unionByName _)
            .groupBy(col("doc_id"))
            .agg(countDistinct(col("_b")).as("_nb"))
            .filter(col("_nb") >= msm)
            .select(col("doc_id")))
        val pos = (mustDf, shouldDf) match {
          case (Some(m), Some(s)) => Some(m.join(s, Seq("doc_id"), "left_semi"))
          case (m, s) => m.orElse(s)
        }
        pos.map { p =>
          mustNot.map(hits).foldLeft(p)(
            (acc, n) => acc.join(n, Seq("doc_id"), "left_anti"))
        }.getOrElse {
          // no positive branch: match_all minus the must_nots
          mustNot.map(hits).foldLeft(allIds)(
            (acc, n) => acc.join(n, Seq("doc_id"), "left_anti"))
        }
    }
    all.join(hits(clause).select(col("doc_id").as("__match_id")),
        col("_id") === col("__match_id"), "left_semi")
      .select(col("_id"))
  }

  private def rowEvalSearch(spark: SparkSession, root: String, name: String,
      clause: EsDsl.Clause,
      analyzer: graft.analysis.Analyzer, field: String): DataFrame = {
    val matches = udf((id: String, src: String) =>
      evalClause(clause, field, analyzer, id, src))
    table(spark, root, name)
      .filter(matches(col("_id"), col("_source")))
      .select(col("_id"))
  }
}
