package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DuckDB-style file-reading table functions as REAL Spark TVFs —
  * `SELECT * FROM read_parquet('dir/ *.parquet', hive_partitioning =>
  * true)` — registered through SparkSessionExtensions.injectTableFunction
  * (reference surface: the read_csv/read_parquet/read_json functions the
  * data_import_and_export and file_formats corpora drive;
  * third_party/duckdb's table functions).
  *
  * Each call builds the analyzed plan of the corresponding distributed
  * Spark read, so everything downstream is a native FileSourceScan:
  * pushdown, pruning and partition discovery all apply. Options:
  *
  *  - `hive_partitioning` (read_parquet/read_csv): treat `key=value` path
  *    segments as partition columns — implemented by handing Spark the
  *    glob's static prefix as `basePath`, its native partition-discovery
  *    root.
  *  - `union_by_name` (all): per-file schemas merged by column NAME
  *    (parquet: mergeSchema; csv: per-file header reads unioned with
  *    allowMissingColumns). Without it, csv reads take the FIRST file's
  *    column set, as DuckDB does (combining_schemas.test).
  *  - `header`, `delim`/`delimiter`, `all_varchar` (read_csv).
  *
  * `$TESTDATA`-style absolute paths only — these TVFs read storage the
  * caller can already reach; no credential indirection.
  */
object ReadTvfs {

  private def str(e: Expression): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"read_* path/option must be a literal, got $other")
  }

  private def args(exprs: Seq[Expression]): (Seq[String], Map[String, String]) = {
    val paths = Seq.newBuilder[String]
    val opts = Map.newBuilder[String, String]
    exprs.foreach {
      case NamedArgumentExpression(key, value) =>
        opts += (key.toLowerCase -> str(value))
      case e => paths += str(e)
    }
    (paths.result(), opts.result())
  }

  private def bool(opts: Map[String, String], key: String): Boolean =
    opts.get(key).exists(v => v.equalsIgnoreCase("true") || v == "1")

  /** The static (glob-free) prefix of a path — Spark's basePath for
    * hive-partition discovery under a wildcard. */
  private def globBase(path: String): String = {
    val segs = path.split("/")
    val firstGlob = segs.indexWhere(s => s.exists("*?[{".contains(_)))
    if (firstGlob < 0) path else segs.take(firstGlob).mkString("/")
  }

  private def listFiles(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = fs.globStatus(p)
    if (matches == null || matches.isEmpty) throw new IllegalArgumentException(
      s"""no files found that match the pattern "$pattern"""")
    matches.map(_.getPath.toString).toSeq.sorted
  }

  private def readParquet(spark: SparkSession, paths: Seq[String],
      opts: Map[String, String]): DataFrame = {
    var r = spark.read
    if (bool(opts, "hive_partitioning"))
      r = r.option("basePath", globBase(paths.head))
    if (bool(opts, "union_by_name")) r = r.option("mergeSchema", "true")
    r.parquet(paths: _*)
  }

  private def readCsv(spark: SparkSession, paths: Seq[String],
      opts: Map[String, String]): DataFrame = {
    val header = opts.get("header").forall(v => v.equalsIgnoreCase("true") || v == "1")
    val delim = opts.getOrElse("delim", opts.getOrElse("delimiter", ","))
    def readOne(p: String): DataFrame = {
      var r = spark.read.option("header", header.toString).option("delimiter", delim)
      r = if (bool(opts, "all_varchar")) r else r.option("inferSchema", "true")
      if (bool(opts, "hive_partitioning")) r = r.option("basePath", globBase(paths.head))
      // dialect params the reference's read_csv forwards to its lookup TF
      // (inverted_index_view_params.test): quote/escape chars, the null
      // marker, a comment prefix; gzip rides on the file extension (Spark
      // decompresses .gz transparently, like the reference's auto-detect)
      opts.get("quote").foreach(q => r = r.option("quote", q))
      opts.get("escape").foreach(e => r = r.option("escape", e))
      opts.get("nullstr").foreach(n => r = r.option("nullValue", n))
      opts.get("comment").foreach(c => r = r.option("comment", c))
      r.csv(p)
    }
    val files = paths.flatMap(listFiles(spark, _))
    if (bool(opts, "union_by_name"))
      files.map(readOne).reduce(_.unionByName(_, allowMissingColumns = true))
    else if (files.length == 1) readOne(files.head)
    else {
      // DuckDB default: the FIRST file's column set wins; later files
      // contribute the columns they share (by name), extras dropped
      val first = readOne(files.head)
      val cols = first.columns.toSeq
      files.tail.map(readOne).foldLeft(first) { (acc, df) =>
        val have = df.columns.toSet
        acc.unionByName(df.select(cols.filter(have.contains)
          .map(org.apache.spark.sql.functions.col): _*), allowMissingColumns = true)
      }.select(cols.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  private def readJson(spark: SparkSession, paths: Seq[String],
      opts: Map[String, String]): DataFrame = {
    var r = spark.read
    if (opts.get("format").exists(_.equalsIgnoreCase("array")))
      r = r.option("multiLine", "true")
    r.json(paths: _*)
  }

  private def tvf(name: String,
      f: (SparkSession, Seq[String], Map[String, String]) => DataFrame)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = {
    (FunctionIdentifier(name),
      new ExpressionInfo(ReadTvfs.getClass.getCanonicalName, name),
      (exprs: Seq[Expression]) => {
        val spark = SparkSession.active
        val (paths, opts) = args(exprs)
        require(paths.nonEmpty, s"$name needs at least one path")
        f(spark, paths, opts).queryExecution.analyzed
      })
  }

  /** `query('SELECT ..')` / `query_table('name')` — the reference's
    * dynamic-SQL table functions (cookbook/sql_features/
    * query_and_query_table_functions.test). `query` routes the literal
    * back through the FULL session parser (dialect statements like a
    * dynamically-built UNPIVOT compose), `query_table` resolves the named
    * relation — both purely at plan time, so downstream optimization sees
    * an ordinary subquery. */
  private def queryTvf(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "query(sql) takes exactly one argument")
    SparkSession.active.sessionState.sqlParser.parsePlan(str(exprs.head))
  }

  private def queryTableTvf(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 1, "query_table(name) takes exactly one argument")
    org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
      str(exprs.head).split("\\.").toSeq)
  }

  /** pg's `generate_series(start, stop [, step])` — inclusive endpoints.
    * Integer-literal calls plan as a native `Range` (distributed splits, no
    * materialized array: `generate_series(1, 1e9)` is 32 partitions of
    * arithmetic, not one 8 GB array row); anything else — expressions,
    * timestamps with interval steps — re-renders through
    * `explode(sequence(...))`, which Spark evaluates per-row.
    * (reference surface: pg's SRF, used pervasively by
    * tests/sqllogic/sdb/pg/any/simple/ — basic_dml.test:61, ctas.test:10.) */
  private def generateSeriesTvf(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2 || exprs.length == 3,
      "generate_series(start, stop[, step]) takes 2 or 3 arguments")
    val intLits = exprs.flatMap {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case _ => None
    }
    if (intLits.length == exprs.length) {
      val (start, stop) = (intLits(0), intLits(1))
      val step = intLits.lift(2).getOrElse(1L)
      require(step != 0, "generate_series step must not be zero")
      // pg includes the stop endpoint when the step lands on it
      val range = org.apache.spark.sql.catalyst.plans.logical.Range(
        start, stop + (if (step > 0) 1 else -1), step, None)
      val out = org.apache.spark.sql.catalyst.expressions.Alias(
        range.output.head, "generate_series")()
      org.apache.spark.sql.catalyst.plans.logical.Project(Seq(out), range)
    } else {
      val argSql = exprs.map(_.sql).mkString(", ")
      SparkSession.active.sessionState.sqlParser.parsePlan(
        s"SELECT explode(sequence($argSql)) AS generate_series")
    }
  }

  // NOTE: DuckDB's `range([start,] stop)` TVF needs no injection — Spark's
  // built-in end-exclusive `range` matches its semantics, and the corpus
  // always aliases the column explicitly (`range(1000) t(i)`).

  private def planTvf(name: String, f: Seq[Expression] => LogicalPlan)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name),
      new ExpressionInfo(ReadTvfs.getClass.getCanonicalName, name), f)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      tvf("read_parquet", readParquet),
      tvf("read_csv", readCsv),
      tvf("read_csv_auto", readCsv),
      tvf("read_json", readJson),
      tvf("read_json_auto", readJson),
      planTvf("query", queryTvf),
      planTvf("query_table", queryTableTvf),
      planTvf("generate_series", generateSeriesTvf),
      // introspection TVFs the duck-dialect corpus reads
      // (collate_timezone.test): this engine's "extensions" are all
      // statically linked — ICU collations/zones ride on the JVM+Spark
      planTvf("duckdb_extensions", _ =>
        SparkSession.active.sessionState.sqlParser.parsePlan(
          """SELECT * FROM VALUES ('icu', true), ('parquet', true),
            |('json', true) AS t(extension_name, loaded)""".stripMargin)),
      planTvf("pragma_collations", _ =>
        SparkSession.active.sessionState.sqlParser.parsePlan(
          "SELECT explode(array('de', 'en', 'fr', 'es', 'it', 'ja', 'zh', " +
            "'sv', 'da', 'fi', 'nb', 'tr', 'cs', 'pl', 'ru')) AS collname")))
}
