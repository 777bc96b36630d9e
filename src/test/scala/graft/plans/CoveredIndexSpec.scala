package graft.plans

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables
import graft.search.SqlSurface

/** Composite-index sidecar: typed indexed FIELDS + INCLUDE columnstore
  * (reference inverted_index_include_pushdown.test,
  * inverted_index_indexed_vs_included.test). Asserts the three contracts:
  * covered projections never read the base parquet, field point predicates
  * drive the field dataset, and results are identical to brute force. */
@graft.SlowTest
class CoveredIndexSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val key = TestSpark.sfDir + "-documents-coverspec"

  private def ensure(): Unit = {
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    graft.search.Ddl.execute(spark,
      s"""CREATE SEARCH INDEX docs_coverspec_idx ON graft_documents (text)
         |WITH (id = 'doc_id', analyzer = 'whitespace', key = '$key')
         |FIELDS (lang, n_chars) INCLUDE (lang, source, n_chars)""".stripMargin)
  }

  private def bruteMatched(term: String) =
    Tables.documents(spark, TestSpark.sfDir)
      .filter(array_contains(
        filter(split(lower(col("text")), "\\s+"), t => t =!= ""), term))

  test("covered projection never reads the base table") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id, lang, source, n_chars FROM graft_documents
        |WHERE ts_match(text, 'vector', 'whitespace')
        |  AND lang = 'en' AND n_chars >= 200""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    val read = df.inputFiles.toSet
    assert(read.nonEmpty, "covered plan must still read index artifacts")
    assert((read & base).isEmpty,
      s"covered projection must not touch the base parquet; read:\n${read.mkString("\n")}")
    // results identical to brute force over the base table
    val want = bruteMatched("vector")
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .select("doc_id", "lang", "source", "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val got = df.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(got.toSeq == want.toSeq)
  }

  test("covered projection survives expressions over included columns") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id, upper(lang) AS lang_uc, n_chars + 1 AS nc1
        |FROM graft_documents
        |WHERE ts_match(text, 'stream', 'whitespace') AND n_chars < 400""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).isEmpty,
      "projection of expressions over covered columns must stay covered")
    val want = bruteMatched("stream").filter(col("n_chars") < 400)
      .select(col("doc_id"), upper(col("lang")).as("lang_uc"),
        (col("n_chars") + 1).as("nc1"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == want.toSeq)
  }

  test("projection of a non-included column falls back to the base join (still claimed)") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id, length(text) AS text_len FROM graft_documents
        |WHERE ts_match(text, 'stream', 'whitespace') AND lang IN ('en', 'de')""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).nonEmpty,
      "a projection needing `text` must read the base table")
    val optimized = df.queryExecution.optimizedPlan
    val semis = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semis.size >= 2,
      s"text claim + lang field claim expected as two semi-joins:\n$optimized")
    val want = bruteMatched("stream").filter(col("lang").isin("en", "de"))
      .select(col("doc_id"), length(col("text")).as("text_len"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == want.toSeq)
  }

  test("a residual on a non-covered column keeps the base scan") {
    ensure()
    // `text LIKE ...` is not claimable and text is not included → the
    // covering rewrite must bail and the base scan must survive
    val df = spark.sql(
      """SELECT doc_id, lang FROM graft_documents
        |WHERE ts_match(text, 'stream', 'whitespace') AND text LIKE '%join%'""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).nonEmpty)
    val want = bruteMatched("stream").filter(col("text").contains("join"))
      .select("doc_id", "lang").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == want.toSeq)
  }

  test("covered scored top-k joins back to the stored columnstore, not the base table") {
    ensure()
    val df = spark.sql(
      """SELECT doc_id, lang, source FROM graft_documents
        |ORDER BY bm25(text, 'stream vector', 'whitespace') DESC
        |LIMIT 10""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).isEmpty,
      "covered top-k must late-materialize from the stored columnstore")
    // parity with the row-eval scorer over the base table
    val got = df.collect().map(_.getLong(0))
    assert(got.length == 10 && got.distinct.length == 10)
    val storedVals = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val baseVals = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("doc_id").isin(got.toSeq: _*))
      .select("doc_id", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(storedVals.toSet == baseVals,
      "stored columnstore values must equal the base table's")
  }

  test("covered kNN reads the vector index sidecar, not the embeddings table") {
    SqlSurface.registerAll(spark)
    Tables.embeddings(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_embeddings")
    graft.search.Ddl.execute(spark,
      s"""CREATE VECTOR INDEX emb_coverspec_idx ON graft_embeddings (embedding)
         |WITH (id = 'vec_id', metric = 'l2', key = '${TestSpark.sfDir}-emb-coverspec')
         |INCLUDE (label)""".stripMargin)
    val q = Tables.embeddings(spark, TestSpark.sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val df = Tables.embeddings(spark, TestSpark.sfDir)
      .orderBy(call_udf("ann_l2", col("embedding"), typedlit(q)))
      .limit(10)
      .select(col("vec_id"), col("label"))
    val base = Tables.embeddings(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).isEmpty,
      s"covered kNN must not read embeddings.parquet")
    // values parity against the base table for the k ids
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1)))
    val want = Tables.embeddings(spark, TestSpark.sfDir)
      .filter(col("vec_id").isin(got.map(_._1).toSeq: _*))
      .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got.length == 10 && got.toSet == want)
  }

  test("DESCRIBE surfaces the sidecar; DROP removes it") {
    ensure()
    val desc = graft.search.Ddl.execute(spark,
      "DESCRIBE SEARCH INDEX docs_coverspec_idx")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("indexed_fields") == "lang,n_chars")
    assert(desc("included_columns") == "lang,source,n_chars")
    graft.search.Ddl.execute(spark, "DROP SEARCH INDEX docs_coverspec_idx")
    // after the drop, the same covered query must run on the base table
    val df = spark.sql(
      """SELECT doc_id, lang FROM graft_documents
        |WHERE ts_match(text, 'vector', 'whitespace') AND lang = 'en'""".stripMargin)
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    assert((df.inputFiles.toSet & base).nonEmpty,
      "after DROP the base scan must come back")
    val want = bruteMatched("vector").filter(col("lang") === "en")
      .select("doc_id", "lang").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(df.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == want.toSeq)
  }

  test("hyperloglog option: NDV + min/max stats surfaced and fed to the CBO") {
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir)
      .createOrReplaceTempView("graft_documents")
    graft.search.Ddl.execute(spark,
      s"""CREATE SEARCH INDEX coverspec_hll_idx ON graft_documents (text)
         |WITH (id = 'doc_id', analyzer = 'whitespace', key = 'coverspec-hll',
         |      hyperloglog = 'lang, n_chars')
         |INCLUDE (lang, source, n_chars)""".stripMargin)
    val rows = graft.search.Ddl
      .execute(spark, "DESCRIBE SEARCH INDEX coverspec_hll_idx")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val trueLang = docs.select("lang").distinct().count()
    val trueMin = docs.agg(min("n_chars")).head().getLong(0)
    // opted-in columns carry approx_unique, within HLL tolerance
    val ndvLang = rows("approx_unique.lang").toLong
    assert(ndvLang >= 1 && ndvLang <= trueLang * 2,
      s"approx_unique.lang=$ndvLang vs true $trueLang")
    assert(rows.contains("approx_unique.n_chars"))
    // the un-opted column has min/max-free string stats only — never NDV
    assert(!rows.contains("approx_unique.source"),
      "hyperloglog is per-column opt-in")
    // exact stats regardless of the option
    assert(rows("min.n_chars").toLong == trueMin)
    assert(rows("stored_rowcount").toLong == docs.count())
    assert(rows("nulls.lang").toLong == 0)
    // the CBO sees the same statistics on the registered stored table
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("coverspec_hll_idx_stored_tbl"))
    val cs = meta.stats.get.colStats
    assert(meta.stats.get.rowCount.get.toLong == docs.count())
    assert(cs("lang").distinctCount.isDefined &&
      cs("source").distinctCount.isEmpty)
    assert(cs("n_chars").min.get.toLong == trueMin)
  }

  test("complex INCLUDE columns (struct/array) are covered, nulls round-trip") {
    SqlSurface.registerAll(spark)
    val root = sys.props("java.io.tmpdir") + "/graft-coverspec-complex/docs"
    Tables.documents(spark, TestSpark.sfDir)
      .withColumn("payload",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(struct(
          when(col("doc_id") % 5 === 0, lit(null)).otherwise(col("lang")).as("name"),
          when(col("doc_id") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("n_chars")).as("score"))))
      .withColumn("tags",
        when(col("doc_id") % 11 === 0, lit(null))
          .otherwise(slice(filter(split(col("text"), "\\s+"), t => t =!= ""), 1, 3)))
      .write.mode("overwrite").parquet(root)
    spark.read.parquet(root).createOrReplaceTempView("coverspec_complex")
    graft.search.Ddl.execute(spark,
      s"""CREATE SEARCH INDEX coverspec_complex_idx ON coverspec_complex (text)
         |WITH (id = 'doc_id', analyzer = 'whitespace', key = 'coverspec-complex')
         |INCLUDE (payload, tags)""".stripMargin)
    val df = spark.sql(
      """SELECT doc_id, payload, payload.name AS pname, tags
        |FROM coverspec_complex
        |WHERE ts_match(text, 'vector', 'whitespace')""".stripMargin)
    val base = spark.read.parquet(root).inputFiles.toSet
    assert((df.inputFiles.toSet & base).isEmpty,
      "complex covered projection must not touch the base parquet")
    val want = spark.read.parquet(root)
      .filter(array_contains(
        filter(split(lower(col("text")), "\\s+"), t => t =!= ""), "vector"))
      .select(col("doc_id"), col("payload"), col("payload.name").as("pname"), col("tags"))
      .collect().map(_.toString).sorted
    val got = df.collect().map(_.toString).sorted
    assert(want.nonEmpty && got.sameElements(want))
    // the null shapes all occur in the fixture (parent, field, array)
    val all = spark.table("coverspec_complex")
    assert(all.filter(col("payload").isNull).count() > 0)
    assert(all.filter(col("payload").isNotNull && col("payload.name").isNull).count() > 0)
    assert(all.filter(col("tags").isNull).count() > 0)
  }

  test("a sidecar gone stale behind segment appends falls back to the base table") {
    ensure()
    val base = Tables.documents(spark, TestSpark.sfDir).inputFiles.toSet
    val q = () => spark.sql(
      """SELECT doc_id, lang FROM graft_documents
        |WHERE ts_match(text, 'vector', 'whitespace') AND lang = 'en'""".stripMargin)
    assert((q().inputFiles.toSet & base).isEmpty, "covered before the append")
    // simulate the streaming two-leg ingest: a segment lands in the text
    // index while the sidecar stays as built
    val ss = spark
    import ss.implicits._
    val dir = graft.index.IndexStore.dirFor(key, "text", "whitespace")
    val extra = Seq((900000L, "vector stream extra en")).toDF("doc_id", "text")
    graft.index.IndexStore.appendSegment(
      graft.index.InvertedIndex.build(extra, "doc_id", "text", "whitespace"), dir)
    spark.catalog.refreshByPath(dir)
    val after = q()
    assert((after.inputFiles.toSet & base).nonEmpty,
      "a stale sidecar must fall back to the base join, not drop newer docs")
    // results still correct (the phantom doc is not in the base table)
    val want = bruteMatched("vector").filter(col("lang") === "en")
      .select("doc_id", "lang").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(after.collect().map(_.toSeq).sortBy(_.head.toString).toSeq == want.toSeq)
    // clean slate for any later test using this key
    graft.search.Ddl.execute(spark, "DROP SEARCH INDEX docs_coverspec_idx")
  }
}
