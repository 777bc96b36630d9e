package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.IndexStore

/** Search-Benchmark-Game protocol harness (BASELINE.md row 1; reference
  * tests/bench/search-benchmark-game/do_query.cpp:14-24 — ops COUNT /
  * TOP_10 / TOP_100 / TOP_1000, executor.cpp:29-99 runs each against the
  * BM25-scored index reader). The Spark analogue drives the SAME persisted
  * index the claimed entries use: COUNT materializes the matched doc set,
  * TOP_k is the BM25 postings drive restricted to the class's filter
  * (conjunction / disjunction / phrase — the game's query classes).
  * `block` times one warm pass per (class, op) and returns a JSON fragment
  * for Bench's headline line. */
object SearchBench {

  private final case class QueryClass(
      name: String, terms: Seq[String], filter: graft.index.InvertedIndex => DataFrame)

  def block(spark: SparkSession, sfDir: String): String = {
    val idx = IndexStore.documents(spark, sfDir, "whitespace")
    // vocabulary drawn from the fixture corpus; same shapes as the ts_*
    // entries so the timed plans are the production claim paths
    val classes = Seq(
      QueryClass("term", Seq("vector"), _.term("vector")),
      QueryClass("intersection", Seq("window", "filter", "stream"),
        _.allOf(Seq("window", "filter", "stream"))),
      QueryClass("union", Seq("join", "hash", "merge"),
        _.anyOf(Seq("join", "hash", "merge"))),
      QueryClass("phrase", Seq("hash", "join"), _.phrase(Seq("hash", "join"))))
    val ks = Seq(10, 100, 1000)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def topK(c: QueryClass, k: Int): DataFrame = c.name match {
      // a pure disjunction's match set IS the scored set — the plain WAND
      // top-k drive, no extra join
      case "union" => idx.bm25TopK(c.terms, k)
      case _ => idx.bm25(c.terms)
        .join(c.filter(idx), "doc_id")
        .orderBy(col("_score").desc, col("doc_id"))
        .limit(k)
    }

    val entries = classes.map { c =>
      // untimed warmup per class: footer reads + codegen off the clock,
      // matching the harness policy for the main entry loop
      c.filter(idx).write.mode("overwrite").format("noop").save()
      topK(c, 10).write.mode("overwrite").format("noop").save()
      val count = time(c.filter(idx))
      val tops = ks.map(k => f""""TOP_$k%d":${time(topK(c, k))}%.3f""")
      s""""${c.name}":{"COUNT":${f"$count%.3f"},${tops.mkString(",")}}"""
    }
    s""","sbg":${entries.mkString("{", ",", "}")}"""
  }
}
