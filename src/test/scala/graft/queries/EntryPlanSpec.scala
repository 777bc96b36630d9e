package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan shape for the round-6 pack entries: filters must reach the
  * parquet scan (PushedFilters) and the scan must read only the columns the
  * entry projects (ReadSchema pruning) — the "would this survive a 100×
  * scale-up" properties, pinned so refactors can't silently lose them. */
class EntryPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("array_pack pushes its key filter and prunes to two columns") {
    val p = planOf(Extras.arrayPack(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), LessThanOrEqual(p_partkey,2000)]"), p.take(2000))
    assert(p.contains("ReadSchema") && p.contains("p_name") && !p.contains("p_retailprice"))
  }

  test("window_pack pushes its key filter into the orders scan") {
    val p = planOf(Extras.windowPack(spark, dir))
    assert(p.contains("LessThan(o_orderkey,5000)"), p.take(2000))
    assert(!p.contains("o_orderstatus"), "scan must not read unprojected columns")
  }

  test("temporal_agg reads only ts and event_type") {
    val p = planOf(Extras.temporalAgg(spark, dir))
    // don't pin ts's physical encoding — the testdata has shipped both
    // nanos-as-long and timestamp[us]; what matters is the 2-column pruning
    assert("ReadSchema: struct<ts:[^,>]+,event_type:string>".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  /** Scan roots of every parquet relation in the optimized logical plan —
    * executedPlan strings truncate file paths, so shape assertions go
    * against the relations themselves. */
  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  test("ts_dict_fuzzy is a pure dictionary read — no tokenize, no postings") {
    val df = Search.tsDictFuzzy(spark, dir)
    val p = planOf(df)
    assert(!p.contains("ts_tokenize") && !p.contains("Generate"),
      "fuzzy dict probe must not tokenize or explode")
    assert(p.contains("levenshtein"), "the thresholded edit distance runs over dict rows")
    val roots = scanRoots(df)
    assert(roots.nonEmpty && roots.forall(_.contains("termdict")),
      s"must read ONLY the term dictionary, scans: $roots")
  }

  test("ts_dict_cartesian drives from two indexes' postings — nothing tokenizes") {
    val df = Search.tsDictCartesian(spark, dir)
    val p = planOf(df)
    assert(!p.contains("ts_tokenize") && !p.contains("Generate"),
      "the cartesian facet must not re-tokenize either field")
    val roots = scanRoots(df)
    assert(roots.count(_.contains("postings")) >= 2,
      s"both fields must drive from index postings, scans: $roots")
    assert(roots.exists(r => r.contains("-source-") && r.contains("postings")),
      s"the keyword source index is one of the drives: $roots")
  }

  test("summarize_table prunes the lineitem scan to the profiled columns") {
    val p = planOf(Extras.summarizeTable(spark, dir))
    assert(!p.contains("l_discount") && !p.contains("l_tax"),
      "melt must not widen the scan past the profiled columns")
  }
}
