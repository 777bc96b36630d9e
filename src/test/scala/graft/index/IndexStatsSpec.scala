package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Manifest-fed statistics must actually change optimizer decisions: with
  * CBO on and the same physical data, the plan flips from a sort-merge join
  * to a broadcast hash join (build side = the stats-estimated-tiny filtered
  * dictionary) once the catalog tables carry rowCount + term NDV. */
class IndexStatsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("manifest stats flip the join build side under CBO") {
    val s = spark
    IndexStore.documents(s, TestSpark.sfDir) // ensure built
    val dir = IndexStore.dirFor(s"${TestSpark.sfDir}-documents", "text", "whitespace")

    // WITH manifest stats
    IndexStore.registerStatsTables(s, dir, "statspec")
    // WITHOUT stats: same files, plain catalog tables
    s.sql("DROP TABLE IF EXISTS nostat_termdict_tbl")
    s.sql(s"CREATE TABLE nostat_termdict_tbl USING parquet OPTIONS (path '$dir/seg=*/termdict')")
    s.sql("DROP TABLE IF EXISTS nostat_postings_tbl")
    s.sql(s"CREATE TABLE nostat_postings_tbl USING parquet OPTIONS (path '$dir/seg=*/postings')")

    val oldCbo = s.conf.get("spark.sql.cbo.enabled", "false")
    val oldThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      s.conf.set("spark.sql.adaptive.enabled", "false") // deterministic plan

      def plan(prefix: String): String =
        s.sql(
          s"""SELECT p.doc_id FROM ${prefix}_termdict_tbl t
             |JOIN ${prefix}_postings_tbl p ON t.term = p.term
             |WHERE t.term = 'vector'""".stripMargin)
          .queryExecution.executedPlan.toString

      val without = plan("nostat")
      val withStats = plan("statspec")

      assert(!without.contains("BroadcastHashJoin"),
        s"without stats the filtered dict must not be assumed tiny:\n$without")
      assert(withStats.contains("BroadcastHashJoin"),
        s"with rowCount+NDV the filtered dict side must broadcast:\n$withStats")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", oldCbo)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      s.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
