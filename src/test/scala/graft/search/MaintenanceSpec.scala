package graft.search

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Millis, Seconds, Span}
import graft.{Tables, TestSpark}
import graft.index.IndexStore

/** Background maintenance loops (reference server/search/maintenance.h:36-44:
  * periodic refresh + consolidation, knobs `refresh_interval` /
  * `compaction_interval`). The contract proven here: an append to the source
  * becomes SEARCH-VISIBLE with no manual REFRESH, and continuous ingest's
  * segment fan-in is bounded by the compaction tick. */
@graft.SlowTest
class MaintenanceSpec extends AnyFunSuite with Eventually {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  implicit override val patienceConfig: PatienceConfig =
    PatienceConfig(timeout = Span(60, Seconds), interval = Span(250, Millis))

  test("an appended source row becomes search-visible without a manual REFRESH") {
    val docs = Tables.documents(spark, dir)
    docs.limit(60).createOrReplaceTempView("maint_docs")
    Ddl.execute(spark,
      s"CREATE SEARCH INDEX maint_idx ON maint_docs (text) " +
        s"WITH (id = 'doc_id', analyzer = 'whitespace', key = 'maint-${System.nanoTime()}')")
    val e = Ddl.catalog("maint_idx")
    def visibleDocs(): Long = IndexStore.load(spark, e.dir).numDocs
    val before = visibleDocs()

    Maintenance.start(spark, Maintenance.Config(
      refreshIntervalMs = 500, compactionIntervalMs = 3600000L,
      only = Some(Set("maint_idx"))))
    try {
      // "ingest": the source view now holds more rows; NOBODY calls REFRESH
      docs.limit(130).createOrReplaceTempView("maint_docs")
      eventually {
        assert(visibleDocs() > before,
          "the refresh tick must make appended rows search-visible")
      }
      assert(visibleDocs() == 130)
    } finally {
      Maintenance.stop(spark)
      Ddl.execute(spark, "DROP SEARCH INDEX maint_idx")
    }
  }

  test("maintenance knobs are session-conf settable (reference SET refresh_interval)") {
    spark.sql("SET spark.graft.maintenance.refreshIntervalMs=1234")
    spark.sql("SET spark.graft.maintenance.compactMinSegments=7")
    try {
      val cfg = Maintenance.configFrom(spark)
      assert(cfg.refreshIntervalMs == 1234L)
      assert(cfg.compactMinSegments == 7)
      assert(cfg.compactionIntervalMs == Maintenance.Config().compactionIntervalMs)
    } finally {
      spark.conf.unset("spark.graft.maintenance.refreshIntervalMs")
      spark.conf.unset("spark.graft.maintenance.compactMinSegments")
    }
  }

  test("the compaction tick bounds segment fan-in under continuous ingest") {
    val docs = Tables.documents(spark, dir)
    docs.limit(40).createOrReplaceTempView("maintc_docs")
    Ddl.execute(spark,
      s"CREATE SEARCH INDEX maintc_idx ON maintc_docs (text) " +
        s"WITH (id = 'doc_id', analyzer = 'whitespace', key = 'maintc-${System.nanoTime()}')")
    val e = Ddl.catalog("maintc_idx")
    // grow in 3 manual refresh steps → 4 live segments
    Seq(80, 120, 160).foreach { n =>
      docs.limit(n).createOrReplaceTempView("maintc_docs")
      Ddl.execute(spark, "REFRESH SEARCH INDEX maintc_idx")
    }
    assert(IndexStore.listSegments(spark, e.dir).size >= 4)
    val expected = IndexStore.load(spark, e.dir).term("vector").count()

    Maintenance.start(spark, Maintenance.Config(
      refreshIntervalMs = 3600000L, compactionIntervalMs = 500,
      compactMinSegments = 4, only = Some(Set("maintc_idx"))))
    try {
      eventually {
        assert(IndexStore.listSegments(spark, e.dir).size == 1,
          "the compaction tick must merge the segment backlog")
      }
      assert(IndexStore.load(spark, e.dir).term("vector").count() == expected,
        "compaction must not change results")
    } finally {
      Maintenance.stop(spark)
      Ddl.execute(spark, "DROP SEARCH INDEX maintc_idx")
    }
  }
}
