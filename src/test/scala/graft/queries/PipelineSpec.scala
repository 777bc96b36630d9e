package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class PipelineSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sfDir

  test("sample_split is a total, deterministic, hash-stable partition") {
    val docs = Tables.documents(spark, sf)
    val split = Pipeline.sampleSplit(spark, sf)
    assert(split.count() == docs.count(), "every doc gets exactly one split")
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // re-running yields the identical assignment (no RNG anywhere)
    val again = Pipeline.sampleSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc == again)
    // a doc's split is independent of the rest of the corpus: recompute one
    // doc's hash by hand
    val md = java.security.MessageDigest.getInstance("MD5")
    val (id, got) = byDoc.head
    val hex = md.digest(s"split:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 4)
    val want = if (hex < "0ccd") "val" else if (hex < "199a") "test" else "train"
    assert(got == want)
    assert(byDoc.values.toSet.subsetOf(Set("train", "test", "val")))
  }

  test("sample_stratified takes exactly ceil(n/10) per stratum") {
    val docs = Tables.documents(spark, sf)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Pipeline.sampleStratified(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == perLang.keySet)
    perLang.foreach { case (lang, n) =>
      assert(got(lang) == (n + 9) / 10, s"stratum $lang quota")
    }
  }

  test("contamination flags exactly the docs sharing a 4-gram with the eval slice") {
    // brute-force ground truth over the collected corpus
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
    def grams(ts: Array[String]): Set[String] =
      if (ts.length < 4) Set.empty
      else (0 to ts.length - 4).map(i => ts.slice(i, i + 4).mkString(" ")).toSet
    val evalSh = rows.filter(_._1 % 97 == 0).flatMap(r => grams(r._2)).toSet
    val want = rows.filter(_._1 % 97 != 0)
      .map { case (id, ts) => id -> grams(ts).count(evalSh.contains).toLong }
      .filter(_._2 > 0).toMap
    val got = Pipeline.taContamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("curate applies the first failing rule and keeps only 'ok' docs") {
    val out = Pipeline.pipelineCurate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(out.forall { case (_, reason, keep) => keep == (reason == "ok") })
    val reasons = out.map(_._2).toSet
    // the thresholds are tuned so the corpus exercises short/uniq/repetitive
    // and duplicate rules, not just 'ok'
    assert(reasons.contains("ok"))
    assert((reasons - "ok").nonEmpty, s"only $reasons — thresholds test nothing")
    // rule order: a doc that is both short and a dup must report too_short
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty))
    val short = docs.filter(_._2.length < 20).map(_._1).toSet
    out.filter(o => short.contains(o._1)).foreach { case (_, reason, _) =>
      assert(reason == "too_short")
    }
  }
}
