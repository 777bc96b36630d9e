package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class IvfIndexSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def embs = Tables.embeddings(spark, TestSpark.sfDir)

  test("auto list count is ~sqrt(N)") {
    assert(IvfIndex.autoK(500) == 23)
    assert(IvfIndex.autoK(1000000) == 1000)
    assert(IvfIndex.autoK(10) == 4)
  }

  test("IVF knn recall >= 0.9 vs exact at default nprobe") {
    val idx = IvfIndex.build(embs)
    assert(idx.numLists == 23)

    val all = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val q = all.find(_._1 == 0L).get._2
    def l2sq(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val exact = all.map { case (id, e) => (id, l2sq(e, q)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet

    val got = idx.knn(q, 10).collect().map(_.getLong(0)).toSet
    val recall = (got & exact).size / 10.0
    assert(recall >= 0.9, s"IVF recall $recall below 0.9 (got=$got exact=$exact)")
  }
}
