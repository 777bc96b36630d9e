package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property check: the tagged-union window formulation equals the obvious
  * per-row definition (for each left row, the latest right row with
  * right.t <= left.t on the same key). */
class AsOfJoinSpec extends AnyFunSuite {

  test("asOfBackward matches the per-row oracle on random data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)

    val left = (1 to 300).map(i => (rnd.nextInt(10), rnd.nextInt(1000), i))
    val right = (0 until 10).flatMap { k =>
      rnd.shuffle((0 until 1000).toList).take(30).map(t => (k, t, s"p$k-$t"))
    }
    val leftDf = left.toDF("k", "t", "i")
    val rightDf = right.toDF("k", "rt", "payload")

    val got = AsOfJoin.asOfBackward(leftDf, rightDf, "k", "k", "t", "rt", Seq("payload"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap

    val byKey = right.groupBy(_._1)
    val want = left.map { case (k, t, i) =>
      val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3).orNull
      (k, t, i) -> best
    }.toMap

    assert(got.size == left.size)
    val diffs = want.collect { case (key, w) if got(key) != w => (key, got(key), w) }
    assert(diffs.isEmpty, s"mismatches: ${diffs.take(5)}")
  }
}
