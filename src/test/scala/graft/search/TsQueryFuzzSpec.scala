package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.index.InvertedIndex
import TsQuery._

/** Property fuzz (SURVEY §5: "random predicates, index vs full-scan row-set
  * equality" — the null-semantics-fuzz analogue): random query trees over a
  * small vocabulary evaluated two ways, through the index join plans and
  * through the row-level evaluator, must agree on every corpus. */
class TsQueryFuzzSpec extends AnyFunSuite {

  private val vocab = Vector("a", "b", "c", "d", "e", "f")

  private def randomQuery(rnd: scala.util.Random, depth: Int): TsQuery =
    if (depth <= 0) {
      rnd.nextInt(3) match {
        case 0 => Term(vocab(rnd.nextInt(vocab.size)))
        case 1 => Prefix(vocab(rnd.nextInt(vocab.size)))
        case _ => Phrase(Seq.fill(1 + rnd.nextInt(2))(vocab(rnd.nextInt(vocab.size))))
      }
    } else rnd.nextInt(4) match {
      case 0 => And(Seq.fill(2)(randomQuery(rnd, depth - 1)))
      case 1 => Or(Seq.fill(2)(randomQuery(rnd, depth - 1)))
      case 2 => Not(randomQuery(rnd, depth - 1))
      case _ => randomQuery(rnd, depth - 1)
    }

  test("random query trees: index plans equal row evaluation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    val docs = (0L until 200L).map { id =>
      (id, Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docsDf = docs.toDF("doc_id", "text")
    val idx = InvertedIndex.build(docsDf, "doc_id", "text", "whitespace")
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap

    (1 to 25).foreach { i =>
      val q = randomQuery(rnd, 3)
      val got = TsQueryExec.matching(idx, q).collect().map(_.getLong(0)).toSet
      val want = toks.collect { case (id, ts) if TsQueryExec.evalTokens(q, ts) => id }.toSet
      assert(got == want, s"fuzz #$i diverged for $q")
    }
  }
}
