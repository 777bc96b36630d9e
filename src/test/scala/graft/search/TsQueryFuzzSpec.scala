package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.index.InvertedIndex
import TsQuery._

/** Property fuzz (SURVEY §5: "random predicates, index vs full-scan row-set
  * equality" — the null-semantics-fuzz analogue): random query trees over a
  * small vocabulary evaluated two ways, through the index join plans and
  * through the row-level evaluator, must agree on every corpus. */
@graft.SlowTest
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

  /** The r16 VERDICT's GramSim fidelity ask: the indexed LCS kernel and the
    * row evaluator must agree on random gram sequences INCLUDING duplicate
    * grams and order-scrambled docs — the shapes where the old set-overlap
    * arithmetic diverged from the reference's longest-common-gram-sequence
    * semantics (ngram_similarity_query.cpp). */
  test("GramSim: indexed LCS kernel equals row evaluation, duplicates included") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val grams = Vector("ab", "bc", "cd", "de", "ef")
    // docs whose TOKENS already are grams — a gram-tokenized field
    val docs = (0L until 150L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(12))(grams(rnd.nextInt(grams.size))).mkString(" "))
    }
    val idx = InvertedIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text",
      "whitespace")
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    (1 to 20).foreach { i =>
      // duplicates are likely at this vocabulary size — deliberately so
      val q = GramSim(Seq.fill(1 + rnd.nextInt(6))(grams(rnd.nextInt(grams.size))),
        rnd.nextInt(11) / 10.0)
      val got = TsQueryExec.matching(idx, q).collect().map(_.getLong(0)).toSet
      val want = toks.collect { case (id, ts) if TsQueryExec.evalTokens(q, ts) => id }.toSet
      assert(got == want, s"gramsim fuzz #$i diverged for $q")
    }
  }

  test("GramSim kernels: LCS order-sensitivity, duplicate denominator, empty query") {
    import graft.functions.TsDistances._
    // order matters: doc (tor ... vec) holds both grams but never in order
    assert(lcsLen(IndexedSeq("vec", "ect"), Seq("ect", "xxx", "vec")) == 1)
    assert(lcsLen(IndexedSeq("vec", "ect"), Seq("vec", "xxx", "ect")) == 2)
    // duplicate query grams count individually against repeated doc grams
    assert(lcsLen(IndexedSeq("ab", "ba", "ab"), Seq("ab", "ba", "ab", "ba")) == 3)
    // MinMatchCount: FULL sequence length in the denominator, clamped ≥ 1
    assert(minMatchCount(2, 0.0) == 1) // threshold 0 still needs one gram
    assert(minMatchCount(4, 0.5) == 2)
    assert(minMatchCount(3, 1.0) == 3)
    assert(minMatchCount(2, 0.6) == 2) // ceil over duplicates-included count
    // float_t arithmetic parity (r17 ADVICE): the reference multiplies and
    // ceils at FLOAT precision — boundary thresholds round differently than
    // double (0.3f·50 lands just above 15 → 16; 0.56f·25 lands exactly on
    // 14.0f → 14, where double gives 15)
    assert(minMatchCount(50, 0.3) == 16)
    assert(minMatchCount(25, 0.56) == 14)
    // empty-gram query matches nothing on BOTH paths instead of erroring
    // (the reference returns QueryBuilder::Empty; r16 ADVICE item 1)
    val spark = TestSpark.spark
    import spark.implicits._
    val idx = InvertedIndex.build(
      Seq((1L, "ab bc")).toDF("doc_id", "text"), "doc_id", "text", "whitespace")
    assert(TsQueryExec.matching(idx, GramSim(Nil, 0.5)).count() == 0)
    assert(!TsQueryExec.evalTokens(GramSim(Nil, 0.5), Seq("ab", "bc")))
  }
}
