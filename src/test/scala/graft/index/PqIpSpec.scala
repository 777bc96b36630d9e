package graft.index

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The PQ inner-product ADC path (reference quant='pq' metric='ip',
  * inverted_index_ivf_pq.test §2): codes decode to centroid residuals, so
  * ⟨q,x⟩ ≈ ⟨q,c⟩ + Σ_sub ipLUT[sub][code[sub]] with an exact raw rerank on
  * the pool. The oracle entry pins overlap-with-exact at 10; this spec is
  * the fast local gate for the same invariant. */
@graft.SlowTest
class PqIpSpec extends AnyFunSuite {
  test("PQ knnIp recall: full overlap with exact-IP top-10 at test sf") {
    val n = graft.queries.Vectors.ivfPqIp(TestSpark.spark, TestSpark.sfDir)
      .head().getLong(0)
    assert(n == 10, s"pq-ip overlap with exact-IP top-10 was $n")
  }
}
