package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The frozen-model plan-literal budget (r8 verdict #3): size is measured
  * at every freeze point, a grown model fails loudly with the persisted-
  * index remediation, and every model shipped today is far inside the cap.
  */
class ModelBudgetSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("sizeOf is monotone in the payload and sees nested structures") {
    val small = Seq.fill(8)((1L, Seq.fill(64)(1L), 1L))
    val big = Seq.fill(1024)((1L, Seq.fill(64)(1L), 1L))
    assert(ModelBudget.sizeOf(big) > ModelBudget.sizeOf(small))
    assert(ModelBudget.sizeOf(small) > 64L * 8) // at least the raw longs
  }

  test("a model over the cap fails loudly, naming the join-path remediation") {
    val over = new Array[Byte]((ModelBudget.MaxModelBytes + 4096).toInt)
    val e = intercept[IllegalArgumentException](
      ModelBudget.assertWithinBudget("test blob", over))
    assert(e.getMessage.contains("plan-literal budget"))
    assert(e.getMessage.contains("writeIvfIndex"))
    // and just under the cap passes
    ModelBudget.assertWithinBudget("under",
      new Array[Byte]((ModelBudget.MaxModelBytes - 4096).toInt))
  }

  test("every shipped frozen model passes its freeze-point assert") {
    val spark = TestSpark.spark
    // each of these runs assertWithinBudget inside its freeze point:
    // ivf centroid collect (knn join), the frozen assigner (ivf_assign),
    // the dsir scorer, and the BPE merge list
    Seq("q_similarity_knn_join", "q_similarity_ivf_assign",
        "q_sample_dsir", "q_text_bpe_encode").foreach { q =>
      assert(graft.SparkEntry.queries(q)(spark, sf).count() > 0, q)
    }
    // today's K=16, d=64 centroid model is ~3 orders of magnitude inside
    // the 16 MiB budget — a retrain has real headroom before the guard
    val model = Seq.tabulate(16)(i => (i.toLong, Seq.fill(64)(1000000L), 1L))
    assert(ModelBudget.sizeOf(model) < ModelBudget.MaxModelBytes / 256)
  }
}
