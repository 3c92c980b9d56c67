package graft

import org.scalatest.funsuite.AnyFunSuite

/** Correctness evidence for q57_sample_split, which is rows-only by
  * construction (Spark's seeded Bernoulli sampler and randomSplit are
  * engine-specific, so no cross-engine oracle exists):
  *  - sample(0.1) lands within a 4-sigma binomial band of 10%;
  *  - sample is reproducible for a fixed seed;
  *  - randomSplit pieces are disjoint and partition the input exactly.
  */
class SampleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf001

  test("sample(0.1, seed) is reproducible and within 4 sigma of 10%") {
    val o = Tables.orders(spark, dir)
    val n = o.count()
    val s1 = o.sample(withReplacement = false, 0.1, 42L).count()
    val s2 = o.sample(withReplacement = false, 0.1, 42L).count()
    assert(s1 == s2, "seeded sample not reproducible")
    val sigma = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(s1 - 0.1 * n) <= 4 * sigma,
      s"sample kept $s1 of $n rows — outside 10% ± 4 sigma ($sigma)")
  }

  test("randomSplit(0.7, 0.3) partitions the input: disjoint and complete") {
    val o = Tables.orders(spark, dir).select("o_orderkey")
    val Array(a, b) = o.randomSplit(Array(0.7, 0.3), seed = 42L)
    val (na, nb, n) = (a.count(), b.count(), o.count())
    assert(na + nb == n, s"split lost/duplicated rows: $na + $nb != $n")
    assert(a.intersect(b).count() == 0, "split pieces overlap")
    val sigma = math.sqrt(n * 0.7 * 0.3)
    assert(math.abs(na - 0.7 * n) <= 4 * sigma,
      s"70% piece got $na of $n — outside 4 sigma")
  }
}
