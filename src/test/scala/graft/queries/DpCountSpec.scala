package graft.queries

import graft.SparkTestBase

/** Laplace count release ([[CatalogQueries.dpCount]]): the mechanism's
  * arithmetic envelope and its seeded reproducibility. The inverse-CDF
  * transform over a (0,1) uniform quantized to 2⁻²⁴ bounds |noise| by
  * 2·ln(2²⁴) ≈ 33.3; the seed makes the release a pure function of the
  * input (two runs bit-identical), which is the property the oracle
  * check leans on.
  */
class DpCountSpec extends SparkTestBase {

  test("noise is bounded, mostly non-zero, and seeded-reproducible") {
    val out = CatalogQueries.dpCount(spark, sf).collect()
    assert(out.length == 25, "one row per nation")
    val noises = out.map(r => r.getDouble(2) - r.getLong(1).toDouble)
    assert(noises.forall(n => math.abs(n) <= 2.0 * math.log(1 << 24) + 1e-6),
      "inverse-CDF over a 2^-24-quantized uniform bounds |noise|")
    assert(noises.count(_ != 0.0) >= 20,
      "a degenerate all-zero release means the transform collapsed")
    assert(out.forall(_.getDouble(3) == 0.5), "published epsilon")
    val again = CatalogQueries.dpCount(spark, sf).collect()
    assert(out.map(_.toSeq.toList).toList ==
      again.map(_.toSeq.toList).toList,
      "the seeded draw must be a pure function of the input")
  }
}
