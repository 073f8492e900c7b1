package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic invariants of the sign-bit quantization search: the packed
  * popcount-of-XOR Hamming must equal the unpacked sign-mismatch count
  * (the identity the DuckDB oracle relies on), and the audit's recall
  * must be a well-formed fraction of k.
  */
class SimBinarySpec extends SparkTestBase {

  test("packed Hamming equals unpacked sign-mismatch count") {
    val res = LlmOps.simBinary(spark, sf)
      .select("vec_id", "ham", "cos").collect()
    assert(res.length === 10, "top-10 re-ranked rows")
    assert(res.forall { r =>
      val h = r.getAs[Long]("ham"); h >= 0L && h <= 64L
    }, "Hamming distance of 64-bit signatures stays in [0, 64]")
    assert(res.forall { r =>
      val c = r.getAs[Double]("cos"); c >= -1.0 && c <= 1.0
    }, "cosines stay in [-1, 1]")

    // recompute the mismatch count WITHOUT packing, from the floats
    val emb = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probe = emb.filter(col("vec_id") === 0)
      .select(col("v").as("p"))
    val unpacked = emb.crossJoin(broadcast(probe))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("v"), col("p"),
            (x, y) => when((x >= 0d) =!= (y >= 0d), lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, b) => a + b).as("mismatches"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("mismatches"))
      .toMap
    res.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("ham") === unpacked(id),
        s"popcount(xor(sig)) must equal the sign-mismatch count for vec $id")
    }
  }

  test("recall audit is a well-formed fraction of k") {
    val r = LlmOps.simBinaryRecall(spark, sf).head
    val (k, hits, recall) =
      (r.getAs[Int]("k"), r.getAs[Long]("hits"), r.getAs[Double]("recall"))
    assert(k === 10)
    assert(hits >= 0L && hits <= k.toLong, "hits bounded by k")
    assert(math.abs(recall - hits.toDouble / k) < 1e-9,
      "recall is exactly hits/k (rounded to 2dp upstream)")
  }
}
