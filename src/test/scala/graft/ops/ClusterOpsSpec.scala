package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic invariants for the embedding-cluster family (the oracle
  * pins exact values at sf0.01; these pin the ALGEBRA at sf0.001 so a
  * refactor that keeps hashes green by accident still can't change the
  * operators' meaning).
  */
class ClusterOpsSpec extends SparkTestBase {

  private def kmeans = ClusterOps.clusterKmeans(spark, sf)

  test("kmeans clusters partition the corpus exactly") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val total = emb.count()
    val idSum = emb.agg(sum("vec_id")).head.getLong(0)
    val rows = kmeans.collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total,
      "every vector lands in exactly one cluster")
    assert(rows.map(_.getAs[Long]("id_sum")).sum === idSum,
      "membership (pinned by id_sum) covers the corpus exactly once")
    assert(rows.length <= 8 && rows.length >= 2,
      s"expected 2..8 realized clusters, got ${rows.length}")
    spark.catalog.clearCache()
  }

  test("kmeans assigns every vector exactly once, to a valid cluster") {
    val assigned = ClusterOps.kmeansAssigned(spark, sf)
      .select(col("vec_id"), col("c"), col("cos")).collect()
    val total = graft.Tables.load(spark, sf, "embeddings").count()
    assert(assigned.length === total, "one assignment row per vector")
    assert(assigned.map(_.getAs[Long]("vec_id")).distinct.length ===
      assigned.length, "no vector assigned twice")
    assert(assigned.forall { r =>
      val c = r.getAs[Int]("c"); c >= 0 && c < 8
    }, "cluster ids stay in 0..K-1")
    assert(assigned.forall { r =>
      val cos = r.getAs[Double]("cos"); cos >= -1.0 && cos <= 1.0
    }, "cosines stay in [-1, 1]")
    spark.catalog.clearCache()
  }

  test("semantic dedup drops only higher ids and names a lower keeper") {
    val rows = ClusterOps.dedupSemantic(spark, sf).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("kept_for") < r.getAs[Long]("dropped")),
      "keeper must be the lower vec_id of the pair")
    assert(rows.map(_.getAs[Long]("dropped")).distinct.length === rows.length,
      "one verdict per dropped vector")
    spark.catalog.clearCache()
  }

  test("PQ/ADC search returns 10 ranked neighbors, excludes the probe") {
    val rows = ClusterOps.simPq(spark, sf).collect()
    assert(rows.length === 10, "top-10 after re-rank")
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L),
      "the probe vector never matches itself")
    val cosines = rows.map(_.getAs[Double]("cos"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
      "re-ranked output sorted by exact cosine descending")
    assert(cosines.forall(c => c >= -1.0 && c <= 1.0),
      "exact cosines stay in [-1, 1]")
    spark.catalog.clearCache()
  }

  test("PQ recall is measured against brute force and lands in [0, 1]") {
    val r = ClusterOps.simPqRecall(spark, sf).head
    assert(r.getAs[String]("method") === "pq_adc")
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.0 && recall <= 1.0)
    assert(r.getAs[Long]("hits") >= 3,
      s"ADC over 4x16-dim codebooks should recover at least 3 of the " +
        s"true top-10 at this sf; got ${r.getAs[Long]("hits")}")
    spark.catalog.clearCache()
  }

  test("int8 quantization reconstructs above the cosine floor") {
    val rows = ClusterOps.embedQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("ok")),
      "every vector must reconstruct above the 0.999 cosine floor")
    // Symmetric int8 bound: |q| ≤ 127 per element, 64 elements.
    assert(rows.forall(r => math.abs(r.getAs[Long]("sum_q")) <= 127L * 64),
      "quantized values must respect the int8 range")
  }
}
