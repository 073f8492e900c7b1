package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** The Misra-Gries sketch's two regimes: exact when distinct keys fit
  * the capacity (the oracle hash-checks that at sf0.01; here we pin it
  * against an independently computed exact top-k), and bounded-error
  * under forced overflow — the published n/(capacity+1) guarantee,
  * exercised both on the raw Aggregator (deterministic fold + merges)
  * and through a real shuffled Spark aggregation.
  */
class HeavyHittersSpec extends SparkTestBase {

  test("exact regime matches an independently computed exact top-3") {
    val got = Relational.aggHeavyHitters(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[String]("hh"))
      .toMap
    val exact = graft.Tables.load(spark, sf, "orders")
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect()
      .groupBy(_.getAs[String]("o_orderstatus"))
      .map { case (st, rows) =>
        st -> rows
          .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("count"))
          .sortBy { case (k, v) => (-v, k) }
          .take(3).map { case (k, v) => s"$k:$v" }.mkString("|")
      }
    assert(got === exact, "capacity 8 > 5 distinct keys ⇒ sketch is exact")
  }

  /** 60×hot + 40 singletons, capacity 4: n=100 ⇒ error bound
    * n/(cap+1) = 20. The hot key's true count 60 > 20, so it MUST
    * survive, with reported count in [40, 60].
    */
  private val synthetic: Seq[String] = new Random(42).shuffle(
    Seq.fill(60)("hot") ++ (1 to 40).map(i => f"k$i%02d"))

  private def hotCountOf(finish: String): Option[Long] =
    finish.split('|').toSeq
      .map(_.split(':')).collectFirst { case Array("hot", n) => n.toLong }

  test("overflow regime keeps the heavy key within the MG bound (fold)") {
    val agg = HeavyHitters(capacity = 4, topK = 3)
    val folded = synthetic.foldLeft(agg.zero)(agg.reduce)
    assert(folded.size <= 4, "buffer never exceeds capacity")
    val hot = hotCountOf(agg.finish(folded))
    assert(hot.exists(c => c >= 40L && c <= 60L),
      s"hot must survive with count in [40,60], got $hot")
  }

  test("overflow regime survives arbitrary partitioning + merge order") {
    val agg = HeavyHitters(capacity = 4, topK = 3)
    for (parts <- Seq(2, 3, 7)) {
      val buffers = synthetic.grouped(
        math.ceil(synthetic.size / parts.toDouble).toInt)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = buffers.reduce(agg.merge)
      assert(merged.size <= 4, s"merged buffer bounded at parts=$parts")
      val hot = hotCountOf(agg.finish(merged))
      assert(hot.exists(c => c >= 40L && c <= 60L),
        s"hot within MG bound after $parts-way merge, got $hot")
    }
  }

  test("overflow regime through a real shuffled Spark aggregation") {
    import spark.implicits._
    val hh = udaf(HeavyHitters(capacity = 4, topK = 3))
    val out = synthetic.toDF("k").repartition(4)
      .agg(hh(col("k")).as("hh")).head.getAs[String]("hh")
    val hot = hotCountOf(out)
    assert(hot.exists(c => c >= 40L && c <= 60L),
      s"hot within MG bound through partial/final aggregation, got $hot")
  }
}
