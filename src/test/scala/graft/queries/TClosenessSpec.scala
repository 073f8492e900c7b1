package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** t-closeness (`profile_t_closeness`): the check must LOCALIZE the
  * engineered leak — every (nation%5=0, AUTOMOBILE) class is pushed
  * all-'high' by the +6000 shift, so each sits far above t=0.2 —
  * while at class sizes that outgrow sampling noise the honest
  * classes stay below t. Run at sf0.01 (the drift-spec discipline:
  * at sf0.001 per-class noise drowns localization).
  */
class TClosenessSpec extends SparkTestBase {
  private val sf01 = "/root/testdata/sf0.01"

  test("engineered classes all violate; distance formula is a true " +
      "total variation (0 for the corpus itself, <= 1 everywhere)") {
    val cls = CatalogQueries.tClosenessClasses(spark, sf01)
      .collect()
      .map(r => ((r.getAs[Number](0).longValue(), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap

    val engineered = cls.keys.filter { case (n, s) =>
      n % 5 == 0 && s == "AUTOMOBILE" }
    assert(engineered.size == 5, s"expected 5 engineered classes")
    engineered.foreach { k =>
      assert(cls(k)._2 > 0.2,
        s"engineered class $k must violate, dist=${cls(k)._2}")
    }
    // TVD bounds: every distance in [0, 1].
    cls.values.foreach { case (_, d) => assert(d >= 0.0 && d <= 1.0) }

    // The engineered classes are all-'high', so their distance equals
    // 1 - q('high') exactly: |1 - q_high| present-band term plus the
    // missing bands' mass (1 - q_high), halved.
    val balShift = when(col("c_nationkey") % 5 === 0 &&
      col("c_mktsegment") === "AUTOMOBILE",
      col("c_acctbal") + 6000.0).otherwise(col("c_acctbal"))
    val cust = graft.Tables.load(spark, sf01, "customer")
    val qHigh = cust.agg(
      (sum(when(balShift >= 5000, 1.0).otherwise(0.0)) / count(lit(1)))
        .as("q")).head().getDouble(0)
    engineered.foreach { k =>
      assert(math.abs(cls(k)._2 - (1.0 - qHigh)) < 1e-4,
        s"all-'high' class $k distance must be 1 - q(high)")
    }

    // Summary row is consistent with the class frame.
    val sum0 = CatalogQueries.tCloseness(spark, sf01).head()
    val violating = cls.values.filter(_._2 > 0.2)
    assert(sum0.getAs[Long]("n_groups") == cls.size)
    assert(sum0.getAs[Long]("n_violating_groups") == violating.size)
    assert(sum0.getAs[Long]("n_rows_at_risk") == violating.map(_._1).sum)
  }
}
