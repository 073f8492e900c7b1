package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Invariants for the SMT family (outbox router + column masking) that
  * hold on any fixture — the oracle pins the exact values.
  */
class OutboxSpec extends SparkTestBase {

  test("outbox: delete wave dropped; every insert routed exactly once") {
    val rows = OutboxQueries.outbox(spark, sf).collect()
    val orders = Tables.load(spark, sf, "orders")
    val nOrders = orders.count()
    assert(rows.map(_.getLong(2)).sum == nOrders,
      "router must forward every insert and nothing from the delete wave")
    // every aggregate id is unique per order, so per-cell distinct
    // aggregates equal per-cell event counts
    rows.foreach(r => assert(r.getLong(2) == r.getLong(3),
      s"${r.getString(1)}: aggregate ids must be 1:1 with events"))
    assert(rows.forall(_.getString(0) == "outbox.event.order"),
      "all events of one aggregate type route to one topic")
  }

  test("outbox: payload JSON round-trip preserves the summed measure") {
    val viaJson = OutboxQueries.outbox(spark, sf)
      .agg(round(sum("total"), 2)).head.getDouble(0)
    val direct = Tables.load(spark, sf, "orders")
      .agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    assert(math.abs(viaJson - direct) < 0.05,
      s"payload total $viaJson drifted from source total $direct")
  }

  test("column_mask: mask preserves length, hash matches source, truncate<=3") {
    val masked = OutboxQueries.columnMask(spark, sf)
      .select("c_custkey", "c_name", "c_name_hash", "c_mktsegment")
    val base = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("orig_name"))
    val joined = masked.join(base, col("c_custkey") === col("k")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (mask, hash, seg, orig) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(5))
      assert(mask.length == orig.length && mask.forall(_ == '*'),
        "mask must be a same-length '*' run")
      assert(!mask.contains(orig.take(3)),
        "no cleartext may survive masking")
      assert(hash == java.security.MessageDigest.getInstance("MD5")
        .digest(orig.getBytes("UTF-8")).map("%02x".format(_)).mkString,
        "hash column must digest the ORIGINAL value")
      assert(seg.length <= 3, "segment must truncate to 3 chars")
    }
  }

  test("stream_outbox converges to the batch router's published columns") {
    val streamed = graft.ops.StreamingOps.streamOutbox(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val batch = OutboxQueries.outbox(spark, sf)
      .select("topic", "event_type", "n_events", "total").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, (n, total)) =>
      assert(n == batch(k)._1, s"$k: streamed count $n != batch ${batch(k)._1}")
      assert(math.abs(total - batch(k)._2) < 0.05,
        s"$k: streamed total $total drifted from batch ${batch(k)._2}")
    }
  }

  test("column_mask: row set equals the merged state's keys") {
    val maskKeys = OutboxQueries.columnMask(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val mergeKeys = CdcQueries.mergeCustomer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(maskKeys == mergeKeys,
      "masking must not add or drop rows relative to the merge")
  }
}
