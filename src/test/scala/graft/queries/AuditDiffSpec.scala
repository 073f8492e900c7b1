package graft.queries

import graft.SparkTestBase

/** `cdc_audit_diff` semantics: the audit is a telescoping transition
  * log — each event's effective old value is the previous event's new
  * value, regardless of what the (non-cumulative) envelope before-image
  * claimed.
  */
class AuditDiffSpec extends SparkTestBase {

  test("audit chains telescope per key; deletes close the chain") {
    val rows = CdcQueries.auditDiff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (key, evs) =>
      val hist = evs.sortBy(_._2)
      // Telescoping: old(k) == new(k-1) for every adjacent pair.
      hist.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur._4 == prev._5,
            s"key $key ts ${cur._2}: old ${cur._4} != previous new ${prev._5}")
        case _ => ()
      }
      // The delete wave hits exactly the pk%7 keys, with a NULL new value.
      val hasDelete = hist.exists(_._3 == "d")
      assert(hasDelete == (key % 7 == 0), s"key $key delete presence wrong")
      if (hasDelete) assert(hist.last._3 == "d" && hist.last._5.isEmpty)
    }
  }
}
