package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants of the batch sessionization (`win_sessionize`): the
  * rollup must reconstruct exactly the sessions a per-user linear scan
  * of the raw events would cut at the 30-minute gap.
  */
class SessionizeSpec extends SparkTestBase {

  private val GapUs = 30L * 60 * 1000 * 1000

  test("sessions partition each user's events: counts add up") {
    val sessions = Relational.winSessionize(spark, sf)
    val events = graft.Tables.load(spark, sf, "events")
    val perUser = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n"), max("session_no").as("last_s"),
        min("session_no").as("first_s"), count(lit(1)).as("n_sessions"))
      .collect()
    val rawCounts = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser.nonEmpty)
    perUser.foreach { r =>
      assert(r.getLong(1) === rawCounts(r.getLong(0)),
        s"user ${r.getLong(0)}: session n_events must sum to event count")
      // session_no is a running count over that user's full history:
      // contiguous 1..n_sessions, no gaps, no overlap.
      assert(r.getLong(3) === 1L, "first session_no must be 1")
      assert(r.getLong(2) === r.getLong(4),
        "session_no must be contiguous 1..n_sessions")
    }
  }

  test("rollup equals an independent linear-scan derivation") {
    val got = Relational.winSessionize(spark, sf)
      .select("user_id", "session_no", "s_start_us", "s_end_us", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sorted
    val raw = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Driver-side reference: per user, sort by (ts, event_id), cut a
    // new session whenever the gap exceeds 30 min, roll up.
    val want = raw.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      var sNo = 0L
      var prev = Long.MinValue
      val tagged = ordered.map { e =>
        if (prev == Long.MinValue || e._2 - prev > GapUs) sNo += 1
        prev = e._2
        (sNo, e._2)
      }
      tagged.groupBy(_._1).map { case (s, g) =>
        (uid, s, g.map(_._2).min, g.map(_._2).max, g.size.toLong)
      }
    }.sorted
    assert(got.toSeq === want)
  }
}
