package graft.cdc

import graft.SparkTestBase
import graft.queries.MorQueries
import org.apache.spark.sql.functions._

/** The Iceberg-v2 format invariant behind [[MorQueries]]: merge-on-read
  * (data files + sequence-scoped delete files, resolved at read time)
  * and copy-on-write (the [[Merge.compact]] change-log spelling) are
  * two physical layouts of ONE logical table — byte-identical rows.
  */
class SequenceMorSpec extends SparkTestBase {
  import spark.implicits._

  test("merge-on-read == copy-on-write compaction of the same commits") {
    val base = spark.read
      .parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")

    // The same four commits as MorQueries' file model, re-expressed as
    // a change log: snapshot (seq 1), upserts (seq 2), key deletes
    // (seq 3), and the position-delete wave as the key deletes it is
    // logically equivalent to — file-1 rows at pos%13=0 are the
    // snapshot rows of keys k%13=0 that were neither upserted (k%3=0
    // replaced the visible row with a file-2 row the pos delete does
    // not touch) nor already deleted.
    val image = struct($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
    val nullImage = when(lit(false), image)
    def ev(df: org.apache.spark.sql.DataFrame, op: String, seq: Long) = {
      val (before, after) =
        if (op == "d") (image, nullImage) else (nullImage, image)
      df.select(before.as("before"), after.as("after"), lit(op).as("op"),
        lit(seq * 1000).as("ts_ms"), ($"c_custkey" * 10 + seq).as("seq"),
        struct(lit("commerce").as("schema"), lit("customer").as("table"))
          .as("source"))
    }
    val log = ev(base, "r", 1)
      .unionAll(ev(base.filter($"c_custkey" % 3 === 0)
        .withColumn("c_acctbal", $"c_acctbal" + 100.0), "u", 2))
      .unionAll(ev(base.filter($"c_custkey" % 7 === 0), "d", 3))
      .unionAll(ev(base.filter($"c_custkey" % 13 === 0 &&
        $"c_custkey" % 3 =!= 0 && $"c_custkey" % 7 =!= 0), "d", 4))

    val cow = Merge.compact(Envelope.flatten(log), Seq("c_custkey"))
      .select($"c_custkey", $"c_name", $"c_nationkey",
        round($"c_acctbal", 2).as("c_acctbal"))
      .orderBy("c_custkey")
    val mor = MorQueries.morRead(spark, sf)

    val cowRows = cow.collect()
    val morRows = mor.collect()
    assert(cowRows.length == morRows.length,
      s"row counts differ: cow=${cowRows.length} mor=${morRows.length}")
    assert(cowRows.sameElements(morRows))
    // Sanity: every wave left a mark — upserted, deleted, pos-deleted
    // and untouched keys all present in the expectation space.
    assert(morRows.length < 150 && morRows.nonEmpty)
  }

  test("a same-sequence upsert survives its own equality delete") {
    // The strict < in the equality-delete rule is the whole upsert
    // contract: delete(seq n) + insert(seq n) must net to the insert.
    val mor = MorQueries.morRead(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val base = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", round($"c_acctbal", 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val upserted = base.keys.filter(k => k % 3 == 0 && k % 7 != 0)
    assert(upserted.nonEmpty)
    upserted.foreach { k =>
      assert(math.abs(mor(k) - (base(k) + 100.0)) < 1e-6,
        s"key $k: expected upserted image ${base(k) + 100.0}, got ${mor(k)}")
    }
  }
}
