package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Drives the four staged wire micro-batches of the CROSS-TABLE
  * whole-transaction apply and asserts the schedule — in particular
  * the case the single-table variant cannot express: one collection
  * complete with its marker while the other is short must hold the
  * WHOLE transaction in every target.
  */
class TxApplyMultiSpec extends SparkTestBase {

  test("cross-table transactions apply all-or-nothing, per the schedule") {
    val (store, applied) = TxApplyMultiQueries.runTxApplyMulti(spark, sf)
    // b0: customer tx 1000 is COMPLETE with its marker, supplier tx
    // 1000 is half-delivered — the customer target must NOT move.
    assert(applied(0L) === Seq.empty,
      s"batch 0 must hold tx 1000 (supplier collection short): $applied")
    // b1 completes supplier's half; both collections now satisfied.
    assert(applied(1L) === Seq(1000L), s"batch 1 applies tx 1000: $applied")
    assert(applied(2L) === Seq(500L, 2000L), s"batch 2: $applied")
    assert(applied(3L) === Seq(3000L, 4000L), s"batch 3: $applied")

    // Both drained targets equal the batch merge of their own logs.
    Seq(("txm.customer", "customer", "c_custkey", "c_acctbal"),
      ("txm.supplier", "supplier", "s_suppkey", "s_acctbal"))
      .foreach { case (target, fixture, pk, bal) =>
        val expected = graft.cdc.Merge.compact(
          graft.cdc.Envelope.flatten(
            graft.cdc.ChangeGen.changeLog(
              graft.Tables.load(spark, sf, fixture),
              pk, bal, "commerce", fixture)),
          Seq(pk))
          .select(pk, bal)
        val got = store.currentState(spark, target)
          .filter(!col(graft.cdc.StateStore.DeletedCol))
          .select(pk, bal)
        assert(got.exceptAll(expected).isEmpty &&
          expected.exceptAll(got).isEmpty,
          s"$target must equal the batch merge of the $fixture log")
      }
  }
}
