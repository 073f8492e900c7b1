package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Drives the four staged micro-batches of the whole-transaction apply
  * and asserts the apply SCHEDULE — the part the oracle (final state
  * only) cannot see.
  */
class TxApplySpec extends SparkTestBase {

  test("transactions apply only when complete, in the staged schedule") {
    val (store, applied) = TxApplyQueries.runTxApply(spark, sf)
    // b0 carries half of tx 1000 PLUS its END marker: the marker-
    // present-but-incomplete case — count gating must hold it.
    assert(applied(0L) === Seq.empty,
      s"batch 0 must apply nothing (marker present, count short): $applied")
    // b1 completes tx 1000; tx 500 arrives whole but marker-less.
    assert(applied(1L) === Seq(1000L), s"batch 1 applies tx 1000: $applied")
    // b2 delivers 500's marker, all of 2000+marker, half of 3000.
    assert(applied(2L) === Seq(500L, 2000L), s"batch 2: $applied")
    // b3 completes 3000 and delivers 4000 whole.
    assert(applied(3L) === Seq(3000L, 4000L), s"batch 3: $applied")

    // After the drain the held-back store must be EMPTY and the target
    // must equal the plain batch merge of the full log.
    val expected = graft.cdc.Merge.compact(
      graft.cdc.Envelope.flatten(
        graft.cdc.ChangeGen.changeLog(
          graft.Tables.load(spark, sf, "customer"),
          "c_custkey", "c_acctbal", "commerce", "customer")),
      Seq("c_custkey"))
      .select("c_custkey", "c_acctbal")
    val got = store.currentState(spark, "tx.customer")
      .filter(!col(graft.cdc.StateStore.DeletedCol))
      .select("c_custkey", "c_acctbal")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "drained target must equal the batch merge of the full log")
  }
}
