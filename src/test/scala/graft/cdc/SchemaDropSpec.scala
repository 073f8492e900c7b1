package graft.cdc

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Column DROP under A11 ([[SchemaEvolution.align]]'s missing-column
  * rule): a wave that stops carrying a column commits with the
  * column's values as nulls in its own images, untouched rows keep
  * theirs, and the COMMITTED SCHEMA is byte-stable across the drop —
  * the evolution journal records nothing, which is what makes the
  * drop metadata-only however large the table.
  */
class SchemaDropSpec extends SparkTestBase {

  test("drop wave nulls its own images; schema and journal stable") {
    val wh = graft.Scratch.dir("graft-sdrop-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.sdrop_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier")
    def wave(df: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
      MergeCommit.mergeBatchMeta(store, target, df
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey"))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    wave(sup, 1000L)
    val schemaV0 = Files.readString(
      Paths.get(wh).resolve(target).resolve("schema-0.json"))
    wave(sup.filter(col("s_suppkey") % 3 === 0).drop("s_name"), 2000L)

    val schemaV1 = Files.readString(
      Paths.get(wh).resolve(target).resolve("schema-1.json"))
    assert(schemaV1 == schemaV0,
      "a logical drop must not change the committed schema")
    val journal = Files.readAllLines(
      Paths.get(wh).resolve(target).resolve("schema-history.jsonl"))
    assert(journal.size == 1 && journal.get(0).contains("\"version\":0"),
      "the evolution journal must hold only the v0 bootstrap line — " +
        s"nothing for the drop wave; got $journal")

    val st = store.currentState(spark, target)
    assert(st.filter(col("s_suppkey") % 3 === 0 &&
      col("s_name").isNotNull).count() == 0L,
      "post-drop images read NULL for the dropped column")
    assert(st.filter(col("s_suppkey") % 3 =!= 0 &&
      col("s_name").isNull).count() == 0L,
      "rows untouched since wave 1 keep their original values")
  }
}
