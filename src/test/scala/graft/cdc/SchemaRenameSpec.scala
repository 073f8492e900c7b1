package graft.cdc

import java.nio.file.{Files, Path}
import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Column RENAME as a metadata-only DDL ([[StateStore.renameColumn]]):
  * zero data files touched, pre-rename rows keep their values under
  * the new name, time travel at a pre-rename version surfaces the old
  * name, renames chain, and a retired name cannot be reintroduced.
  */
class SchemaRenameSpec extends SparkTestBase {

  private def listDataFiles(root: Path): Map[String, Long] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  test("rename: zero rewrites, values preserved, time travel, chain, guard") {
    val wh = graft.Scratch.dir("graft-rename-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.rename_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier")
    def wave(df: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
      MergeCommit.mergeBatchMeta(store, target, df
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
        .withColumn(StateStore.DeletedCol, lit(false))
        .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
      ()
    }
    wave(sup, 1000L)                                                // v0
    val root = java.nio.file.Paths.get(wh, "cdc.rename_spec")
    val before = listDataFiles(root)

    store.renameColumn(target, "s_name", "supplier_name")           // v1
    assert(listDataFiles(root) == before,
      "rename must not write, rewrite, or touch any data file")
    assert(Files.readString(root.resolve("manifest-1.tsv")) ==
      Files.readString(root.resolve("manifest-0.tsv")),
      "the rename version's manifest is a byte-identical carry-over")
    assert(store.schemaOf(target).fieldNames.contains("supplier_name") &&
      !store.schemaOf(target).fieldNames.contains("s_name"),
      "committed schema carries the new name")

    // Pre-rename rows keep their values under the new name.
    val n = sup.count()
    val st = store.currentState(spark, target)
    assert(st.filter(col("supplier_name").isNull).count() == 0,
      "no value was nulled by the rename")
    assert(st.count() == n)
    val expect = sup.select(col("s_suppkey"),
      col("s_name").as("supplier_name"))
    assert(st.select("s_suppkey", "supplier_name")
      .exceptAll(expect).count() == 0, "values are byte-identical")

    // Time travel BEFORE the rename surfaces the old name.
    val v0 = store.stateAt(spark, target, 0)
    assert(v0.columns.contains("s_name") &&
      !v0.columns.contains("supplier_name"),
      "pre-rename snapshots read under their committed (old) name")

    // Post-rename merge under the NEW name updates without nulling.
    wave(sup.filter(col("s_suppkey") % 3 === 0)
      .withColumn("s_name", concat(col("s_name"), lit(" v2")))
      .withColumnRenamed("s_name", "supplier_name"), 2000L)         // v2
    val st2 = store.currentState(spark, target)
    assert(st2.filter(col("supplier_name").isNull).count() == 0)
    assert(st2.filter(col("supplier_name").endsWith(" v2")).count() ==
      sup.filter(col("s_suppkey") % 3 === 0).count())

    // Chained rename: supplier_name -> vendor_name composes.
    store.renameColumn(target, "supplier_name", "vendor_name")      // v3
    val st3 = store.currentState(spark, target)
    assert(st3.filter(col("vendor_name").isNull).count() == 0,
      "chain a->b->c lands wave-1 files (written under a) on c")

    // Retired names are rejected: a batch reintroducing s_name fails
    // loudly at commit time, BEFORE any metadata is written.
    val headBefore = store.currentVersion(target)
    val err = intercept[Exception] {
      wave(sup.limit(5).withColumn("s_name", lit("ghost")), 3000L)
    }
    assert(err.getMessage.contains("renamed away"),
      s"got: ${err.getMessage}")
    assert(store.currentVersion(target) == headBefore,
      "the failed commit must not move the head")

    // Rename input validation.
    intercept[IllegalArgumentException] {
      store.renameColumn(target, "no_such_col", "x")
    }
    intercept[IllegalArgumentException] {
      store.renameColumn(target, "vendor_name", "s_acctbal")
    }
    intercept[IllegalArgumentException] {
      store.renameColumn(target, StateStore.TsCol, "tsx")
    }

    // CLONE of a renamed table: the clone's manifest reaches into the
    // source's pre-rename data dirs (old-name files); the carried
    // rename mappings must land those bytes on the current name, and
    // the retired-name guard must carry over too.
    store.cloneTable(target, "cdc.rename_clone")
    val cl = store.currentState(spark, "cdc.rename_clone")
    assert(cl.columns.contains("vendor_name"))
    assert(cl.filter(col("vendor_name").isNull).count() == 0,
      "clone reads of pre-rename source files must not null the " +
        "renamed column (the journal carries the mapping)")
    assert(cl.count() == n)
    val clErr = intercept[Exception] {
      wave2(store, "cdc.rename_clone",
        sup.limit(5).withColumn("s_name", lit("ghost")), 5000L)
    }
    assert(clErr.getMessage.contains("renamed away"),
      "the retired-name guard rides the carried journal into the clone")
  }

  private def wave2(store: StateStore, target: String,
                    df: org.apache.spark.sql.DataFrame, ts: Long): Unit = {
    val pk = Seq("s_suppkey")
    MergeCommit.mergeBatchMeta(store, target, df
      .withColumn(StateStore.TsCol, lit(ts))
      .withColumn(StateStore.SeqCol, col("s_suppkey").cast("long"))
      .withColumn(StateStore.DeletedCol, lit(false))
      .withColumn(StateStore.BucketCol, StateStore.bucketExpr(pk, 4)), pk)
    ()
  }
}
