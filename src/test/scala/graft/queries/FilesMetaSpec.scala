package graft.queries

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.Tables
import graft.cdc.{MergeCommit, StateStore}
import org.apache.spark.sql.functions._

/** `$files` metadata ([[MaintenanceQueries.filesMeta]]): footer record
  * counts are PHYSICAL-row counts — after a delete wave the tombstoned
  * keys still occupy footer rows (the merge stores deletes as flagged
  * rows until compaction) while the logical state has dropped them.
  * The oracle-checked query commits insert-only precisely because of
  * this; here we pin the caveat itself.
  */
class FilesMetaSpec extends SparkTestBase {

  private def footerTotal(wh: String, store: StateStore,
                          target: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    store.manifestAt(target, store.currentVersion(target)).toSeq
      .flatMap { case (_, rel) =>
        val s = Files.list(Paths.get(wh).resolve(target).resolve(rel))
        val files = try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toList
            .filter(_.toString.endsWith(".parquet"))
        } finally s.close()
        files.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toString), conf))
          try r.getRecordCount finally r.close()
        }
      }.sum
  }

  test("footer counts are physical rows; tombstones stay visible") {
    val wh = graft.Scratch.dir("graft-files-spec-").toString
    val store = new StateStore(wh, nBuckets = 4)
    val target = "cdc.files_spec"
    val pk = Seq("s_suppkey")
    val sup = Tables.load(spark, sf, "supplier")
    def wave(df: org.apache.spark.sql.DataFrame, ts: Long,
             deleted: Boolean): Unit = {
      MergeCommit.mergeBatchMeta(store, target, df
        .withColumn(StateStore.TsCol, lit(ts))
        .withColumn(StateStore.SeqCol, col("s_suppkey"))
        .withColumn(StateStore.DeletedCol, lit(deleted))
        .withColumn(StateStore.BucketCol,
          pmod(col("s_suppkey"), lit(4)).cast("int")), pk)
      ()
    }
    wave(sup, 1000L, deleted = false)
    val total = sup.count()
    assert(footerTotal(wh, store, target) == total,
      "insert-only: footer rows equal table rows")

    wave(sup.filter(col("s_suppkey") % 5 === 0), 2000L, deleted = true)
    assert(footerTotal(wh, store, target) == total,
      "tombstoned keys still occupy physical footer rows after the merge")
    assert(store.currentState(spark, target).count() ==
      sup.filter(col("s_suppkey") % 5 =!= 0).count(),
      "while the logical state has dropped them")
  }
}
