package graft.queries

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Partition-spec evolution: layout changes must be invisible to
  * readers (data invariance) while the NEW epoch gains pruning on the
  * added partition column.
  */
class PartitionEvolutionSpec extends SparkTestBase {

  test("union over both spec epochs reproduces the raw table exactly") {
    val rolled = MaintenanceQueries.partitionEvolution(spark, sf)
    val orders = Tables.load(spark, sf, "orders")
    assert(rolled.agg(sum("n_orders")).head.getLong(0) == orders.count(),
      "no row may be lost or duplicated across spec epochs")
    val viaEpochs = rolled.agg(round(sum("total"), 2)).head.getDouble(0)
    val direct = orders.agg(round(sum("o_totalprice"), 2)).head.getDouble(0)
    assert(math.abs(viaEpochs - direct) < 0.05,
      s"epoch union total $viaEpochs drifted from table total $direct")
  }

  test("evolved epoch prunes on the added partition column at plan time") {
    // Run the operator once so the epoch dirs exist for this sf.
    MaintenanceQueries.partitionEvolution(spark, sf).count()
    val root = MaintenanceQueries.partEvolveRoot(sf)
    val v2 = spark.read.parquet(s"$root/v2")
      .filter(col("o_orderpriority") === "1-URGENT" && col("p_year") === 1998)
    val p = v2.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters"),
      "the evolved epoch must expose partition filters")
    assert(p.contains("o_orderpriority") && p.contains("p_year"),
      s"both partition columns must prune at planning time:\n$p")
    // Pruning is real: the files actually READ cover only the matching
    // cell (inputFiles would list the whole relation — pre-pruning).
    val files = v2.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("p_year=1998") &&
        f.contains("1-URGENT")),
      s"scan must touch only the pruned cell, got:\n${files.mkString("\n")}")
  }

  test("old epoch stays readable with the priority as a DATA column") {
    MaintenanceQueries.partitionEvolution(spark, sf).count()
    val root = MaintenanceQueries.partEvolveRoot(sf)
    val v1 = spark.read.parquet(s"$root/v1")
    // v1 files were written before the spec added the priority to the
    // path — the column must still be present, from the file payload.
    assert(v1.columns.contains("o_orderpriority"))
    assert(v1.filter(col("p_year") > 1997).count() == 0,
      "epoch boundary must be respected: v1 holds only pre-evolution years")
  }
}
