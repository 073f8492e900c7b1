package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source/sink-side routing: include-list filters, topic naming, and the
  * sink's target-table routing expression.
  *
  * Reference declarations re-expressed as Catalyst expressions (so they
  * fold into the scan and get predicate-pushdown for free):
  *  - A3 include lists: connect-sqlserver-source.json:11-12
  *  - A4 topic naming `<prefix>.<schema>.<table>`: connect-sqlserver-source.json:10
  *  - A7 sink topic regex `cdc.commerce.*`: connect-iceberg-sink.json:9
  *  - A9 route pattern `cdc.{schema}_{table}` on field `_cdc.target`:
  *    connect-iceberg-sink.json:12-13
  */
object Routing {

  /** A3 — capture only the configured schema + tables. Applied before
    * anything else so at scale the excluded tables never leave the scan
    * (Catalyst pushes this into the change-log parquet scan).
    * `sourcePath` is "source" pre-flatten, "_cdc.source" post-flatten.
    */
  def includeFilter(schemaName: String, tables: Seq[String],
                    sourcePath: String = "source"): Column =
    col(s"$sourcePath.schema") === schemaName &&
      col(s"$sourcePath.table").isin(tables: _*)

  /** A4 — topic name `<prefix>.<schema>.<table>`. */
  def topicName(prefix: String, sourcePath: String = "source"): Column =
    concat_ws(".", lit(prefix),
      col(s"$sourcePath.schema"), col(s"$sourcePath.table"))

  /** A7 — sink-side topic-regex subscription. */
  def topicRegexFilter(topicCol: Column, regex: String): Column =
    topicCol.rlike(regex)

  /** A9 — routing expression: the pattern's `{schema}`/`{table}`
    * placeholders are substituted from the event source. Built as one
    * `concat` of literals and struct-field refs — stays codegen'd, no UDF.
    * Returns a plain string column, suitable as a shuffle / partitionBy
    * key for the A10 fan-out.
    */
  def targetExpr(pattern: String, sourcePath: String = "source"): Column = {
    val token = "\\{(schema|table)\\}".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- token.findAllMatchIn(pattern)) {
      if (m.start > last) parts += lit(pattern.substring(last, m.start))
      parts += col(s"$sourcePath.${m.group(1)}")
      last = m.end
    }
    if (last < pattern.length) parts += lit(pattern.substring(last))
    concat(parts.toSeq: _*)
  }

  /** Flattened events (from [[Envelope.flatten]]) + `_cdc_target` routing
    * column, kept top-level so it can serve directly as a repartition /
    * partitionBy key in the A10 fan-out.
    */
  def route(flattened: DataFrame,
            pattern: String = "cdc.{schema}_{table}"): DataFrame =
    flattened.withColumn("_cdc_target", targetExpr(pattern, "_cdc.source"))
}
