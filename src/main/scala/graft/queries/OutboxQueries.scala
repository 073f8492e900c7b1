package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-message-transform (SMT) operators on the change stream — the
  * in-flight record surgeries a Debezium/Connect deployment configures
  * between capture and sink (reference: the transforms block of
  * kafka/config/connect-iceberg-sink.json:9-13 holds exactly this SMT
  * chain slot; the reference pins only the Iceberg upsert transform,
  * production pipelines stack the outbox router and masking transforms
  * documented alongside it):
  *
  *  - OUTBOX EVENT ROUTER: the transactional-outbox pattern. The app
  *    writes domain events to an `outbox` table in the SAME transaction
  *    as the state change; CDC captures the outbox INSERTS and the
  *    router re-topics each record by `aggregate_type`, keys it by
  *    `aggregate_id`, forwards the opaque JSON payload, and DROPS
  *    non-insert ops (the app may prune the outbox with deletes right
  *    after writing — those must not become consumer events).
  *
  *  - COLUMN MASKING: PII redaction in flight — mask-with-char,
  *    hash-replace, and truncate-to-N, applied between merge and sink
  *    so the warehouse never stores the cleartext.
  *
  * Scale posture: both transforms are per-row projections (no shuffle,
  * no state) fused into whole-stage codegen with the surrounding plan;
  * the outbox JSON round-trip is the wire tax measured separately by
  * cdc_merge_customer_wire.
  */
object OutboxQueries {

  /** Payload schema the consuming side parses the forwarded JSON with —
    * the contract half of the outbox pattern (producer owns the schema,
    * consumers pin a version of it).
    */
  private[graft] val payloadSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderpriority", StringType)))

  /** The synthesized outbox table: one domain event per order row (the
    * app-side insert), plus a deterministic delete wave (every third
    * event pruned by the app) that the router must drop. Event type
    * derives from order status — the Created/Fulfilled/Pending facts a
    * commerce domain would emit.
    */
  private def outboxLog(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val eventType = when(col("o_orderstatus") === "O", "OrderCreated")
      .when(col("o_orderstatus") === "F", "OrderFulfilled")
      .otherwise("OrderPending")
    val inserts = o.select(
      col("o_orderkey").as("event_id"),
      lit("order").as("aggregate_type"),
      col("o_orderkey").cast("string").as("aggregate_id"),
      eventType.as("event_type"),
      to_json(struct(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))).as("payload"),
      lit("c").as("op"))
    val prunes = o.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey").as("event_id"),
      lit("order").as("aggregate_type"),
      col("o_orderkey").cast("string").as("aggregate_id"),
      lit(null).cast("string").as("event_type"),
      lit(null).cast("string").as("payload"),
      lit("d").as("op"))
    inserts.unionAll(prunes)
  }

  /** Route → re-key → forward → consume, verified end to end: the
    * consumer parses the forwarded payload back through the pinned
    * schema and the per-(topic, event_type) rollup must reproduce the
    * source-of-truth aggregates exactly — any row the router dropped
    * wrongly, any payload field the JSON round-trip bent, shifts a
    * count or a sum. The delete wave contributes nothing by design.
    */
  def outbox(spark: SparkSession, sfDir: String): DataFrame =
    outboxLog(spark, sfDir)
      .filter(col("op") === "c")
      .select(
        concat(lit("outbox.event."), col("aggregate_type")).as("topic"),
        col("aggregate_id").as("key"),
        col("event_type"),
        from_json(col("payload"), payloadSchema).as("body"))
      .groupBy("topic", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("key").as("n_aggregates"),
        round(sum(col("body.o_totalprice")), 2).as("total"))
      .orderBy("topic", "event_type")

  val outboxOracle: String =
    """SELECT 'outbox.event.order' AS topic,
      |  CASE o_orderstatus WHEN 'O' THEN 'OrderCreated'
      |       WHEN 'F' THEN 'OrderFulfilled'
      |       ELSE 'OrderPending' END AS event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT o_orderkey) AS n_aggregates,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY topic, event_type""".stripMargin

  /** The Debezium masking SMT family over the merged customer state:
    * `column.mask.with` (name → same-length '*' run), `column.mask.hash`
    * (a stable digest column so joins/dedup on the masked field still
    * work), `column.truncate.to.3.chars` (market segment reduced to a
    * coarse code). Applied AFTER the latest-wins merge — the state the
    * sink persists is masked, the in-flight images are already gone.
    */
  def columnMask(spark: SparkSession, sfDir: String): DataFrame =
    CdcQueries.mergeCustomer(spark, sfDir)
      .select(
        col("c_custkey"),
        expr("repeat('*', length(c_name))").as("c_name"),
        md5(col("c_name")).as("c_name_hash"),
        col("c_nationkey"),
        col("c_acctbal"),
        expr("substring(c_mktsegment, 1, 3)").as("c_mktsegment"))
      .orderBy("c_custkey")

  val columnMaskOracle: String =
    """SELECT c_custkey,
      |  repeat('*', length(c_name)) AS c_name,
      |  md5(c_name) AS c_name_hash,
      |  c_nationkey,
      |  ROUND(c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 200.0
      |    WHEN c_custkey % 3 = 0 THEN 100.0 ELSE 0.0 END, 2) AS c_acctbal,
      |  substr(c_mktsegment, 1, 3) AS c_mktsegment
      |FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_outbox" -> outbox,
    "cdc_column_mask" -> columnMask)

  def oracles: Map[String, String] = Map(
    "cdc_outbox" -> outboxOracle,
    "cdc_column_mask" -> columnMaskOracle)
}
