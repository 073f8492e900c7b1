package graft.cdc

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Avro wire-codec contracts: lossless envelope round-trip (including
  * null images and nested structs), Utf8→String decoding, and corrupt
  * records failing loudly (the FAILFAST discipline).
  */
class AvroWireSpec extends SparkTestBase {

  private def log = ChangeGen.changeLog(
    Tables.load(spark, sf, "customer"),
    "c_custkey", "c_acctbal", "commerce", "customer")

  test("envelope round-trips losslessly through the avro wire") {
    val original = log
    val decoded = AvroWire.fromAvro(AvroWire.toAvro(original),
      original.schema)
    assert(decoded.schema === original.schema)
    val key = array(col("op"), col("ts_ms").cast("string"),
      col("seq").cast("string"),
      coalesce(col("after.c_acctbal").cast("string"), lit("null")),
      coalesce(col("before.c_name"), lit("null")),
      col("source.table"))
    val a = original.select(key.as("k")).collect().map(_.getSeq[String](0))
    val b = decoded.select(key.as("k")).collect().map(_.getSeq[String](0))
    assert(a.nonEmpty && a.sortBy(_.mkString) === b.sortBy(_.mkString))
    // Delete events survive with null after-images intact.
    val delNulls = decoded.filter(col("op") === Envelope.OpDelete)
      .select(col("after").isNull.as("n")).collect()
    assert(delNulls.nonEmpty && delNulls.forall(_.getBoolean(0)))
  }

  test("encode/decode under the canonical envelope schema round-trips " +
      "(nullability-flag drift between frame and canon must not " +
      "misalign the stream)") {
    val base = Tables.load(spark, sf, "customer")
    val env = Envelope.envelopeSchema(base.schema)
    val decoded = AvroWire.fromAvro(AvroWire.toAvro(log, env), env)
    assert(decoded.count() === log.count())
    val bal = decoded.filter(col("op") === Envelope.OpRead)
      .agg(sum("after.c_acctbal")).head.getDouble(0)
    val expected = base.agg(sum("c_acctbal")).head.getDouble(0)
    assert(math.abs(bal - expected) < 1e-6,
      "snapshot images must survive the canonical-schema round-trip")
  }

  test("a corrupt wire record fails the read, not silently") {
    val wire = AvroWire.toAvro(log.limit(5))
      .select(expr("substring(value, 1, 3)").as("value"))
    val ex = intercept[org.apache.spark.SparkException] {
      AvroWire.fromAvro(wire, Envelope.envelopeSchema(
        Tables.load(spark, sf, "customer").schema)).collect()
    }
    assert(ex.getMessage != null)
  }
}
