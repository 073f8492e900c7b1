package graft.cdc

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Avro WIRE codec for change-event envelopes — the binary counterpart
  * of [[Envelope.toWire]]/[[Envelope.fromWire]]'s JSON path. The
  * reference stages avro for its sink (pom.xml:121-126,
  * dependencies.sh); this environment ships avro CORE
  * (avro-1.12.1.jar) but no spark-avro datasource, so the engine
  * implements the transport codec on avro core directly: one
  * schema-less binary record per event (the Kafka single-record
  * encoding — the schema travels out-of-band via the A6
  * schema-history journal, not inline per record, which at 100 TB is
  * the only defensible choice anyway; `sink_formats` documents the
  * remaining datasource gap for table FILES).
  *
  * This is a genuine process boundary — per-record imperative
  * serialization — so it is the one legitimate `df.rdd.mapPartitions`
  * surface besides the multimodal codec stub: everything inside the
  * engine stays on typed envelope structs, and the codec's cost is
  * the measured wire-format tax, exactly like the JSON twin.
  */
object AvroWire {

  /** StructType → avro record schema; nullable fields become
    * union[null, T]. Nested record names are derived from the field
    * path (avro requires unique record names).
    */
  def avroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case s: StructType => avroSchema(s, s"${name}_${f.name}")
        case StringType => Schema.create(Schema.Type.STRING)
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case o => throw new IllegalArgumentException(
          s"unsupported avro wire type $o for field ${f.name}")
      }
      val sch =
        if (f.nullable)
          Schema.createUnion(
            List(Schema.create(Schema.Type.NULL), base).asJava)
        else base
      new Schema.Field(f.name, sch, null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord(name, null, "graft.wire", false, fields.toList.asJava)
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def toRecord(row: Row, st: StructType,
                       schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val v: AnyRef =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case s: StructType =>
            toRecord(row.getStruct(i), s,
              unwrap(schema.getFields.get(i).schema()))
          case _ => row.get(i).asInstanceOf[AnyRef]
        }
      rec.put(i, v)
    }
    rec
  }

  private def fromRecord(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
      val v = rec.get(i)
      if (v == null) null
      else f.dataType match {
        case s: StructType => fromRecord(v.asInstanceOf[GenericRecord], s)
        case StringType => v.toString // avro decodes strings as Utf8
        case _ => v
      }
    })

  /** Envelope frame → one avro-binary record per event.
    *
    * `writerSchema` (default: the frame's own schema) is the schema
    * the bytes are encoded under — pass the SAME canonical schema the
    * decoder will use. Avro binary is not self-describing: a
    * nullability flag that differs between writer and reader flips a
    * field between plain and union[null, T] encoding and misaligns
    * the whole stream (this is exactly the out-of-band-schema
    * contract A6's journal exists for). Field names and types must
    * match the frame positionally; only nullability may differ.
    */
  def toAvro(df: DataFrame, writerSchema: StructType = null): DataFrame = {
    val st = Option(writerSchema).getOrElse(df.schema)
    require(st.fields.map(f => (f.name, f.dataType.sql)).sameElements(
        df.schema.fields.map(f => (f.name, f.dataType.sql))),
      "writerSchema must match the frame's names and types")
    val schemaJson = avroSchema(st, "envelope").toString
    val rdd = df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      it.map { row =>
        val out = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        writer.write(toRecord(row, st, schema), enc)
        enc.flush()
        Row(out.toByteArray)
      }
    }
    df.sparkSession.createDataFrame(rdd,
      StructType(Seq(StructField("value", BinaryType, nullable = false))))
  }

  /** Avro-binary wire records → typed envelope frame. A truncated or
    * corrupt record raises through the task (the FAILFAST discipline
    * of the JSON path — errors.tolerance=none).
    */
  def fromAvro(wire: DataFrame, envSchema: StructType): DataFrame = {
    val schemaJson = avroSchema(envSchema, "envelope").toString
    val rdd = wire.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      it.map { row =>
        val dec = DecoderFactory.get()
          .binaryDecoder(row.getAs[Array[Byte]](0), null)
        fromRecord(reader.read(null, dec), envSchema)
      }
    }
    wire.sparkSession.createDataFrame(rdd, envSchema)
  }
}
