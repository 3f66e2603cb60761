package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Binary record codec for the message-bus ingest path (SURVEY.md §2B-1
  * Kafka row — environment-blocked: zero egress, no broker). A Kafka
  * message is (key bytes, value bytes); the work the ENGINE owns is
  * decoding value bytes into typed columns, and that part needs no
  * broker. This implements Avro binary — the dominant bus wire format —
  * with the plain Apache Avro Java API (on the Spark classpath), as a
  * narrow schema-driven `mapPartitions`: no shuffle, encoder/decoder
  * constructed once per partition, binaryEncoder/Decoder instances
  * reused across the partition's rows (the Avro-idiomatic hot loop).
  *
  * Scale posture: decode is embarrassingly parallel over whatever
  * partitioning the source delivers (Kafka partitions map 1:1 to Spark
  * partitions); all downstream relational work stays in columnar
  * Catalyst plans. Supported field types: long/int/double/float/
  * boolean/string/binary, each nullable as the standard
  * `["null", T]` union.
  */
object AvroCodec {

  /** Avro record-schema JSON mirroring a Spark schema (supported subset
    * only; fails loudly on anything else — silent coercion is how wire
    * formats rot). */
  def avroSchemaFor(schema: StructType, name: String = "rec"): String = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "long"
        case IntegerType => "int"
        case DoubleType  => "double"
        case FloatType   => "float"
        case BooleanType => "boolean"
        case StringType  => "string"
        case BinaryType  => "bytes"
        case other => throw new IllegalArgumentException(
          s"AvroCodec does not support ${other.simpleString} (field ${f.name})")
      }
      s"""{"name":"${f.name}","type":["null","$t"],"default":null}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  /** Encode every row to one Avro binary record: the frame of Kafka
    * message bodies a producer would publish. */
  def encode(df: DataFrame): DataFrame = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema)
    val out = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val buf = new ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        buf.reset()
        enc = EncoderFactory.get().binaryEncoder(buf, enc)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          if (!row.isNullAt(i)) rec.put(i, sparkSchema(i).dataType match {
            case BinaryType => ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case _          => row.get(i)
          })
          i += 1
        }
        writer.write(rec, enc)
        enc.flush()
        Row(buf.toByteArray)
      }
    }(Encoders.row(out))
  }

  /** Decode a frame of Avro binary message bodies (column `value`) back
    * to typed columns under `sparkSchema` — the consumer-side ingest
    * step. */
  def decode(df: DataFrame, sparkSchema: StructType): DataFrame = {
    val avroJson = avroSchemaFor(sparkSchema)
    val in = df.select("value")
    in.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var dec: org.apache.avro.io.BinaryDecoder = null
      it.map { row =>
        dec = DecoderFactory.get().binaryDecoder(
          row.getAs[Array[Byte]](0), dec)
        val rec = reader.read(null, dec)
        Row.fromSeq(sparkSchema.fields.zipWithIndex.map { case (f, i) =>
          val v = rec.get(i)
          if (v == null) null
          else f.dataType match {
            case StringType => v.toString // Avro Utf8 -> String
            case BinaryType =>
              val bb = v.asInstanceOf[ByteBuffer]
              val a = new Array[Byte](bb.remaining()); bb.get(a); a
            case _ => v
          }
        }.toSeq)
      }
    }(Encoders.row(sparkSchema))
  }
}
