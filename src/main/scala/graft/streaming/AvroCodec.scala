package graft.streaming

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}
import scala.jdk.CollectionConverters._

/** Binary-Avro decode/encode for the stream ingest path (SURVEY §2.7, the
  * reference's Kafka Avro branch: infra/contrib/spark_kafka_processor.py:
  * 106-130 routes `message_format=avro` through `from_avro`).
  *
  * The sandbox classpath has Avro core (`avro-1.12.1.jar`) but NOT the
  * `spark-avro` connector module, so this is a from-scratch bridge: the
  * writer schema is parsed once per partition, a `GenericDatumReader` +
  * `BinaryDecoder` pair is REUSED across every row of the partition (zero
  * per-row allocation beyond the record), and the result carries a precise
  * Spark schema derived from the Avro schema — downstream plans stay fully
  * typed and Catalyst-optimizable. `mapPartitions` is the deliberate tool
  * here (same rationale as the multimodal decoder hook): an opaque codec
  * with per-partition init cannot be expressed as a codegen expression
  * without the connector, and the decode is a streaming-compatible
  * narrow map — no shuffle, scales linearly with partition count.
  *
  * Supported Avro shapes: all primitives, string/enum, bytes/fixed,
  * nullable `["null", T]` unions, arrays, string-keyed maps, nested
  * records, and the timestamp logical types (`timestamp-millis/-micros` →
  * TIMESTAMP, `local-timestamp-millis/-micros` → TIMESTAMP_NTZ, `date` →
  * DATE) — the schema surface the reference's stream sources use.
  */
object AvroCodec {

  /** Spark type for an Avro schema (nullable unions unwrapped). */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        TimestampType
      case _: LogicalTypes.LocalTimestampMillis | _: LogicalTypes.LocalTimestampMicros =>
        TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map { f =>
      StructField(f.name, sparkType(nonNull(f.schema)), nullable = isNullable(f.schema))
    })
    case Schema.Type.UNION => sparkType(nonNull(s))
    case Schema.Type.NULL => NullType
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The single non-null branch of a nullable union (the only union shape
    * supported — general unions have no stable columnar type).
    */
  private def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] unions are supported, got: $s")
      branches.head
    }

  // --- decode ---------------------------------------------------------------

  /** Avro datum → Spark external-row value. */
  private def toSpark(v: Any, s: Schema): Any = v match {
    case null => null
    case _ => nonNull(s) match {
      case sch if sch.getType == Schema.Type.RECORD =>
        val r = v.asInstanceOf[GenericRecord]
        Row.fromSeq(sch.getFields.asScala.toSeq.map(f => toSpark(r.get(f.pos), f.schema)))
      case sch if sch.getType == Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(toSpark(_, sch.getElementType))
      case sch if sch.getType == Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, x) =>
          k.toString -> toSpark(x, sch.getValueType)
        }.toMap
      case sch if sch.getType == Schema.Type.LONG => sch.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          Timestamp.from(Instant.ofEpochMilli(v.asInstanceOf[Long]))
        case _: LogicalTypes.TimestampMicros =>
          Timestamp.from(microsToInstant(v.asInstanceOf[Long]))
        case _: LogicalTypes.LocalTimestampMillis =>
          LocalDateTime.ofInstant(Instant.ofEpochMilli(v.asInstanceOf[Long]), ZoneOffset.UTC)
        case _: LogicalTypes.LocalTimestampMicros =>
          LocalDateTime.ofInstant(microsToInstant(v.asInstanceOf[Long]), ZoneOffset.UTC)
        case _ => v
      }
      case sch if sch.getType == Schema.Type.INT &&
        sch.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case _ => v match {
        case u: Utf8 => u.toString
        case e: GenericData.EnumSymbol => e.toString
        case b: ByteBuffer =>
          val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
        case f: GenericData.Fixed => f.bytes().clone()
        case other => other
      }
    }
  }

  private def microsToInstant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /** Decode a binary column of Avro-serialized records (the writer schema,
    * as JSON) into typed columns — the `from_avro` stand-in. Works on batch
    * and streaming frames alike (narrow map, no state).
    */
  def decode(df: DataFrame, valueCol: String, schemaJson: String): DataFrame = {
    val rootStruct = {
      val s = new Schema.Parser().parse(schemaJson)
      require(s.getType == Schema.Type.RECORD, s"top-level schema must be a record, got $s")
      // top-level fields nullable: a NULL value (Kafka tombstone) decodes
      // to an all-null row — from_avro/from_json behave the same — instead
      // of an NPE that kills the streaming query
      val st = sparkType(s).asInstanceOf[StructType]
      StructType(st.fields.map(_.copy(nullable = true)))
    }
    val nFields = rootStruct.size
    df.select(col(valueCol).cast("binary").as("value"))
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var decoder: BinaryDecoder = null
        var record: GenericRecord = null
        val nullRow = Row.fromSeq(Seq.fill(nFields)(null))
        it.map { row =>
          val bytes = row.getAs[Array[Byte]](0)
          if (bytes == null) nullRow
          else {
            decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
            record = reader.read(record, decoder)
            toSpark(record, schema).asInstanceOf[Row]
          }
        }
      }(Encoders.row(rootStruct))
  }

  // --- encode ---------------------------------------------------------------

  /** Nested struct field lookup matching the analyzer's default
    * case-INsensitivity (spark.sql.caseSensitive=false): exact name first,
    * then a unique case-insensitive match; a missing field or a
    * case-ambiguous pair ("x" + "X") fails loudly.
    */
  private def nestedFieldIndex(row: Row, name: String): Int =
    try row.fieldIndex(name)
    catch {
      case e: IllegalArgumentException =>
        val names = row.schema.fieldNames
        names.indices.filter(i => names(i).equalsIgnoreCase(name)) match {
          case Seq(i) => i
          case Seq() => throw e
          case many => throw new IllegalArgumentException(
            s"ambiguous nested field '$name': matches " +
              many.map(names).mkString(", "))
        }
    }

  /** Spark external-row value → Avro datum. */
  private def toAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case _ => nonNull(s) match {
      case sch if sch.getType == Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(sch)
        // resolve fields by NAME, not position: a nested struct's Spark
        // field order need not match the Avro schema's (only the TOP level
        // is reordered by encode's select) — positional reads would
        // silently swap same-typed values. A missing field fails loudly
        // (fieldIndex throws). Schemaless rows (hand-built Row(...)) keep
        // the positional contract.
        sch.getFields.asScala.foreach { f =>
          val value =
            if (row.schema != null) row.get(nestedFieldIndex(row, f.name))
            else row.get(f.pos)
          rec.put(f.pos, toAvro(value, f.schema))
        }
        rec
      case sch if sch.getType == Schema.Type.ARRAY =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvro(_, sch.getElementType)).asJava
      case sch if sch.getType == Schema.Type.MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map { case (k, x) =>
          k -> toAvro(x, sch.getValueType)
        }.toMap.asJava
      case sch if sch.getType == Schema.Type.LONG => sch.getLogicalType match {
        case _: LogicalTypes.TimestampMillis =>
          v.asInstanceOf[Timestamp].toInstant.toEpochMilli
        case _: LogicalTypes.TimestampMicros =>
          instantToMicros(v.asInstanceOf[Timestamp].toInstant)
        case _: LogicalTypes.LocalTimestampMillis =>
          v.asInstanceOf[LocalDateTime].toInstant(ZoneOffset.UTC).toEpochMilli
        case _: LogicalTypes.LocalTimestampMicros =>
          instantToMicros(v.asInstanceOf[LocalDateTime].toInstant(ZoneOffset.UTC))
        case _ => v
      }
      case sch if sch.getType == Schema.Type.INT &&
        sch.getLogicalType.isInstanceOf[LogicalTypes.Date] =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case sch if sch.getType == Schema.Type.ENUM =>
        new GenericData.EnumSymbol(sch, v.toString)
      case sch if sch.getType == Schema.Type.FIXED =>
        new GenericData.Fixed(sch, v.asInstanceOf[Array[Byte]])
      case sch if sch.getType == Schema.Type.BYTES =>
        ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _ => v
    }
  }

  private def instantToMicros(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  /** Encode rows as binary Avro (the push/test dual of [[decode]]): each
    * schema field is read from the same-named column; output is a single
    * `value` binary column. Encoder and output buffer are reused across the
    * partition.
    */
  def encode(df: DataFrame, schemaJson: String): DataFrame = {
    val fieldNames = {
      val s = new Schema.Parser().parse(schemaJson)
      s.getFields.asScala.toSeq.map(_.name)
    }
    df.select(fieldNames.map(col): _*)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val bos = new ByteArrayOutputStream(256)
        var encoder: BinaryEncoder = null
        it.map { row =>
          bos.reset()
          encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
          writer.write(toAvro(row, schema).asInstanceOf[GenericRecord], encoder)
          encoder.flush()
          Row(bos.toByteArray)
        }
      }(Encoders.row(StructType(Seq(StructField("value", BinaryType, nullable = false)))))
  }
}
