package graft

import java.io.ByteArrayOutputStream
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.{AvroCodec, StreamIngest}

/** Connector-free binary-Avro bridge (reference Kafka Avro branch,
  * spark_kafka_processor.py:106-130). Decode is proven against bytes
  * produced by the *plain Avro library* (wire compatibility, not just
  * self-inverse), encode by the roundtrip identity.
  */
class AvroCodecSpec extends SparkTestBase {
  import spark.implicits._

  private val turnSchema =
    """{"type":"record","name":"TurnEvent","fields":[
      |{"name":"conv_id","type":"string"},
      |{"name":"turn_idx","type":"int"},
      |{"name":"role","type":"string"},
      |{"name":"text","type":"string"},
      |{"name":"tool","type":["null","string"],"default":null},
      |{"name":"ts","type":{"type":"long","logicalType":"local-timestamp-micros"}}]}""".stripMargin

  private def avroBytes(schema: Schema)(fill: GenericRecord => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fill(rec)
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  test("decode reads library-written bytes: primitives, nullable union, ntz timestamp") {
    val schema = new Schema.Parser().parse(turnSchema)
    val t0 = LocalDateTime.of(2024, 1, 3, 10, 30, 0, 123456000)
    val rows = Seq(
      avroBytes(schema) { r =>
        r.put("conv_id", "conv_1"); r.put("turn_idx", 0); r.put("role", "user")
        r.put("text", "hello"); r.put("tool", null)
        r.put("ts", 1704277800123456L) // 2024-01-03T10:30:00.123456Z
      },
      avroBytes(schema) { r =>
        r.put("conv_id", "conv_1"); r.put("turn_idx", 1); r.put("role", "tool")
        r.put("text", "ran search"); r.put("tool", "search")
        r.put("ts", 1704277860000000L)
      })
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_))),
      StructType(Seq(StructField("value", BinaryType))))
    val out = StreamIngest.decodeAvro(df, turnSchema)
      .orderBy("turn_idx").collect()

    assert(out.length == 2)
    assert(out(0).getAs[String]("conv_id") == "conv_1")
    assert(out(0).getAs[String]("role") == "user")
    assert(out(0).isNullAt(out(0).fieldIndex("tool")))
    assert(out(0).getAs[LocalDateTime]("ts") == t0)
    assert(out(1).getAs[String]("tool") == "search")
  }

  test("a NULL value (Kafka tombstone) decodes to an all-null row, not an NPE") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"k","type":"string"},{"name":"v","type":"int"}]}""".stripMargin
    val bytes = {
      val s = new Schema.Parser().parse(schema)
      val rec = new GenericData.Record(s)
      rec.put("k", "a"); rec.put("v", 7)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](s).write(rec, enc)
      enc.flush(); out.toByteArray
    }
    val df = Seq(Some(bytes), None).map(_.orNull).toDF("value")
    val rows = AvroCodec.decode(df, "value", schema).collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.getString(0) == "a" && r.getInt(1) == 7))
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("spark schema derivation covers the supported surface") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"b","type":"boolean"},{"name":"i","type":"int"},
        |{"name":"l","type":"long"},{"name":"f","type":"float"},
        |{"name":"d","type":"double"},{"name":"s","type":"string"},
        |{"name":"by","type":"bytes"},
        |{"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}},
        |{"name":"arr","type":{"type":"array","items":"long"}},
        |{"name":"m","type":{"type":"map","values":"double"}},
        |{"name":"opt","type":["null","double"],"default":null},
        |{"name":"tsz","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"dt","type":{"type":"int","logicalType":"date"}},
        |{"name":"nested","type":{"type":"record","name":"N","fields":[
        |  {"name":"x","type":"long"},{"name":"y","type":["null","string"],"default":null}]}}
        |]}""".stripMargin
    val st = AvroCodec.sparkType(new Schema.Parser().parse(schema)).asInstanceOf[StructType]
    val byName = st.fields.map(f => f.name -> f).toMap
    assert(byName("b").dataType == BooleanType && byName("i").dataType == IntegerType)
    assert(byName("l").dataType == LongType && byName("f").dataType == FloatType)
    assert(byName("d").dataType == DoubleType && byName("s").dataType == StringType)
    assert(byName("by").dataType == BinaryType && byName("e").dataType == StringType)
    assert(byName("arr").dataType == ArrayType(LongType))
    assert(byName("m").dataType == MapType(StringType, DoubleType))
    assert(byName("opt").dataType == DoubleType && byName("opt").nullable)
    assert(byName("tsz").dataType == TimestampType)
    assert(byName("dt").dataType == DateType)
    assert(byName("nested").dataType.isInstanceOf[StructType])
  }

  test("encode -> decode is the identity on complex rows") {
    val schema =
      """{"type":"record","name":"C","fields":[
        |{"name":"id","type":"long"},
        |{"name":"opt","type":["null","string"],"default":null},
        |{"name":"arr","type":{"type":"array","items":"double"}},
        |{"name":"m","type":{"type":"map","values":"long"}},
        |{"name":"tsz","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"nested","type":{"type":"record","name":"N","fields":[
        |  {"name":"x","type":"long"},{"name":"y","type":["null","string"],"default":null}]}}
        |]}""".stripMargin
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a", Seq(1.5, 2.5), Map("k" -> 7L),
          Timestamp.valueOf("2024-06-01 12:00:00.000001"), Row(10L, "yy")),
        Row(2L, null, Seq.empty[Double], Map.empty[String, Long],
          Timestamp.valueOf("2024-06-02 00:00:00"), Row(20L, null)))),
      AvroCodec.sparkType(new Schema.Parser().parse(schema)).asInstanceOf[StructType])

    val out = AvroCodec.decode(AvroCodec.encode(in, schema), "value", schema)
    // decode relaxes TOP-LEVEL nullability (tombstones yield all-null
    // rows); types and nested nullability are preserved exactly
    val relaxed = StructType(in.schema.fields.map(_.copy(nullable = true)))
    assert(out.schema == relaxed)
    assert(out.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }

  test("roundtrip over a generated transcript matches the original frame") {
    val t = Transcripts.synthetic(spark, nConvs = 5, turnsPerConv = 12)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = StreamIngest.decodeAvro(AvroCodec.encode(t, turnSchema), turnSchema)
    assert(out.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    assert(out.exceptAll(t).isEmpty && t.exceptAll(out).isEmpty)
  }

  test("encode resolves nested record fields by name, not position") {
    // Spark struct field order (y, x) deliberately REVERSED vs the Avro
    // record (x, y): positional encoding would silently swap the values
    val schema =
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"string"},
        |{"name":"pt","type":{"type":"record","name":"Pt","fields":[
        |{"name":"x","type":"double"},{"name":"y","type":"double"}]}}]}""".stripMargin
    val df = Seq(("a", 2.0, 1.0)).toDF("id", "y", "x")
      .select(col("id"), struct(col("y"), col("x")).as("pt"))
    val decoded = AvroCodec.decode(
      AvroCodec.encode(df, schema), "value", schema)
    val row = decoded.select("pt.x", "pt.y").as[(Double, Double)].head()
    assert(row == ((1.0, 2.0)), s"x must carry the x value, got $row")
    // a nested struct MISSING an Avro field fails loudly, not positionally
    val dfMissing = Seq(("a", 1.0)).toDF("id", "x")
      .select(col("id"), struct(col("x")).as("pt"))
    val e = intercept[Exception] {
      AvroCodec.encode(dfMissing, schema).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(s => Option(s.getMessage).toSeq ++ msgs(s.getCause))
    assert(
      msgs(e).exists { m =>
        val lm = m.toLowerCase
        lm.contains("y") && (lm.contains("not") || lm.contains("no such"))
      },
      msgs(e).mkString(" | "))
  }

  test("nested fields resolve case-insensitively, like the analyzer") {
    // spark.sql.caseSensitive=false everywhere else: a struct field
    // spelled "X" satisfies Avro field "x"; the encode path must agree
    val schema =
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"string"},
        |{"name":"pt","type":{"type":"record","name":"Pt","fields":[
        |{"name":"x","type":"double"},{"name":"y","type":"double"}]}}]}""".stripMargin
    val df = Seq(("a", 2.0, 1.0)).toDF("id", "Y", "X")
      .select(col("id"), struct(col("Y"), col("X")).as("pt"))
    val decoded = AvroCodec.decode(
      AvroCodec.encode(df, schema), "value", schema)
    val row = decoded.select("pt.x", "pt.y").as[(Double, Double)].head()
    assert(row == ((1.0, 2.0)), s"case-variant fields must resolve, got $row")
  }

  test("general unions are rejected with a clear error") {
    val bad =
      """{"type":"record","name":"U","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      AvroCodec.sparkType(new Schema.Parser().parse(bad))
    }
    assert(e.getMessage.contains("unions"))
  }
}
