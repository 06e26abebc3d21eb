package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.FeastType._
import graft.plans.Validate

class TypeBridgeSpec extends AnyFunSuite {

  test("feast→spark primitive + nested mappings (nodes.py:52-105)") {
    assert(TypeBridge.toSpark(Primitive(INT32)) == IntegerType)
    assert(TypeBridge.toSpark(Primitive(UNIX_TIMESTAMP)) == TimestampType)
    assert(TypeBridge.toSpark(Primitive(MAP)) == MapType(StringType, StringType))
    assert(TypeBridge.toSpark(Primitive(JSON)) == StringType)
    assert(TypeBridge.toSpark(FArray(Primitive(FLOAT32))) == ArrayType(FloatType))
    assert(TypeBridge.toSpark(FArray(FArray(Primitive(STRING)))) ==
      ArrayType(ArrayType(StringType)))
    assert(TypeBridge.toSpark(FStruct(Seq("a" -> Primitive(INT64)))) ==
      StructType(Seq(StructField("a", LongType))))
  }

  test("spark→feast mappings incl. decimal/date coercions (type_map.py:1940-1985)") {
    assert(TypeBridge.fromSpark(DecimalType(10, 2)) == Primitive(FLOAT64))
    assert(TypeBridge.fromSpark(DateType) == Primitive(UNIX_TIMESTAMP))
    assert(TypeBridge.fromSpark(TimestampNTZType) == Primitive(UNIX_TIMESTAMP))
    assert(TypeBridge.fromSpark(ArrayType(DoubleType)) == FArray(Primitive(FLOAT64)))
    intercept[IllegalArgumentException](TypeBridge.fromSpark(CalendarIntervalType))
  }

  test("round trip is stable for the primitive core") {
    for (t <- Seq(BYTES, STRING, INT32, INT64, FLOAT32, FLOAT64, BOOL, UNIX_TIMESTAMP))
      assert(TypeBridge.fromSpark(TypeBridge.toSpark(Primitive(t))) == Primitive(t))
  }

  test("widening compatibility rules (nodes.py:108-143)") {
    assert(TypeBridge.compatible(IntegerType, LongType))
    assert(TypeBridge.compatible(DoubleType, FloatType))
    assert(!TypeBridge.compatible(IntegerType, StringType))
    assert(TypeBridge.compatible(ArrayType(IntegerType), ArrayType(LongType)))
    assert(TypeBridge.compatible(
      MapType(StringType, StringType), StructType(Seq(StructField("x", StringType)))))
    assert(!TypeBridge.compatible(
      StructType(Seq(StructField("a", IntegerType))),
      StructType(Seq(StructField("b", IntegerType)))))
  }
}

/** Schema-validation node semantics (P10; spark/nodes.py:623-724). */
class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val src = Seq(
    ("c1", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, """{"k": 1}"""),
    ("c2", java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), 2L, "not json")
  ).toDF("conv_id", "ts", "score", "props")

  private def view = FeatureView("v", src, Seq("conv_id"), "ts")

  test("missing declared column is an error") {
    val r = Validate.validate(view, Map("nope" -> IntegerType))
    assert(!r.ok && r.missingColumns == Seq("nope"))
  }

  test("widenable type passes; non-widenable warns") {
    val ok = Validate.validate(view, Map("score" -> IntegerType)) // long actual
    assert(ok.ok && ok.typeWarnings.isEmpty)
    val warn = Validate.validate(view, Map("score" -> StringType))
    assert(warn.ok && warn.typeWarnings.exists(_.contains("score")))
  }

  test("json sample check counts invalid documents") {
    val r = Validate.validate(view, Map.empty, jsonCols = Seq("props"))
    assert(r.invalidJsonCounts == Map("props" -> 1L))
  }
}
