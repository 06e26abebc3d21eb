package graft

import org.apache.spark.sql.types._

/** The engine's wire type system and its Spark bridge — the analog of the
  * reference's ValueType enum (sdk/python/feast/value_type.py:35-87) and
  * user-facing types (sdk/python/feast/types.py:75-131, Array :182,
  * Struct :274), with both mapping directions ported from the authoritative
  * tables:
  *  - Feast→Spark: infra/compute_engines/spark/nodes.py:52-105
  *  - Spark→Feast: sdk/python/feast/type_map.py:1940-1985
  *  - widening compatibility: spark/nodes.py:108-143
  */
object FeastType extends Enumeration {
  type FeastType = Value
  val BYTES, STRING, INT32, INT64, FLOAT32, FLOAT64, BOOL, UNIX_TIMESTAMP,
      DECIMAL, MAP, JSON = Value
}

sealed trait FType
case class Primitive(t: FeastType.FeastType) extends FType
case class FArray(element: FType) extends FType
case class FStruct(fields: Seq[(String, FType)]) extends FType

object TypeBridge {
  import FeastType._

  /** Feast→Spark (nodes.py:52-105 from_feast_to_spark_type). */
  def toSpark(t: FType): DataType = t match {
    case Primitive(BYTES)          => BinaryType
    case Primitive(STRING)         => StringType
    case Primitive(INT32)          => IntegerType
    case Primitive(INT64)          => LongType
    case Primitive(FLOAT32)        => FloatType
    case Primitive(FLOAT64)        => DoubleType
    case Primitive(BOOL)           => BooleanType
    case Primitive(UNIX_TIMESTAMP) => TimestampType
    // reference maps DECIMAL→double and JSON→string at the Spark boundary
    case Primitive(DECIMAL)        => DoubleType
    case Primitive(JSON)           => StringType
    case Primitive(MAP)            => MapType(StringType, StringType)
    case FArray(e)                 => ArrayType(toSpark(e))
    case FStruct(fs) =>
      StructType(fs.map { case (n, ft) => StructField(n, toSpark(ft)) })
    case Primitive(other) =>
      throw new IllegalArgumentException(s"unmapped feast type $other")
  }

  /** Spark→Feast (type_map.py:1940-1985 spark_to_feast_value_type; note
    * decimal→FLOAT64, date→UNIX_TIMESTAMP there).
    */
  def fromSpark(dt: DataType): FType = dt match {
    case BinaryType           => Primitive(BYTES)
    case StringType           => Primitive(STRING)
    case IntegerType          => Primitive(INT32)
    case ShortType | ByteType => Primitive(INT32)
    case LongType             => Primitive(INT64)
    case FloatType            => Primitive(FLOAT32)
    case DoubleType           => Primitive(FLOAT64)
    case _: DecimalType       => Primitive(FLOAT64)
    case BooleanType          => Primitive(BOOL)
    case TimestampType | TimestampNTZType | DateType => Primitive(UNIX_TIMESTAMP)
    case MapType(_, _, _)     => Primitive(MAP)
    case ArrayType(e, _)      => FArray(fromSpark(e))
    case StructType(fs)       => FStruct(fs.toSeq.map(f => f.name -> fromSpark(f.dataType)))
    case other =>
      throw new IllegalArgumentException(s"non-convertible spark type $other")
  }

  /** Widening compatibility (nodes.py:108-143): exact match, int↔long,
    * float↔double, map↔struct, element-wise for arrays, field-wise for
    * structs.
    */
  def compatible(expected: DataType, actual: DataType): Boolean =
    (expected, actual) match {
      case (a, b) if a == b                           => true
      case (IntegerType, LongType)                    => true
      case (LongType, IntegerType)                    => true
      case (FloatType, DoubleType)                    => true
      case (DoubleType, FloatType)                    => true
      case (MapType(_, _, _), _: StructType)          => true
      case (_: StructType, MapType(_, _, _))          => true
      case (ArrayType(a, _), ArrayType(b, _))         => compatible(a, b)
      case (StructType(a), StructType(b)) =>
        a.length == b.length && a.zip(b).forall { case (x, y) =>
          x.name == y.name && compatible(x.dataType, y.dataType)
        }
      case _ => false
    }
}
