package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.Sources

/** Type-system mapping coverage (SURVEY §1.2): every reference column
  * type maps to the declared Spark type, including unsigned widening,
  * and GraftRow's typed getters round-trip each one.
  */
class ColTypeSpec extends SparkSpec {

  test("sif type vocabulary maps per the SURVEY table") {
    import ColType._
    assert(Bool.spark == BooleanType)
    assert(Int8.spark == ByteType && Int16.spark == ShortType)
    assert(Int32.spark == IntegerType && Int64.spark == LongType)
    assert(UInt8.spark == ShortType && UInt16.spark == IntegerType)
    assert(UInt32.spark == LongType && UInt64.spark == DecimalType(20, 0))
    assert(Float32.spark == FloatType && Float64.spark == DoubleType)
    assert(FixedString(8).spark == StringType && VarString.spark == StringType)
    assert(FixedBytes(4).spark == BinaryType && VarBytes.spark == BinaryType)
    assert(Time().spark == TimestampType)
    assert(Composite(MapType(IntegerType, LongType)).spark ==
      MapType(IntegerType, LongType))
  }

  test("GraftRow typed getters round-trip every type") {
    val schema = Sources.schemaOf(
      "b" -> ColType.Bool, "i8" -> ColType.Int8, "i16" -> ColType.Int16,
      "i32" -> ColType.Int32, "i64" -> ColType.Int64,
      "f32" -> ColType.Float32, "f64" -> ColType.Float64,
      "s" -> ColType.VarString, "bin" -> ColType.VarBytes,
      "t" -> ColType.Time())
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val rows = Seq(Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5,
      "hi", Array[Byte](7, 8), ts))
    val r = Sources.memory(spark, rows, schema).collect(1).head
    assert(r.getBool("b") && r.getByte("i8") == 1 && r.getShort("i16") == 2)
    assert(r.getInt("i32") == 3 && r.getLong("i64") == 4L)
    assert(r.getFloat("f32") == 1.5f && r.getDouble("f64") == 2.5)
    assert(r.getString("s") == "hi")
    assert(r.getBytes("bin").toSeq == Seq[Byte](7, 8))
    assert(r.getTime("t") == ts)
  }
}
