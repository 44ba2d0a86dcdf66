package graft.api

import org.apache.spark.sql.types._

/** The reference's column-type vocabulary mapped onto Spark SQL types
  * (SURVEY.md §1.2; reference column_type.go:11-237,
  * column_type_variable.go:16-111).
  *
  * Fixed-width vs var-width is a *storage* distinction in the reference;
  * in Spark it is purely declarative (Tungsten manages layout), so both
  * map to the same logical types. Unsigned types widen (Spark has no
  * unsigned integers): u8→Short, u16→Int, u32→Long, u64→Decimal(20,0).
  */
sealed trait ColType { def spark: DataType }

object ColType {
  case object Bool extends ColType { val spark: DataType = BooleanType }
  case object Byte extends ColType { val spark: DataType = ByteType }
  final case class FixedBytes(length: Int) extends ColType { val spark: DataType = BinaryType }
  case object VarBytes extends ColType { val spark: DataType = BinaryType }
  case object Int8 extends ColType { val spark: DataType = ByteType }
  case object Int16 extends ColType { val spark: DataType = ShortType }
  case object Int32 extends ColType { val spark: DataType = IntegerType }
  case object Int64 extends ColType { val spark: DataType = LongType }
  case object UInt8 extends ColType { val spark: DataType = ShortType }
  case object UInt16 extends ColType { val spark: DataType = IntegerType }
  case object UInt32 extends ColType { val spark: DataType = LongType }
  case object UInt64 extends ColType { val spark: DataType = DecimalType(20, 0) }
  case object Float32 extends ColType { val spark: DataType = FloatType }
  case object Float64 extends ColType { val spark: DataType = DoubleType }
  /** `format` uses Java time patterns (the reference uses Go layouts —
    * callers translate, e.g. "2006-01-02 15:04:05" → "yyyy-MM-dd HH:mm:ss").
    */
  final case class Time(format: String = "yyyy-MM-dd HH:mm:ss") extends ColType {
    val spark: DataType = TimestampType
  }
  final case class FixedString(length: Int) extends ColType { val spark: DataType = StringType }
  case object VarString extends ColType { val spark: DataType = StringType }
  /** Natively-typed composite columns subsume the reference's
    * CustomColumnType gob-serialization mechanism (column_type.go:16-23):
    * declare the real structure instead of opaque bytes.
    */
  final case class Composite(dataType: DataType) extends ColType { val spark: DataType = dataType }
  /** Genuinely opaque user type — the reference's CustomColumnType with
    * user Serialize/Deserialize (column_type.go:16-23,
    * docs/custom-columntypes.md:1-40; gob there, kryo here via
    * [[OpaqueCodec]]). Prefer [[Composite]]: a declared structure stays
    * visible to Catalyst (pruning, pushdown); opaque bytes do not.
    */
  final case class Opaque(of: Class[_]) extends ColType { val spark: DataType = BinaryType }
}

/** Kryo codec for [[ColType.Opaque]] columns — the engine-side half of
  * the reference's CustomColumnType Serialize/Deserialize contract.
  * Call at closure boundaries: `row.set("hm", OpaqueCodec.toBytes(v))`,
  * `OpaqueCodec.fromBytes[Heatmap](row.getBytes("hm"))`.
  */
object OpaqueCodec {
  // One serializer per JVM (executor); instances are created per call —
  // SerializerInstance is not thread-safe, creation is cheap.
  @transient private lazy val kryo =
    new org.apache.spark.serializer.KryoSerializer(
      Option(org.apache.spark.SparkEnv.get).map(_.conf)
        .getOrElse(new org.apache.spark.SparkConf(false)))

  def toBytes[T: scala.reflect.ClassTag](v: T): Array[Byte] = {
    val bb = kryo.newInstance().serialize(v)
    val a = new Array[Byte](bb.remaining()); bb.get(a); a
  }

  def fromBytes[T: scala.reflect.ClassTag](bytes: Array[Byte]): T =
    kryo.newInstance().deserialize[T](java.nio.ByteBuffer.wrap(bytes))
}

/** Builder-style schema declaration mirroring the reference's
  * `CreateSchema().CreateColumn(...)` flow (schema/schema.go:201-215).
  * Schemas are always declared, never inferred.
  */
final class SchemaBuilder private (cols: Vector[StructField]) {
  def createColumn(name: String, t: ColType, nullable: Boolean = true): SchemaBuilder =
    new SchemaBuilder(cols :+ StructField(name, t.spark, nullable))
  def toStruct: StructType = StructType(cols)
}

object SchemaBuilder {
  def create(): SchemaBuilder = new SchemaBuilder(Vector.empty)
}
