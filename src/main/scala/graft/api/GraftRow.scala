package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.StructType

/** Mutable row facade for closure-based operations — the analogue of the
  * reference's `Row` accessor interface (reference row.go:10-53): typed
  * getters, nil semantics, and set-by-name mutation.
  *
  * The reference mutates fixed-width rows in place
  * (internal/partition/row.go:24-31); Spark rows are immutable, so this
  * facade stages mutations in a local buffer and materializes a fresh Row
  * — semantics identical, Tungsten keeps the memory story.
  */
final class GraftRow private[api] (val schema: StructType, values: Array[Any]) {

  private def idx(name: String): Int = schema.fieldIndex(name)

  /** Typed getters ERROR on nil cells (reference row.go getters return an
    * error for unset cells) — silently unboxing null to 0/0.0/false would
    * corrupt downstream arithmetic without a trace. Check [[isNil]] first,
    * or rely on `ignoreRowErrors`/quarantine to skip the row; [[get]] and
    * [[getAs]] remain raw nullable access.
    */
  private def nn(name: String): Any = {
    val v = values(idx(name))
    if (v == null) throw new NullPointerException(
      s"nil cell '$name' read through a typed getter — check isNil() first")
    v
  }

  def isNil(name: String): Boolean = values(idx(name)) == null
  def get(name: String): Any = values(idx(name))
  def getBool(name: String): Boolean = nn(name).asInstanceOf[Boolean]
  def getByte(name: String): Byte = nn(name).asInstanceOf[Byte]
  def getShort(name: String): Short = nn(name).asInstanceOf[Short]
  def getInt(name: String): Int = nn(name).asInstanceOf[Int]
  def getLong(name: String): Long = nn(name).asInstanceOf[Long]
  def getFloat(name: String): Float = nn(name).asInstanceOf[Float]
  def getDouble(name: String): Double = nn(name).asInstanceOf[Double]
  def getString(name: String): String = nn(name).asInstanceOf[String]
  def getBytes(name: String): Array[Byte] = nn(name).asInstanceOf[Array[Byte]]
  def getTime(name: String): java.sql.Timestamp =
    nn(name).asInstanceOf[java.sql.Timestamp]
  def getAs[T](name: String): T = values(idx(name)).asInstanceOf[T]

  def set(name: String, value: Any): GraftRow = { values(idx(name)) = value; this }
  def setNil(name: String): GraftRow = set(name, null)

  private[api] def toRow: Row = new GenericRowWithSchema(values.clone(), schema)
  private[api] def copyRow: GraftRow = new GraftRow(schema, values.clone())
}

object GraftRow {
  def fromRow(r: Row, schema: StructType): GraftRow = {
    val arr = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) { arr(i) = r.get(i); i += 1 }
    new GraftRow(schema, arr)
  }
  /** Fresh all-nil row of the given schema (the reference's RowFactory,
    * operation.go:28 / flatmap.go:25-35).
    */
  def empty(schema: StructType): GraftRow =
    new GraftRow(schema, new Array[Any](schema.length))
}
