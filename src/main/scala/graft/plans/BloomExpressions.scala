package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch — the probe
  * side of a runtime join filter (see [[graft.operators.Bloom]]).
  *
  * The sketch ships as serialized bytes (one copy per task via the
  * references array, NOT per row) and is deserialized lazily on first
  * probe. Codegen splices a virtual call on this expression instance into
  * the surrounding stage, same pattern as the sketch kernels in
  * [[HashExpressions]] — the filter runs inside WholeStageCodegen, so a
  * scan-side probe costs one hash per row with zero boxing for longs.
  *
  * Hashing must match what `Dataset.stat.bloomFilter` used at build time:
  * integral types are inserted as longs, strings as UTF-8 bytes — mirrored
  * here (verified end-to-end in BloomSpec).
  *
  * Null semantics: null input → null (i.e. dropped by a WHERE), matching
  * the exact join it pre-filters, where null keys never match.
  */
case class BloomMightContain(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral or string key, got ${other.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch))

  def testLong(v: Long): Boolean = bloom.mightContainLong(v)
  def testString(v: UTF8String): Boolean = bloom.mightContainBinary(v.getBytes)

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => testString(s)
    case l: Long => testLong(l)
    case i: Int => testLong(i.toLong)
    case s: Short => testLong(s.toLong)
    case b: Byte => testLong(b.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      child.dataType match {
        case StringType => s"${ev.value} = $ref.testString($input);"
        case _ => s"${ev.value} = $ref.testLong((long) $input);"
      }
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExpressions {
  /** Column wrapper: `true` iff `key` might be in the sketch. */
  def mightContain(key: Column, sketch: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    sketch.writeTo(out)
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(key), out.toByteArray))
  }
}
