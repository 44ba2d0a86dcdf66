package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed bytes / raw UTF-8 bytes) as a
  * native codegen'd expression — the classic corpus-quality signal the
  * Gopher/MassiveText-lineage filters ship: highly compressible text is
  * boilerplate/template/repetition (ratio ≪ typical prose), nearly
  * incompressible text is noise, minified blobs, or encoded binary
  * (ratio ≈ 1). Prose lands in a stable mid band, so both tails cut.
  *
  * Raw-deflate (nowrap — no zlib header/checksum: 6 fewer constant
  * bytes that would bias short documents), compression level pinned by
  * the caller (default 6). One pass per row over a JVM-wide per-thread
  * `Deflater` (see [[DeflateRatio$]] for the native-resource bound;
  * reset between rows, never shared across tasks), no other state —
  * map-only, fuses into whole-stage codegen through [[KernelCodegen]]
  * like the hash/unicode kernels.
  *
  * Empty text → 1.0 by definition (no signal, neutral — NOT the ~2-byte
  * empty-block artifact a raw division would produce; callers gate on
  * length separately). Null → null.
  *
  * NO SQL ORACLE IS POSSIBLE for this op: the oracle engine has no
  * deflate surface, and the exact output length additionally depends on
  * the zlib build. The spec therefore pins PROPERTIES (repetition
  * compresses far below prose, high-entropy text stays near 1, ratio is
  * deterministic within a JVM) rather than exact values — the same
  * posture as the other real-codec rows.
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with KernelCodegen {
  require(level >= 1 && level <= 9,
    s"deflate_ratio: level must be in [1, 9], got $level")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.catalogString}")
    }

  def kernel(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) 1.0
    else {
      val d = DeflateRatio.forLevel(level)
      d.reset()
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / raw.length.toDouble
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {
  // One native zlib stream per (executor thread, compression level),
  // SHARED across every DeflateRatio instance in every plan — reset()
  // between rows. Per-row allocation would dominate short documents; a
  // single shared Deflater would race across concurrent tasks; and a
  // per-instance ThreadLocal would accrue one native stream per plan
  // that ever used compressionRatio (never end()ed until finalization).
  // Native-resource bound: at most |threads| × 9 Deflaters per executor
  // JVM for its lifetime — fixed, not plan-count-proportional.
  private val deflaters =
    new ThreadLocal[java.util.HashMap[Int, java.util.zip.Deflater]] {
      override def initialValue() =
        new java.util.HashMap[Int, java.util.zip.Deflater]
    }
  private[plans] def forLevel(level: Int): java.util.zip.Deflater = {
    val m = deflaters.get()
    var d = m.get(level)
    if (d == null) { d = new java.util.zip.Deflater(level, true); m.put(level, d) }
    d
  }
}

object CompressExpressions {
  def deflateRatio(text: Column, level: Int = 6): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DeflateRatio(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), level))
}
