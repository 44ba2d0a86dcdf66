package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — a gap in Spark's function surface that matters for
  * corpus hygiene: "café" composed (U+00E9) and decomposed (e+U+0301)
  * are DIFFERENT byte strings to every hash-based dedup/fingerprint
  * operator until normalized, so a crawl mixing encoders silently
  * escapes exact dedup. Run this before fingerprinting.
  *
  * Cross-engine determinism: NFC results for assigned code points are
  * frozen by Unicode's normalization stability policy (no new
  * compositions since 4.1), so the JDK and any other engine's
  * implementation (e.g. utf8proc) agree on all assigned characters —
  * the oracle relies on exactly this.
  *
  * Reference capability note: the reference engine has no Unicode
  * handling at all — strings are fixed-width byte arrays
  * (reference column_type.go:225-237); normalization would be a
  * hand-written Map closure.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with KernelCodegen {
  private val normalForm = form.toUpperCase match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (want NFC/NFD/NFKC/NFKD)")
  }

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.catalogString}")
    }

  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: pure ASCII (the overwhelmingly common case in web text)
    // is normalized under every form already — skip the Normalizer call
    var ascii = true
    var i = 0
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, normalForm))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeExpressions {
  def unicodeNormalize(text: Column, form: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      UnicodeNormalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), form))
}
