package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType, DoubleType}

/** Pins the integer fast path of the exact-decimal kernels to the
  * BigDecimal reference, element-wise and whole-call: the engine's
  * oracle hashes depend on `BigDecimal.valueOf(double).setScale(15,
  * HALF_UP)` bit-exactly, so the fast path must agree on EVERY double it
  * claims, and defer on the rest.
  */
class Decimal15Spec extends AnyFunSuite {

  private def reference(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(15, java.math.RoundingMode.HALF_UP)

  private def checkOne(v: Double): Unit = {
    val u = Decimal15.unitsOrUnsafe(v)
    if (u != Decimal15.Unsafe) {
      val ref = reference(v)
      assert(ref.precision <= 30, s"fast path claimed an overflow value $v")
      assert(u == ref.unscaledValue().longValueExact(),
        s"fast path disagrees with BigDecimal reference on $v: " +
          s"fast=$u ref=${ref.unscaledValue()}")
    }
  }

  test("unitsOrUnsafe agrees with the BigDecimal reference across magnitudes") {
    val rnd = new scala.util.Random(42)
    // realistic similarity products (|v| ~ 1e-4 .. 1), entropy terms
    // (1 .. 1e4), and a magnitude sweep including the window edges
    for (_ <- 1 to 200000) checkOne((rnd.nextDouble() - 0.5) * 2.0)
    for (_ <- 1 to 100000) checkOne((rnd.nextDouble() - 0.5) * 2e4)
    for (_ <- 1 to 100000) checkOne((rnd.nextDouble() - 0.5) * 2e-6)
    for (exp <- -30 to 20; _ <- 1 to 2000)
      checkOne((rnd.nextDouble() - 0.5) * math.pow(2.0, exp))
    // float products — the knn/near-dup rescore's actual input class
    for (_ <- 1 to 200000) {
      val x = (rnd.nextFloat() - 0.5f) * 2f
      val y = (rnd.nextFloat() - 0.5f) * 2f
      checkOne(x.toDouble * y.toDouble)
    }
  }

  test("unitsOrUnsafe handles ties, zeros and window edges") {
    checkOne(0.0); checkOne(-0.0)
    assert(Decimal15.unitsOrUnsafe(0.0) == 0L)
    assert(Decimal15.unitsOrUnsafe(-0.0) == 0L)
    // exact scale-15 half-boundaries must defer (HALF_UP ties) or agree
    for (k <- Seq(1L, 3L, 7L, 123456L, 999999999L)) {
      val v = (k.toDouble + 0.5) * 1e-15
      checkOne(v); checkOne(-v)
    }
    // doubles straddling the representability edge of the window
    for (v <- Seq(8191.999, 8192.001, 3e-8, 2.9e-8, 1e-25, 1e25,
        java.lang.Double.MIN_VALUE, java.lang.Double.MAX_VALUE))
      { checkOne(v); checkOne(-v) }
    // exhaustive near-boundary scan: values whose distance to a half
    // boundary is within a few ulps — the ambiguity test must defer or
    // agree on every one
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50000) {
      val k = rnd.nextInt(1000000)
      val base = (k.toDouble + 0.5) * 1e-15
      val jitter = rnd.nextInt(9) - 4
      val v = java.lang.Double.longBitsToDouble(
        java.lang.Double.doubleToLongBits(base) + jitter)
      checkOne(v)
    }
  }

  private val fArr = ArrayType(FloatType)
  private def expr = DotProductExactF(
    Literal.create(null, fArr), Literal.create(null, fArr))
  private def arr(xs: Array[Float]): ArrayData = ArrayData.toArrayData(xs)

  test("DotProductExactF fast kernel == slow kernel on fuzzed vectors") {
    val rnd = new scala.util.Random(11)
    val e = expr
    for (trial <- 1 to 3000) {
      val n = 1 + rnd.nextInt(96)
      val scale = Seq(1f, 10f, 100f, 4000f)(rnd.nextInt(4))
      val a = Array.fill(n)((rnd.nextFloat() - 0.5f) * scale)
      val b = Array.fill(n)((rnd.nextFloat() - 0.5f) * scale)
      val fast = e.kernel(arr(a), arr(b))
      val slow = e.kernelSlow(arr(a), arr(b))
      assert(fast == slow, s"trial $trial: fast=$fast slow=$slow")
    }
  }

  test("DotProductExactF restart path: sums beyond the long-units domain") {
    val e = expr
    // each product ~ 4e6 -> units ~ 4e21 per element: element itself is
    // past the long domain, whole call restarts on the BigDecimal path
    val a = Array.fill(8)(2000f)
    val b = Array.fill(8)(2000f)
    assert(e.kernel(arr(a), arr(b)) == e.kernelSlow(arr(a), arr(b)))
    // large-but-legal magnitudes that overflow the accumulator only
    val c = Array.fill(64)(3000f)
    val d = Array.fill(64)(3000f)
    assert(e.kernel(arr(c), arr(d)) == e.kernelSlow(arr(c), arr(d)))
  }

  test("DotProductExactF nulls, mismatch and non-finite behave as before") {
    val e = expr
    assert(e.kernel(arr(Array(1f, 2f)), arr(Array(1f))) == null)
    val withNull = ArrayData.toArrayData(Array[Any](1.0f, null))
    assert(e.kernel(withNull, arr(Array(1f, 2f))) == null)
    val big = Array.fill(2)(Float.MaxValue)
    val ex1 = intercept[ArithmeticException](e.kernel(arr(big), arr(big)))
    val ex2 = intercept[ArithmeticException](e.kernelSlow(arr(big), arr(big)))
    assert(ex1.getMessage == ex2.getMessage)
  }

  test("double-element arrays take the same fast/slow agreement") {
    val dArr = ArrayType(DoubleType)
    val e = DotProductExactF(Literal.create(null, dArr), Literal.create(null, dArr))
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 1000) {
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)((rnd.nextDouble() - 0.5) * 100)
      val b = Array.fill(n)((rnd.nextDouble() - 0.5) * 100)
      val ad = ArrayData.toArrayData(a)
      val bd = ArrayData.toArrayData(b)
      assert(e.kernel(ad, bd) == e.kernelSlow(ad, bd))
    }
  }
}
