package graft.plans

/** Exact fast path for the engine's pervasive per-element decimal step
  * `BigDecimal.valueOf(v).setScale(15, HALF_UP)` (Spark's double→decimal
  * cast semantics): the scale-15 unscaled value as a plain long, computed
  * with integer arithmetic from the double's bits — no `Double.toString`,
  * no string parse, no BigDecimal allocation.
  *
  * Correctness argument (the spec fuzzes this against the BigDecimal
  * reference): let B be the double's exact binary value and D its
  * shortest decimal representation (`Double.toString`, what
  * `BigDecimal.valueOf` parses). D always lies inside B's round-to-
  * nearest interval, |D − B| ≤ ulp(B)/2. The kernel computes
  * round_half_up(B·10¹⁵) exactly (B·10¹⁵ = m·5¹⁵·2^(e+15), a 128-bit
  * integer shift) AND the exact distance from B·10¹⁵ to the nearest
  * rounding boundary (a half-integer). When that distance exceeds
  * ulp(B)/2·10¹⁵ = 5¹⁵·2^(e+14), every value in the interval — D
  * included — rounds to the same unit count, so the binary answer IS the
  * shortest-decimal answer. Otherwise (≈0.1–20% of inputs depending on
  * magnitude, including every exact tie) the caller falls back to the
  * BigDecimal reference for that element. Inputs outside the easy
  * exponent window (|v| ≳ 8·10³ or < 2⁻²⁵, subnormals, zeros handled
  * separately) also fall back — they are vanishingly rare on the
  * similarity/entropy paths this serves.
  */
object Decimal15 {

  /** Sentinel: the caller must use the BigDecimal reference path.
    * (Long.MinValue can never be a legitimate result here: the fast
    * window caps |result| well below 2⁶³.)
    */
  final val Unsafe: Long = Long.MinValue

  private final val F5: Long = 30517578125L // 5^15

  /** Scale-15 unscaled value of `BigDecimal.valueOf(v).setScale(15,
    * HALF_UP)` for finite `v`, or [[Unsafe]] when the fast path cannot
    * prove the answer. NaN/Inf are the CALLER's to reject first (their
    * contract differs per call site).
    */
  def unitsOrUnsafe(v: Double): Long = {
    if (v == 0.0) return 0L // +0.0 and -0.0 both print as 0-valued
    val bits = java.lang.Double.doubleToRawLongBits(v)
    val e = ((bits >>> 52) & 0x7ff).toInt
    // subnormals (e == 0) and the huge/tiny windows take the slow path;
    // e in [998, 1035] <=> |v| in [2^-25, 2^13) — covers every sane
    // similarity product and entropy term
    if (e < 998 || e > 1035) return Unsafe
    val m = (bits & 0x000fffffffffffffL) | (1L << 52) // implicit bit, m < 2^53
    // B*10^15 = m * 5^15 * 2^(E+15), E = e - 1075; r = -(E+15) = 1060 - e
    val r = 1060 - e // in [25, 62]
    val hi = Math.multiplyHigh(m, F5) // m*F5 < 2^88, hi < 2^24
    val lo = m * F5
    val q = (hi << (64 - r)) | (lo >>> r) // exact floor(B*10^15), < 2^(88-r)
    val rem = lo & ((1L << r) - 1L) // low r bits of the 128-bit product
    // ambiguity test: distance from B*10^15 to the nearest half-integer
    // boundary must exceed ulp/2 * 10^15 = F5 * 2^(e-1075+14) = F5/2^(r+1);
    // scaled by 2^(r+1): |2*rem - 2^r| > F5. Exact ties (rem2 == boundary)
    // fail the test and delegate — HALF_UP tie handling stays with the
    // reference implementation.
    val diff = (rem << 1) - (1L << r)
    if (diff > F5) { // frac > 1/2 + margin: round up
      val u = q + 1L
      if (v > 0) u else -u
    } else if (diff < -F5) { // frac < 1/2 - margin: round down
      if (v > 0) q else -q
    } else Unsafe
  }

  /** The BigDecimal reference for one element — the exact code the fast
    * path replaces. Throws on precision overflow with the caller-named
    * message, matching the historical per-element contract.
    */
  def unitsReference(v: Double, prettyName: String): Long = {
    val p = java.math.BigDecimal.valueOf(v)
      .setScale(15, java.math.RoundingMode.HALF_UP)
    if (p.precision > 30)
      throw new ArithmeticException(
        s"$prettyName: $p cannot be represented as Decimal(30, 15)")
    // precision <= 30 can still exceed a long's 18.96 digits — signal the
    // caller to restart the whole accumulation on BigDecimal
    try p.unscaledValue().longValueExact()
    catch { case _: ArithmeticException => Unsafe }
  }
}
