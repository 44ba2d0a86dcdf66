package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** deflate_ratio — property-pinned (a codec has no SQL oracle and its
  * exact output length depends on the zlib build): the band structure
  * the quality gate relies on must hold, and the expression must be a
  * total, deterministic map.
  */
class CompressExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String, level: Int = 6): Double =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.compressionRatio(col("t"), level).as("r"))
      .head().getDouble(0)

  test("band structure: repetition << prose < near-incompressible") {
    val rep = ratio("spark " * 400)
    val prose = ratio(
      ("the quick brown fox jumps over the lazy dog while a distributed " +
        "query engine shuffles partitions across executors and every " +
        "aggregation tree merges partial results near the data ") * 5)
    // hex of successive hashes ≈ 4 bits/char entropy — deflate cannot
    // shrink it much; base band documented in the gate's scaladoc
    val noisy = ratio((0 until 200)
      .map(i => java.lang.Long.toHexString(i * 0x9E3779B97F4A7C15L))
      .mkString(""))
    assert(rep < 0.1, s"repetition must collapse: $rep")
    assert(prose > rep && prose < noisy,
      s"prose must sit between: $rep < $prose < $noisy")
    assert(noisy > 0.4 && noisy <= 1.1, s"noise must stay near 1: $noisy")
  }

  test("totality and determinism: empty is neutral 1.0, null is null") {
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "abc"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == None)
    assert(out(3L).isDefined)
    // same input, same JVM → bit-identical (thread-confined Deflater,
    // pinned level)
    assert(ratio("graft " * 100) == ratio("graft " * 100))
  }

  test("level is a real knob and bounds are enforced") {
    val s = ("a token stream with moderate redundancy " * 30)
    assert(ratio(s, 9) <= ratio(s, 1),
      "level 9 must compress at least as hard as level 1")
    intercept[IllegalArgumentException] {
      DeflateRatio(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(col("t")), 0)
    }
  }
}
