package graft.api

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sources.Sources

/** Nil-cell semantics mirroring the reference's per-row nil flags
  * (reference internal/partition/row.go:76-119): typed reads of nil cells,
  * setNil, nil propagation through closures and reduce.
  */
class NullSemanticsSpec extends SparkSpec {

  private val schema = Sources.schemaOf(
    "k" -> ColType.VarString, "v" -> ColType.Int64)

  test("isNil / setNil round-trip through map") {
    val f = Sources.memory(spark,
      Seq(Row("a", 1L), Row("b", null), Row("c", 3L)), schema)
    val out = f.map { r =>
      if (!r.isNil("v") && r.getLong("v") == 3L) r.setNil("v") else r
    }.collect(10)
    assert(out.count(_.isNil("v")) == 2)
    assert(out.find(_.getString("k") == "a").exists(!_.isNil("v")))
  }

  test("nil cells skipped by adder, counted by counter") {
    val f = Sources.memory(spark,
      Seq(Row("a", 10L), Row("b", null), Row("c", 5L)), schema)
    val (cnt, total) = f.accumulate(
      Accumulators.compose(Accumulators.counter, Accumulators.adder("v")))
    assert(cnt == 3L)      // counter counts rows, nil or not
    assert(total == 15.0)  // adder skips nil (reference sum.go semantics)
  }

  test("reduce with nil-keyed handling: empty-byte keys merge together") {
    val f = Sources.memory(spark,
      Seq(Row("a", 1L), Row(null, 2L), Row(null, 3L)), schema)
    val out = f.reduce(
      r => if (r.isNil("k")) Array.empty[Byte] else r.getString("k").getBytes("UTF-8"),
      (l, r) => l.set("v", l.getLong("v") + r.getLong("v")))
      .collect(10)
    assert(out.length == 2)
    assert(out.exists(r => r.isNil("k") && r.getLong("v") == 5L))
  }
}
