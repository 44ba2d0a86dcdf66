package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sources.Sources

/** Property: byte-keyed closure reduce (the reference's model,
  * reduce.go:94-110) is equivalent to relational groupBy+sum for any
  * key/value multiset — sif-style keying loses nothing vs Catalyst.
  * (Raw ScalaCheck generators sampled with fixed seeds — the
  * scalatest/scalacheck bridge isn't on the offline classpath.)
  */
class ReducePropertySpec extends SparkSpec {

  private val rowsGen = Gen.listOfN(30,
    Gen.zip(Gen.oneOf("a", "b", "c", "d", "é", ""), Gen.chooseNum(-1000L, 1000L)))

  test("byte-key reduce == relational groupBy sum (5 sampled multisets)") {
    (1 to 5).foreach { i =>
      val data = rowsGen(Gen.Parameters.default, Seed(i.toLong)).get
      val schema = Sources.schemaOf("k" -> ColType.VarString, "v" -> ColType.Int64)
      val f = Sources.memory(spark, data.map { case (k, v) => Row(k, v) }, schema)
      val viaClosure = f.reduce(
        r => r.getString("k").getBytes("UTF-8"),
        (l, r) => l.set("v", l.getLong("v") + r.getLong("v")))
        .collect(1000).map(r => r.getString("k") -> r.getLong("v")).toMap
      val viaRelational = f.df.groupBy(col("k")).agg(sum(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaClosure == viaRelational, s"seed $i")
    }
  }
}
