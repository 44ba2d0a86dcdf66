package graft.api

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sources.Sources

/** A genuinely opaque user type — a plain class with no Spark Encoder,
  * the analogue of the reference's VarHeatmapColumnType
  * (docs/custom-columntypes.md:1-40, examples nyc_taxi_test.go:58-92):
  * the engine sees bytes; the user codec sees structure.
  */
final class Heatmap(val cells: Array[Int]) extends Serializable {
  def merge(o: Heatmap): Heatmap =
    new Heatmap(cells.zip(o.cells).map { case (a, b) => a + b })
}

class OpaqueTypeSpec extends SparkSpec {

  // reference custom-columntypes contract: an opaque value survives
  // map → shuffle (reduce) → collect via user Serialize/Deserialize.
  test("opaque custom column: kryo round-trip through map/reduce/collect") {
    val schema = Sources.schemaOf(
      "key" -> ColType.VarString, "hm" -> ColType.Opaque(classOf[Heatmap]))
    val rows = (0 until 8).map(i => Row(if (i % 2 == 0) "even" else "odd", null))
    val f = Sources.memory(spark, rows, schema)
      .to(Operation.map { r =>
        // each row contributes one hit in cell 0
        r.set("hm", OpaqueCodec.toBytes(new Heatmap(Array(1, 0, 0, 0))))
      })
      .reduce(
        r => r.getString("key").getBytes("UTF-8"),
        (l, rr) => {
          val merged = OpaqueCodec.fromBytes[Heatmap](l.getBytes("hm"))
            .merge(OpaqueCodec.fromBytes[Heatmap](rr.getBytes("hm")))
          l.set("hm", OpaqueCodec.toBytes(merged))
        })
    val out = f.collect(10).map(r => r.getString("key") ->
      OpaqueCodec.fromBytes[Heatmap](r.getBytes("hm")).cells(0)).toMap
    assert(out == Map("even" -> 4, "odd" -> 4))
  }

  test("OpaqueCodec round-trips nested/var-width values bit-for-bit") {
    val v = new Heatmap(Array.tabulate(257)(identity))
    val back = OpaqueCodec.fromBytes[Heatmap](OpaqueCodec.toBytes(v))
    assert(back.cells.toSeq == v.cells.toSeq)
  }
}
