package graft.tools

/** Throwaway experiment harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val fArr = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
    val expr = graft.plans.DotProductExactF(
      org.apache.spark.sql.catalyst.expressions.Literal.create(null, fArr),
      org.apache.spark.sql.catalyst.expressions.Literal.create(null, fArr))
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(64)(rnd.nextFloat() - 0.5f))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array.fill(64)(rnd.nextFloat() - 0.5f))
    var i = 0; var acc = 0.0
    while (i < 20000) { acc += expr.kernel(a, b); i += 1 }
    var t0 = System.nanoTime(); i = 0
    while (i < 200000) { acc += expr.kernel(a, b); i += 1 }
    println(f"[kernel] fast exact dot: ${(System.nanoTime() - t0) / 200000.0}%8.0f ns/call (sink $acc%.2f)")
    i = 0
    while (i < 20000) { acc += expr.kernelSlow(a, b); i += 1 }
    t0 = System.nanoTime(); i = 0
    while (i < 200000) { acc += expr.kernelSlow(a, b); i += 1 }
    println(f"[kernel] slow exact dot: ${(System.nanoTime() - t0) / 200000.0}%8.0f ns/call (sink $acc%.2f)")
  }
}
