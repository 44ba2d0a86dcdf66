package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) =
    spark.createDataFrame(pairs).toDF("src", "dst")

  test("pageRank matches the hand-computed fixpoint steps") {
    // 1 -> {2,3}, 2 -> 3, 3 -> 1
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val r2 = Graph.pageRank(e, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // iter1: r=(1.0, .575, 1.425); iter2 below
    assert(math.abs(r2(1L) - (0.15 + 0.85 * 1.425)) < 1e-12)
    assert(math.abs(r2(2L) - 0.575) < 1e-12)
    assert(math.abs(r2(3L) - (0.15 + 0.85 * (0.5 + 0.575))) < 1e-12)
  }

  test("sink nodes receive rank but leak their own mass") {
    val e = edges((1L, 2L))
    val r = Graph.pageRank(e, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.15) < 1e-12)          // no in-links
    assert(math.abs(r(2L) - (0.15 + 0.85 * 0.15)) < 1e-12)
  }

  test("parallel edges weight the link; zero iterations returns the prior") {
    val dup = edges((1L, 2L), (1L, 2L), (1L, 3L))
    val r = Graph.pageRank(dup, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // node 2 gets 2/3 of node 1's rank, node 3 gets 1/3
    assert(math.abs(r(2L) - (0.15 + 0.85 * (2.0 / 3.0))) < 1e-12)
    assert(math.abs(r(3L) - (0.15 + 0.85 * (1.0 / 3.0))) < 1e-12)
    val r0 = Graph.pageRank(dup, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r0.values.forall(_ == 1.0) && r0.size == 3)
  }
}
