package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private lazy val points = {
    val schema = StructType(Seq(
      StructField("pid", LongType), StructField("p", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 200L).map(i => Row(i, i * 7 % 500))),
      schema)
  }

  private lazy val intervals = {
    val schema = StructType(Seq(
      StructField("iid", LongType), StructField("s", LongType),
      StructField("e", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 40L).map(i => Row(i, i * 13 % 480, i * 13 % 480 + i % 60)) :+
          Row(100L, 50L, 40L)), // reversed interval: matches nothing
      schema)
  }

  test("pointInInterval equals the naive cross-filter join") {
    val naive = points.crossJoin(intervals)
      .where(col("p").between(col("s"), col("e")))
      .select("pid", "p", "iid")
    for (bw <- Seq(1L, 16L, 1000L)) {
      val binned = RangeJoin.pointInInterval(
        points, intervals, "p", "s", "e", Seq("iid"), bw)
      assert(binned.columns.toSeq == Seq("pid", "p", "iid"))
      assert(naive.exceptAll(binned).isEmpty && binned.exceptAll(naive).isEmpty,
        s"binWidth=$bw")
    }
  }

  test("intervalOverlap equals the naive overlap join, each pair once") {
    val l = intervals.select(col("iid").as("lid"), col("s").as("ls"), col("e").as("le"))
    // empty (reversed) intervals overlap nothing, on either side
    val naive = l.crossJoin(intervals)
      .where(col("ls") <= col("le") && col("s") <= col("e"))
      .where(col("ls") <= col("e") && col("s") <= col("le"))
      .select("lid", "iid")
    for (bw <- Seq(7L, 64L)) {
      val binned = RangeJoin.intervalOverlap(
        l, intervals, "ls", "le", "s", "e", Seq("iid"), bw)
        .select("lid", "iid")
      assert(naive.exceptAll(binned).isEmpty && binned.exceptAll(naive).isEmpty,
        s"binWidth=$bw")
    }
  }

  test("boundary inclusivity: both interval ends match") {
    val p = spark.range(1).select(lit(1L).as("pid"), lit(10L).as("p"))
    val hitLo = spark.range(1).select(lit(1L).as("iid"), lit(10L).as("s"), lit(20L).as("e"))
    val hitHi = spark.range(1).select(lit(2L).as("iid"), lit(0L).as("s"), lit(10L).as("e"))
    val out = RangeJoin.pointInInterval(
      p, hitLo.union(hitHi), "p", "s", "e", Seq("iid"), 4L)
    assert(out.select("iid").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
