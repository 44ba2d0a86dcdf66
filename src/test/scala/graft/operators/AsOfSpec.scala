package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("as-of join: latest right row at-or-before each left ts, else null") {
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("price", DoubleType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 5L, 1L),   // after r@3 → 30.0
      Row("a", 3L, 2L),   // exactly r@3 (inclusive) → 30.0
      Row("a", 2L, 3L),   // after r@1 → 10.0
      Row("a", 0L, 4L),   // before all → null
      Row("b", 9L, 5L),   // b has no right rows → null
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 10.0), Row("a", 3L, 30.0), Row("a", 7L, 70.0),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("price"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out == Map(1L -> 30.0, 2L -> 30.0, 3L -> 10.0, 4L -> null, 5L -> null))
  }

  // int64 epoch-nanos beyond 2^53: adjacent nanos are indistinguishable
  // after a double cast, so ordering must happen in the native long.
  test("as-of ordering is exact for int64 timestamps beyond 2^53") {
    val base = 1700000000000000000L // epoch nanos, ≫ 2^53
    val lSchema = StructType(Seq(
      StructField("k", StringType), StructField("lts", LongType),
      StructField("lid", LongType)))
    val rSchema = StructType(Seq(
      StructField("k", StringType), StructField("rts", LongType),
      StructField("v", LongType)))
    val left = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", base, 1L),      // exactly r@base → 100
      Row("a", base + 1L, 2L), // exactly r@base+1 → 101 (collapses under double)
      Row("a", base + 2L, 3L), // after both → 101
    )), lSchema)
    val right = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", base, 100L), Row("a", base + 1L, 101L),
    )), rSchema)
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("v"))
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 100L, 2L -> 101L, 3L -> 101L))
  }
}
