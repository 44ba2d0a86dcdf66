package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("partitioned parquet round-trips with partition pruning") {
    val d = Files.createTempDirectory("graft-sink").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Sinks.parquet(li, s"$d/li", partitionBy = Seq("l_returnflag"))
    val back = spark.read.parquet(s"$d/li").where(col("l_returnflag") === "R")
    assert(back.count() == li.where(col("l_returnflag") === "R").count())
    // pruning: the filter lands in PartitionFilters (directory-level skip)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("= R"))
  }

  test("jsonl sink round-trips") {
    val d = Files.createTempDirectory("graft-sink").toString
    val n = spark.read.parquet(s"${sf()}/nation.parquet")
    Sinks.jsonl(n, s"$d/nation")
    assert(spark.read.json(s"$d/nation").count() == 25)
  }

  test("bucketed tables join with NO exchange on either side") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
      .select("c_custkey", "c_name")
    Sinks.bucketedTable(orders, "orders_b", Seq("o_custkey"), 4, Seq("o_custkey"))
    Sinks.bucketedTable(cust, "cust_b", Seq("c_custkey"), 4, Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_b")
        .join(spark.table("cust_b"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(j.count() == orders.join(cust,
        orders("o_custkey") === cust("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("foreachPartition sink executes once per row, executor-side") {
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("rows")
    val r = spark.read.parquet(s"${sf()}/region.parquet")
    Sinks.foreachPartitionSink(r)(it => it.foreach(_ => acc.add(1)))
    assert(acc.value == 5L)
  }
}
