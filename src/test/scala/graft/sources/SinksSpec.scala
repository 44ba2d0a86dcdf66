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

  test("partitioned orc round-trips with partition pruning") {
    val d = Files.createTempDirectory("graft-sink-orc").toString
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    Sinks.orc(li, s"$d/li", partitionBy = Seq("l_returnflag"))
    val back = graft.sources.Sources.orc(spark, s"$d/li").df
      .where(col("l_returnflag") === "R")
    assert(back.count() == li.where(col("l_returnflag") === "R").count())
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

  // Interleave-ordered write: files cover disjoint ascending position
  // ranges, so reading file-by-file streams the weighted mixture in
  // stride order — and the multiset of rows is exactly the input's.
  test("interleavedParquet: disjoint ascending position ranges per file") {
    val d = Files.createTempDirectory("graft-sink-il").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "lang")
    Sinks.interleavedParquet(docs, "lang", "doc_id",
      Map("en" -> 2.0, "zh" -> 0.5), s"$d/il", numFiles = 4)
    val files = new java.io.File(s"$d/il").listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("interleave_pos")), max(col("interleave_pos")), count(lit(1)))
        .head
      (r.getDouble(0), r.getDouble(1), r.getLong(2))
    }
    // within-file sorted ranges are ascending and disjoint across the
    // name-ordered files
    ranges.sliding(2).foreach {
      case Array((_, hi, _), (lo, _, _)) => assert(hi <= lo, ranges.mkString(","))
      case _ => ()
    }
    assert(ranges.map(_._3).sum == docs.count())
    // row multiset preserved
    val back = spark.read.parquet(s"$d/il").select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val want = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(back == want)
  }

  test("foreachPartition sink executes once per row, executor-side") {
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("rows")
    val r = spark.read.parquet(s"${sf()}/region.parquet")
    Sinks.foreachPartitionSink(r)(it => it.foreach(_ => acc.add(1)))
    assert(acc.value == 5L)
  }
}
