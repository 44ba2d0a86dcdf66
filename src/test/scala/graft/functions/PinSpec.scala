package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PinSpec extends SparkSpec {
  import spark.implicits._

  test("pin is a semantic no-op: same schema, rows, nulls; plan gains a Generate") {
    val df = Seq((1L, "a", Some(2.5)), (2L, "b", None), (3L, null, Some(0.0)))
      .toDF("id", "s", "v")
      .withColumn("derived", concat(coalesce(col("s"), lit("?")), col("id")))
    val pinned = Pin.pin(df)
    assert(pinned.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(pinned.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    assert(pinned.queryExecution.optimizedPlan.toString.contains("Generate"))
    // downstream filters and projections read attributes, not re-inlined
    // expression trees: the derived column appears ONCE in the plan
    val consumer = pinned.where(col("derived").isNotNull)
      .select(col("derived"), length(col("derived")).as("n"))
    assert(consumer.count() == 3L)
  }

  test("pin handles backtick-worthy column names") {
    val df = Seq((1L, "x")).toDF("id", "odd.name`col")
    assert(Pin.pin(df).collect().head.getString(1) == "x")
  }
}
