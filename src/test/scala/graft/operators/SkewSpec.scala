package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin produces exactly the plain join's result") {
    val fact = graft.GraftSession.readTable(spark, sf(), "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_name"))
    val plain = fact.join(dim, "user_id")
      .select("event_id", "user_id", "c_name")
    val salted = Skew.saltedJoin(fact, dim, "user_id", col("event_id"), 8)
      .select("event_id", "user_id", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("hotKeys surfaces the heaviest keys") {
    val ev = graft.GraftSession.readTable(spark, sf(), "events")
    val hot = Skew.hotKeys(ev, "user_id", 3).collect()
    assert(hot.length == 3)
    assert(hot.head.getLong(1) >= hot.last.getLong(1))
  }
}
