package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinRuleSpec extends SparkSpec {

  private def withBinWidth[A](bw: Option[Long])(body: => A): A = {
    graft.GraftSession.registerOptimizations(spark)
    val key = RangeJoinRewrite.BinWidthKey
    val prev = spark.conf.getOption(key)
    bw match {
      case Some(w) => spark.conf.set(key, w.toString)
      case None => spark.conf.unset(key)
    }
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private lazy val points = spark.range(0, 500)
    .select(col("id").as("pid"), (col("id") * 7 % 1000).as("p"))
  private lazy val intervals = spark.range(0, 60)
    .select(col("id").as("iid"), (col("id") * 17 % 950).as("s"))
    .withColumn("e", col("s") + col("iid") % 80)

  private def rangeJoin: DataFrame =
    points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))

  test("without the conf, a pure BETWEEN join stays a nested loop") {
    withBinWidth(None) {
      assert(rangeJoin.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }

  test("with binWidth set, the rule rewrites to an equi-join with same results") {
    val expected = withBinWidth(None)(rangeJoin.collect().toSet)
    withBinWidth(Some(32L)) {
      val out = rangeJoin
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$p")
      assert(!p.contains("CartesianProduct"))
      assert(out.columns.toSeq == Seq("pid", "p", "iid", "s", "e"))
      assert(out.collect().toSet == expected)
    }
  }

  test("rewrite fires with the point side on the right, and flipped operators") {
    withBinWidth(Some(16L)) {
      val out = intervals.join(points,
        col("s") <= col("p") && col("e") >= col("p"))
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$p")
      val expected = withBinWidth(None) {
        intervals.join(points, col("s") <= col("p") && col("e") >= col("p"))
          .collect().toSet
      }
      assert(out.collect().toSet == expected)
    }
  }

  test("reversed and null intervals match nothing, without errors") {
    withBinWidth(Some(8L)) {
      val weird = spark.range(0, 3).select(col("id").as("iid"),
        when(col("id") === 0, 50L).when(col("id") === 1, lit(null)).otherwise(10L).as("s"),
        when(col("id") === 0, 40L).when(col("id") === 1, 90L).otherwise(lit(null)).as("e"))
      val out = points.join(weird, col("p") >= col("s") && col("p") <= col("e"))
      assert(out.count() == 0)
    }
  }

  test("joins with extra predicates or equi keys are left untouched") {
    withBinWidth(Some(8L)) {
      val out = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e") && col("pid") =!= col("iid"))
      // 3 conjuncts: not a pure range join; the rule must not fire (the
      // plan stays a nested loop — exactly what the user wrote)
      assert(out.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}
