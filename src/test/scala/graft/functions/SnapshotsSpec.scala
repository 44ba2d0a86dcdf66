package graft.functions

import graft.SparkSpec

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def withRequireReliable[T](body: => T): T =
    try {
      spark.conf.set(Snapshots.RequireReliableKey, "true")
      body
    } finally spark.conf.unset(Snapshots.RequireReliableKey)

  test("snapshot fail-louds when reliability is demanded but no dir is set") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty) // test harness has none
    val df = Seq(1L, 2L).toDF("x")
    // default: silent localCheckpoint fallback, result intact
    assert(Snapshots.snapshot(df).count() == 2L)
    withRequireReliable {
      val e = intercept[IllegalStateException](Snapshots.snapshot(df))
      assert(e.getMessage.contains(Snapshots.RequireReliableKey))
      assert(e.getMessage.contains("setCheckpointDir"))
    }
  }

  test("a snapshotting operator surfaces the contract, not a silent fallback") {
    val df = Seq((0.1, true), (0.2, false), (0.3, true)).toDF("s", "y")
    withRequireReliable {
      intercept[IllegalStateException](
        Stats.aucPieces(df, "s", "y").collect())
    }
    // and runs normally once the demand is withdrawn
    assert(Stats.aucPieces(df, "s", "y").count() == 1L)
  }

  test("boundedLocal is exempt by design (bounded, never corpus-sized state)") {
    val df = Seq("a", "b", "a").toDF("w")
    withRequireReliable {
      assert(Snapshots.boundedLocal(df.groupBy("w").count()).count() == 2L)
    }
  }
}
