package graft.tools

/** Throwaway experiment harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = graft.GraftSession.readTable(spark, dir, t)
      val raw = spark.read.parquet(s"$dir/$t.parquet")
      println(f"[scratch] $t%-12s rawParts=${raw.rdd.getNumPartitions}%3d " +
        f"stats=${raw.queryExecution.optimizedPlan.stats.sizeInBytes} " +
        f"finalParts=${df.rdd.getNumPartitions}%3d")
    }
    spark.stop()
  }
}
