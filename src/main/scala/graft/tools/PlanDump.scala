package graft.tools

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the before/after plan evidence an optimization round commits next to
  * its bench numbers (`plans/r<N>/<query>_{before,after}.txt`).
  *
  * Usage: PlanDump <outDir> <suffix> <query>[,query...]
  * (SPARK_GRAFT_SF_DIR picks the scale dir, default sf0.1 so plan
  * shapes match the bench; SPARK_GRAFT_CPUS the master width.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, qcsv) = args.take(3)
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.registerFunctions(spark)
    graft.GraftSession.registerOptimizations(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt")
      java.nio.file.Files.write(p,
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
