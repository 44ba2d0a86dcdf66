package graft
import org.apache.spark.sql.functions._
object Exp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).config("spark.ui.enabled","false").getOrCreate()
    GraftSession.registerFunctions(spark); GraftSession.registerOptimizations(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val dir = "/root/testdata/sf0.1"
    def t(n: String) = GraftSession.readTable(spark, dir, n)
    def edges = t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    // warmup
    (1 to 2).foreach(_ => SparkEntry.queries("t7_reduce")(spark, dir).write.format("noop").mode("overwrite").save())
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[exp] $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("edges materialize (setup cost floor)") {
      edges.write.format("noop").mode("overwrite").save()
    }
    (1 to 2).foreach { i =>
      time(s"pageRank interval=3 run$i") {
        graft.functions.Graph.pageRank(edges, iterations = 5, checkpointInterval = 3)
          .select(col("id"), round(col("rank"), 9).as("rank")).orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"pageRank interval=5 run$i") {
        graft.functions.Graph.pageRank(edges, iterations = 5, checkpointInterval = 5)
          .select(col("id"), round(col("rank"), 9).as("rank")).orderBy("id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
