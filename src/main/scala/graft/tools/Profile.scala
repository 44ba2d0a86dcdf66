package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Scratch stage-timing harness for the blocked self-kNN graph — times
  * each constituent stage of [[Similarity.knnGraph]] in isolation to
  * locate the dominant cost. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("local[32]")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup
    time("warmup count")(e.count())

    // exactly what Bench times: registered query + noop sink, uncached
    time("bench-shape x_knn_graph #1")(
      graft.SparkEntry.queries("x_knn_graph")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("bench-shape x_knn_graph #2")(
      graft.SparkEntry.queries("x_knn_graph")(spark, dir)
        .write.format("noop").mode("overwrite").save())

    time("knnGraph full")(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 16, kmeansIters = 1,
        margin = 40, saltBuckets = 2).count())

    time("knnGraph margin=15")(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 16, kmeansIters = 1,
        margin = 15, saltBuckets = 2).count())

    time("knnGraph salt=1")(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 16, kmeansIters = 1,
        margin = 40, saltBuckets = 1).count())

    time("knnGraph kmeansIters=0")(
      Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 16, kmeansIters = 0,
        margin = 40, saltBuckets = 2).count())

    {
      val g = graft.api.GraftFrame(
        Similarity.knnGraph(e, "vec_id", "embedding", k = 5,
          nCentroids = 16, nProbe = 16, kmeansIters = 1,
          margin = 40, saltBuckets = 2))
      val (_, stats) = g.runWithStats(_.count())
      stats.sortBy(-_.wallMs).take(10).foreach(st =>
        println(f"[stage] wall=${st.wallMs}%6d ms run=${st.runTimeMs}%7d ms in=${st.inputRows}%9d sr=${st.shuffleReadRows}%9d sw=${st.shuffleWriteRows}%9d  ${st.name.linesIterator.next().take(90)}"))
    }

    // driver microbench: ns per native exact-dot kernel call (64-dim)
    {
      val rnd = new scala.util.Random(7)
      val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.fill(64)(rnd.nextFloat() - 0.5f))
      val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array.fill(64)(rnd.nextFloat() - 0.5f))
      val expr = graft.plans.DotProductExactF(
        org.apache.spark.sql.catalyst.expressions.Literal.create(null,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(null,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
      var i = 0; var acc = 0.0
      while (i < 10000) { acc += expr.kernel(a, b); i += 1 } // warmup
      val t0 = System.nanoTime(); i = 0
      while (i < 100000) { acc += expr.kernel(a, b); i += 1 }
      println(f"[kernel] exact dot: ${(System.nanoTime() - t0) / 100000.0}%8.0f ns/call (sink $acc%.2f)")
    }

    // raw scored-pair generation only (the bucket join + native cosine)
    time("scored pairs only") {
      val (assignedC, cents) = Similarity.ivfAssign(
        e.select(col("vec_id"), col("embedding")), "vec_id", "embedding", 16, 1)
      val c = assignedC.select(col("vec_id").cast("long").as("__cid"),
        col("embedding").as("__cv"), col("ivf_bucket").as("__b"))
      val q = c.select(col("__cid").as("__qid"), col("__cv").as("__qv"),
        explode(sequence(lit(0), lit(15))).as("__b"))
      c.join(q, "__b")
        .select(Similarity.cosine(col("__cv"), col("__qv")).as("__s"))
        .agg(sum(col("__s"))).collect()
    }

    spark.stop()
  }
}
