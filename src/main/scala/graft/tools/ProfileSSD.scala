package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch stage-timing for dedupSubstrings. Not part of the driver contract. */
object ProfileSSD {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.GraftSession.readTable(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warmup count")(df.count())

    val k = 20
    val id = col("doc_id")
    val txt = coalesce(col("text"), lit(""))
    val anchors = graft.plans.HashExpressions.md5PrefixAnchors(txt, k, 16)
    val a = df.select(id, explode(anchors).as("__s"), txt.as("__t"))
      .select(id, col("__s"),
        col("__t").substr(col("__s") + 1, lit(k)).as("__w"))
      .withColumn("__wh", xxhash64(col("__w")))
    time("a count #1")(println(a.count()))
    time("a count #2")(println(a.count()))

    val candidateHashes = a.groupBy(col("__wh")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2).select(col("__wh"))
    time("candidates count")(println(candidateHashes.count()))

    val frequent = a.join(candidateHashes, Seq("__wh"), "left_semi")
      .groupBy(col("__wh"), col("__w")).agg(count(lit(1)).as("__nx"))
      .where(col("__nx") >= 2).select(col("__wh"), col("__w"))
    time("frequent count")(println(frequent.count()))

    val dup = a.join(frequent, Seq("__wh", "__w"), "left_semi")
      .select(id, col("__s"))
    time("dup count")(println(dup.count()))

    val byDoc = Window.partitionBy(id).orderBy(col("__s"))
    val runs = dup
      .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(byDoc))
      .withColumn("__run",
        sum(when(col("__gap").isNull || col("__gap") > 100, 1)
          .otherwise(0)).over(byDoc))
    val spans = runs.groupBy(id, col("__run"))
      .agg(min(col("__s")).as("__s0"), (max(col("__s")) + k).as("__e0"),
        count(lit(1)).as("__na"))
    time("spans count")(println(spans.count()))

    val docStats = spans.groupBy(id)
      .agg(sort_array(collect_list(struct(col("__s0").as("s0"), col("__e0").as("e0")))).as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("__na")).as("n_dup_anchors"),
        sum(col("__e0") - col("__s0")).cast("long").as("dup_chars"))
    time("docStats count")(println(docStats.count()))

    val full = graft.functions.Corpus.dedupSubstringsPortable(
      df, "doc_id", "text", 20, "10", 100)
    time("full-nocut noop")(full.drop("clean_text")
      .write.format("noop").mode("overwrite").save())
    time("full noop #1")(full.write.format("noop").mode("overwrite").save())
    time("full noop #2")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
