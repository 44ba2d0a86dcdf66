package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: hamming-distance distribution of the x_simhash
  * planted pairs across fixture scales (picks maxHamming / eligibility).
  */
object ProbePlanted {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Dedup
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.GraftSession.readTable(spark, s"/root/testdata/$sf", "documents")
      val toks = split(trim(col("text")), "\\s+")
      val eligible = docs.where(col("doc_id") % 5 === 0 && size(toks) >= 40)
      val mutated = array_join(filter(toks, (_, i) => i =!= 16), " ")
      val hd = eligible.select(
        col("doc_id"), size(toks).as("ntok"),
        Dedup.hammingDist64(Dedup.simhash(col("text")), Dedup.simhash(mutated))
          .cast("long").as("h"))
      val rows = hd.groupBy("h")
        .agg(count(lit(1)).as("n"), min("ntok").as("minTok"), max("ntok").as("maxTok"))
        .orderBy("h").collect()
      println(s"== $sf: " + rows.mkString(" "))
    }
    spark.stop()
  }
}
