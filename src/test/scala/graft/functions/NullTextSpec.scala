package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Totality under null text — a 100 TB crawl always contains nulls, and
  * an operator that emits NULL aggregates (instead of empty-text
  * behavior) silently loses rows in downstream filters. Contract: null
  * text behaves exactly like "".
  */
class NullTextSpec extends SparkSpec {
  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "hello world hello"), Row(2L, null), Row(3L, "")), 1), schema)
  }

  test("tokens/tokenCount: null → empty array / 0") {
    val r = df.select(col("id"), TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r == Map(1L -> 3, 2L -> 0, 3L -> 0))
  }

  test("c4Gate: null doc gates like an empty doc") {
    val r = Corpus.c4Gate(df, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(r(2L) == (("", 0L, false)))
    assert(r(3L) == (("", 0L, false)))
  }

  test("packOffsets/packSpans: null doc counts 0 tokens, contributes no span") {
    val o = Corpus.packOffsets(df, "id", "text", 8L, 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o == Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
    val s = Corpus.packSpans(df, "id", "text", 8L, 2L)
      .collect().map(_.getLong(0)).toSet
    assert(s == Set(1L))
  }

  test("dedupWithinDoc / removeFrequentUnits: null doc → empty clean_text, doc set preserved") {
    val d = Corpus.dedupWithinDoc(df, "id", TextFunctions.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d.keySet == Set(1L, 2L, 3L) && d(2L) == "")
    val f = Corpus.removeFrequentUnits(df, "id", TextFunctions.tokens(col("text")), 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f.keySet == Set(1L, 2L, 3L) && f(2L) == "")
  }

  test("bpePairCounts: null docs contribute nothing, corpus still counts") {
    val b = Corpus.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b("he") == 2L && b("lo") == 2L && b("wo") == 1L)
  }
}
