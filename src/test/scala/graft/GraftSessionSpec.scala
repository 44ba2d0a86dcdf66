package graft

import org.apache.spark.sql.functions._

class GraftSessionSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftSession.registerFunctions(spark)
    GraftSession.registerTables(spark, sf())
    val row = spark.sql(
      """SELECT doc_id,
        |  simhash64(split(trim(text), '\\s+')) AS sh,
        |  ngram_minhash(split(trim(text), '\\s+'), 5, 16) AS sig,
        |  size(minhash_signature(split(trim(text), '\\s+'), 8)) AS msig_n,
        |  size(ngram_hashes(split(trim(text), '\\s+'), 5)) AS n_grams
        |FROM documents ORDER BY doc_id LIMIT 1""".stripMargin).collect().head
    assert(row.getSeq[Long](2).length == 16)
    assert(row.getInt(3) == 8)  // minhash_signature(…, 8)
    assert(row.getInt(4) > 0)   // n_grams
  }

  test("lsh_bucket usable in SQL over embeddings") {
    GraftSession.registerFunctions(spark)
    GraftSession.registerTables(spark, sf())
    val n = spark.sql(
      "SELECT lsh_bucket(embedding, 8) AS b FROM embeddings")
      .select(countDistinct(col("b"))).collect().head.getLong(0)
    assert(n > 1)
  }

  test("GraftExtensions injects functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // would throw on malformed injections
  }

  test("readTable(events) scopes nanosAsLong to the read, not the session") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = GraftSession.readTable(spark, sf(), "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
    // the shared session conf must NOT have been mutated as a side effect
    assert(spark.conf.getOption(key) == before)
  }

  test("sql passthrough returns chainable GraftFrame") {
    GraftSession.registerTables(spark, sf())
    val f = GraftSession.sql(spark,
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1")
    assert(f.filterExpr(col("cnt") > 0).df.count() > 0)
  }
}
