package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

@graft.Heavy // top-tier suite by measured wall time; excluded from `sbt smoke`
class FileSkipIndexSpec extends SparkSpec {

  // Multi-file fixture: documents range-partitioned into 8 parquet files,
  // so file pruning is actually observable (the sf fixture is one file).
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("fskip").toString
    spark.read.parquet(s"${sf()}/documents.parquet")
      .repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(d)
    d
  }
  private lazy val table = spark.read.parquet(dir)
  private lazy val index = FileSkipIndex.build(table, "doc_id")

  test("index has one row per file with sane ranges and bounded blooms") {
    val files = table.select(col("_metadata.file_path")).distinct().count()
    val rows = index.collect()
    assert(rows.length == files && files == 8L)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2)) // min <= max
      assert(r.getLong(3) > 0L)            // n_rows
      val bloom = r.getSeq[Long](4)
      assert(bloom.nonEmpty && bloom.size <= (1 << 14))
      assert(bloom == bloom.sorted && bloom.forall(p => p >= 0 && p < (1 << 14)))
    }
    // ranges cover the table's ids collectively
    val (lo, hi) = (rows.map(_.getLong(1)).min, rows.map(_.getLong(2)).max)
    val b = table.agg(min("doc_id"), max("doc_id")).head()
    assert(lo == b.getLong(0) && hi == b.getLong(1))
  }

  test("probe through the index ≡ plain filter; absent ids read nothing") {
    val ids = Seq(0L, 123L, 250L, 499L, 987654321L)
    val got = FileSkipIndex.probe(spark, index, table, "doc_id", ids)
      .select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val want = table.where(col("doc_id").isin(ids: _*))
      .select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq && want.nonEmpty)
    // an id far outside every range prunes every file
    assert(FileSkipIndex.candidateFiles(index, Seq(987654321L)).count() == 0L)
    val empty = FileSkipIndex.probe(spark, index, table, "doc_id", Seq(987654321L))
    assert(empty.count() == 0L && empty.schema == table.schema)
  }

  test("single-id probes touch fewer files than the table has (pruning is real)") {
    val counts = Seq(0L, 123L, 250L, 499L).map(id =>
      FileSkipIndex.candidateFiles(index, Seq(id)).count())
    // range partitioning puts each id in exactly one file's range; Bloom
    // false positives could only ADD files, never reach all 8
    assert(counts.forall(c => c >= 1L && c < 8L), counts.toString)
  }

  test("build params and format are stored; probe works from a persisted index") {
    val first = index.head()
    assert(first.getInt(5) == (1 << 14) && first.getInt(6) == 3 &&
      first.getString(7) == "parquet")
    // parquet round-trip: tomorrow's probe reads params from the artifact
    val ip = java.nio.file.Files.createTempDirectory("fskip-idx").toString
    index.write.mode("overwrite").parquet(ip)
    val persisted = spark.read.parquet(ip)
    val got = FileSkipIndex.probe(spark, persisted, table, "doc_id", Seq(123L))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(123L))
  }

  test("non-default params round-trip through the index (no free probe params)") {
    val idx = FileSkipIndex.build(table, "doc_id", bloomBits = 1 << 10, numProbes = 5)
    val r = idx.head()
    assert(r.getInt(5) == (1 << 10) && r.getInt(6) == 5)
    val got = FileSkipIndex.probe(spark, idx, table, "doc_id", Seq(0L, 250L))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(0L, 250L))
  }

  test("orc source: format is sniffed from the plan and used by probe") {
    val d = java.nio.file.Files.createTempDirectory("fskip-orc").toString
    table.write.mode("overwrite").orc(d)
    val orc = spark.read.orc(d)
    val idx = FileSkipIndex.build(orc, "doc_id")
    assert(idx.head().getString(7) == "orc")
    val got = FileSkipIndex.probe(spark, idx, orc, "doc_id", Seq(42L))
      .select("doc_id", "lang").collect()
    assert(got.length == 1 && got(0).getLong(0) == 42L)
  }

  test("an index mixing rows from two different builds is refused") {
    val mixed = index.union(
      FileSkipIndex.build(table, "doc_id", bloomBits = 1 << 10))
    val e = intercept[IllegalArgumentException] {
      FileSkipIndex.candidateFiles(mixed, Seq(1L)).collect()
    }
    assert(e.getMessage.contains("different builds"))
    val e2 = intercept[IllegalArgumentException] {
      FileSkipIndex.probe(spark, index.drop("fmt"), table, "doc_id", Seq(1L))
    }
    assert(e2.getMessage.contains("missing column"))
  }

  test("no false negatives: every (file, id) pair passes its own candidate check") {
    val sample = table.select(col("_metadata.file_path").as("f"), col("doc_id"))
      .where(pmod(col("doc_id"), lit(11)) === 0)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sample.nonEmpty)
    sample.foreach { case (f, id) =>
      val cand = FileSkipIndex.candidateFiles(index, Seq(id))
        .collect().map(_.getString(0)).toSet
      assert(cand.contains(f), s"file $f must be a candidate for id $id")
    }
  }
}
