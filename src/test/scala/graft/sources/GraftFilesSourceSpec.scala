package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftFilesSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-files-src").toString
    Files.write(Paths.get(d, "a.txt"), "alpha doc".getBytes("UTF-8"))
    Files.write(Paths.get(d, "b.txt"), "bravo doc".getBytes("UTF-8"))
    val gz = new GZIPOutputStream(new FileOutputStream(s"$d/c.jsonl.gz"))
    gz.write("""{"k":1}""".getBytes("UTF-8")); gz.close()
    d
  }

  private def read() = spark.read.format("graft-files").load(s"$dir/*")

  test("reads one row per file; gz files decode via the codec hook") {
    val rows = read().select(col("path"), col("content").cast("string").as("c"))
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(rows.keySet == Set("a.txt", "b.txt", "c.jsonl.gz"))
    assert(rows("a.txt") == "alpha doc")
    assert(rows("c.jsonl.gz") == """{"k":1}""") // auto codec: .gz decoded
  }

  test("codec=none returns raw bytes") {
    val raw = spark.read.format("graft-files").option("codec", "none")
      .load(s"$dir/*.gz")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // gzip magic, not the decoded json
    assert((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
  }

  test("path filters push into the scan and skip files at planning time") {
    val df = read().where(col("path").endsWith(".txt"))
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("nFiles=2"),
      s"expected 2 surviving files in scan description:\n$scanDesc")
    assert(scanDesc.contains("StringEndsWith"), s"filter not pushed:\n$scanDesc")
    assert(df.count() == 2)
  }

  test("1 file = 1 input partition (reference PartitionLoader semantics)") {
    assert(read().rdd.getNumPartitions == 3)
    assert(read().where(col("path").endsWith(".txt")).rdd.getNumPartitions == 2)
  }

  test("metadata-only scans prune content out of the read schema") {
    val df = read().select(col("path"), col("length"))
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadColumns=[path,length]"),
      s"content not pruned:\n$scanDesc")
    val lens = df.collect().map(r => (r.getString(0).split('/').last, r.getLong(1))).toMap
    assert(lens("a.txt") == 9L)
  }

  test("equality and prefix filters also prune the listing") {
    val one = read().where(col("path") === s"file:$dir/a.txt")
    assert(one.count() == 1)
    assert(one.queryExecution.executedPlan.toString.contains("nFiles=1"))
  }
  // VERDICT r5 item 4: 1 file = 1 task floods the scheduler at millions
  // of small files; size-binned packing bounds tasks without changing rows.
  test("maxFilesPerPartition packs small files; rows and decode unchanged") {
    val d = Files.createTempDirectory("graft-files-pack").toString
    (0 until 100).foreach { i =>
      Files.write(Paths.get(d, f"f$i%03d.txt"), s"doc $i".getBytes("UTF-8"))
    }
    val gz = new GZIPOutputStream(new FileOutputStream(s"$d/z.jsonl.gz"))
    gz.write("""{"k":9}""".getBytes("UTF-8")); gz.close()
    val packed = spark.read.format("graft-files")
      .option("maxFilesPerPartition", "10").load(s"$d/f*.txt")
    assert(packed.rdd.getNumPartitions == 10)
    val rows = packed.select(col("path"), col("content").cast("string").as("c"))
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(rows.size == 100 && rows("f042.txt") == "doc 42")
    // decode path still runs inside a pack
    val all = spark.read.format("graft-files")
      .option("maxFilesPerPartition", "101").load(s"$d/*")
    assert(all.rdd.getNumPartitions == 1)
    val z = all.where(col("path").endsWith(".gz"))
      .select(col("content").cast("string")).head.getString(0)
    assert(z == """{"k":9}""")
    // byte bound closes packs early: 6-byte files, 13-byte bound → 2/pack
    val byBytes = spark.read.format("graft-files")
      .option("maxFilesPerPartition", "100")
      .option("maxBytesPerPartition", "13").load(s"$d/f*.txt")
    assert(byBytes.rdd.getNumPartitions == 50)
    assert(byBytes.count() == 100)
  }

  test("maxFileSize guards the DECOMPRESSED size with a clear error") {
    // a.txt is 9 bytes — a 4-byte bound must fail loud, not truncate
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-files").option("maxFileSize", "4")
        .load(s"$dir/a.txt").select(col("content")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxFileSize")), msgs(e).mkString(" | "))
    // the gz file holds under the bound applied to its decoded size
    val ok = spark.read.format("graft-files").option("maxFileSize", "1024")
      .load(s"$dir/c.jsonl.gz").select(col("content").cast("string")).head.getString(0)
    assert(ok == """{"k":1}""")
    // metadata-only scans never open the file, so the bound is moot there
    val n = spark.read.format("graft-files").option("maxFileSize", "1")
      .load(s"$dir/*").select(col("path")).count()
    assert(n == 3)
  }
}
