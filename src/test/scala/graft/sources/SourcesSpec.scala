package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.api.ColType

/** Source/parser coverage mirroring the reference's dsv + jsonl parsers
  * (reference datasource/parser/dsv/dsv_parser.go:11-69,
  * jsonl/jsonl_parser.go:11-66): declared schemas, nil-value sentinel,
  * comments, nested access.
  */
class SourcesSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-src")
    val f = d.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("csv: declared schema, delimiter, comment, nil sentinel") {
    val p = tmpFile("data.csv",
      """# a comment line
        |1;alice;3.5
        |2;null;1.25
        |3;carol;null
        |""".stripMargin)
    val schema = Sources.schemaOf(
      "id" -> ColType.Int32, "name" -> ColType.VarString, "score" -> ColType.Float64)
    val f = Sources.csv(spark, p, schema, delimiter = ";", nilValue = "null")
    val rows = f.collect(10)
    assert(rows.length == 3)
    assert(rows.exists(r => r.getInt("id") == 2 && r.isNil("name")))
    assert(rows.exists(r => r.getInt("id") == 3 && r.isNil("score")))
  }

  // reference TimeColumnType{Format} (column_type.go:210-222): declared
  // per-column time patterns must round-trip, not just the default one.
  test("csvTyped: ColType.Time formats honored, mixed per-column") {
    val p = tmpFile("times.csv",
      """1,31/12/2024 23:59,2024-12-31T23:59:58
        |2,01/01/2025 00:01,2025-01-01T00:00:02
        |""".stripMargin)
    val f = Sources.csvTyped(spark, p, Seq(
      "id" -> ColType.Int32,
      "eu" -> ColType.Time("dd/MM/yyyy HH:mm"),
      "iso" -> ColType.Time("yyyy-MM-dd'T'HH:mm:ss")))
    assert(f.schema("eu").dataType == org.apache.spark.sql.types.TimestampType)
    assert(f.schema("iso").dataType == org.apache.spark.sql.types.TimestampType)
    val byId = f.collect(10).map(r => r.getInt("id") ->
      (r.getTime("eu").toInstant.toString, r.getTime("iso").toInstant.toString)).toMap
    assert(byId(1) == ("2024-12-31T23:59:00Z", "2024-12-31T23:59:58Z"))
    assert(byId(2) == ("2025-01-01T00:01:00Z", "2025-01-01T00:00:02Z"))
  }

  test("jsonl: nested fields via struct schema (gjson-path analogue)") {
    val p = tmpFile("data.jsonl",
      """{"id": 1234, "meta": {"uuid": "27366d2d", "name": "John Smith"}}
        |{"id": 5678, "meta": {"uuid": "deadbeef", "name": "Jane Doe"}}
        |""".stripMargin)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("meta", StructType(Seq(
        StructField("uuid", StringType), StructField("name", StringType))))))
    val f = Sources.jsonl(spark, p, schema)
    val out = f.df.selectExpr("id", "meta.uuid AS uuid", "meta.name AS name")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1234, "27366d2d", "John Smith"), (5678, "deadbeef", "Jane Doe")))
  }

  test("jsonl: missing path yields nil (PERMISSIVE)") {
    val p = tmpFile("data.jsonl",
      """{"id": 1}
        |{"id": 2, "extra": "x"}
        |""".stripMargin)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("extra", StringType)))
    val rows = Sources.jsonl(spark, p, schema).collect(10)
    assert(rows.length == 2)
    assert(rows.count(_.isNil("extra")) == 1)
  }

  test("csv.gz: compressed files decode transparently (Decoder-hook analogue)") {
    val d = Files.createTempDirectory("graft-gz")
    val f = d.resolve("data.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write("1,x\n2,y\n".getBytes("UTF-8")); out.close()
    val schema = Sources.schemaOf("id" -> ColType.Int32, "v" -> ColType.VarString)
    val rows = Sources.csv(spark, f.toString, schema).collect(10)
    assert(rows.map(r => (r.getInt("id"), r.getString("v"))).toSet == Set((1, "x"), (2, "y")))
  }

  test("parquet: pushdown-friendly declared read") {
    val f = Sources.parquet(spark, s"${sf()}/lineitem.parquet")
    assert(f.df.count() == 6000)
  }

  test("memory source round-trips rows") {
    import org.apache.spark.sql.Row
    val schema = Sources.schemaOf("k" -> ColType.VarString, "v" -> ColType.Int64)
    val f = Sources.memory(spark, Seq(Row("a", 1L), Row("b", 2L)), schema)
    assert(f.collect(10).map(_.getString("k")).toSet == Set("a", "b"))
  }

  test("orc: round-trip with predicate pushdown reaching the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Sources.parquet(spark, s"${sf()}/lineitem.parquet")
      .df.write.mode("overwrite").orc(dir)
    val f = Sources.orc(spark, dir)
    assert(f.df.count() == 6000)
    val filtered = f.df.where(org.apache.spark.sql.functions.col("l_quantity") > 25)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.linesIterator.take(6).mkString("\n"))
    assert(!plan.contains("PushedFilters: []"))
    assert(filtered.count() ==
      Sources.parquet(spark, s"${sf()}/lineitem.parquet")
        .df.where(org.apache.spark.sql.functions.col("l_quantity") > 25).count())
  }

  test("binaryFiles: content/length exact, glob filters, size guard drops oversize") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-blobs")
    val a = Array[Byte](1, 2, 3, 4, 5)
    val b = Array.fill[Byte](64)(7)
    java.nio.file.Files.write(dir.resolve("x.png"), a)
    java.nio.file.Files.write(dir.resolve("y.png"), b)
    java.nio.file.Files.write(dir.resolve("z.txt"), Array[Byte](9))
    val rows = Sources.binaryFiles(spark, dir.toString, "*.png").df
      .select(col("path"), col("length"), col("content")).collect()
      .map(r => r.getString(0).split('/').last ->
        ((r.getLong(1), r.getAs[Array[Byte]](2).toSeq))).toMap
    assert(rows.keySet == Set("x.png", "y.png")) // txt globbed out
    assert(rows("x.png") == ((5L, a.toSeq)))
    assert(rows("y.png") == ((64L, b.toSeq)))
    // the size guard keeps the small blob, drops the big one
    assert(Sources.binaryFiles(spark, dir.toString, "*.png", maxBytes = 32L)
      .df.count() == 1L)
  }

  test("warc: Content-Length framing survives an embedded decoy marker; strict vs salvage") {
    val crlf = "\r\n"
    def rec(typ: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val h = s"WARC/1.0${crlf}WARC-Type: $typ$crlf" +
        (if (uri != null) s"WARC-Target-URI: $uri$crlf" else "") +
        s"WARC-Date: 2026-08-16T00:00:00Z$crlf" +
        s"content-length: ${payload.length}$crlf$crlf" // case-insensitive
      h.getBytes("ISO-8859-1") ++ payload ++ (crlf + crlf).getBytes("ISO-8859-1")
    }
    // an HTML payload legally containing the record marker — delimiter
    // scanning would split here; Content-Length framing must not
    val decoy =
      s"<html>body$crlf${crlf}WARC/1.0${crlf}fake: x</html>".getBytes("UTF-8")
    val utf8 = "ünïcödé ✓ payload".getBytes("UTF-8")
    val bytes = rec("warcinfo", null, "software: graft".getBytes("UTF-8")) ++
      rec("response", "http://ex.com/a", decoy) ++
      rec("response", "http://ex.com/b", utf8)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    java.nio.file.Files.write(dir.resolve("t.warc"), bytes)
    val rows = Sources.warc(spark, dir.toString).df
      .orderBy("record_idx").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(2) == "warcinfo" && rows(0).getString(3) == null)
    assert(rows(1).getString(3) == "http://ex.com/a" &&
      rows(1).getLong(6) == decoy.length.toLong)
    assert(java.util.Arrays.equals(
      rows(1).getAs[Array[Byte]]("payload"), decoy))
    assert(java.util.Arrays.equals(
      rows(2).getAs[Array[Byte]]("payload"), utf8))
    // truncated mid-payload: strict fails loudly with file+offset,
    // salvage keeps the intact prefix and drops the broken tail
    val truncated = bytes.dropRight(utf8.length)
    val e = intercept[IllegalArgumentException] {
      Sources.parseWarcRecords("f.warc", truncated, strict = true).toList
    }
    assert(e.getMessage.contains("overruns") && e.getMessage.contains("f.warc"))
    assert(Sources.parseWarcRecords("f.warc", truncated, strict = false)
      .toList.map(_._3) == List("warcinfo", "response"))
    // oversized archive: strict REFUSES loudly (a silent whole-archive
    // drop at the ~1 GB production size would be realistic data loss);
    // salvage drops the file whole, same posture as a broken tail
    val cap = bytes.length.toLong - 1
    val big = intercept[Exception] {
      Sources.warc(spark, dir.toString, maxBytes = cap).df.collect()
    }
    assert(big.getMessage.contains("exceeds maxBytes") &&
      big.getMessage.contains("t.warc"))
    assert(Sources.warc(spark, dir.toString, maxBytes = cap,
      strict = false).df.count() == 0L)
  }
}
