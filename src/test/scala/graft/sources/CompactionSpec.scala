package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("plan: hand-checked cumulative-quota packing, ties by name") {
    // sizes desc: 70, 40, 40(b tie), 25, 10, 5 — target 100
    val items = Seq(("a", 40L), ("big", 70L), ("b", 40L), ("m", 25L),
      ("s", 10L), ("t", 5L)).toDF("n", "sz")
    val got = Compaction.plan(items, "n", "sz", targetBytes = 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // order: big(0), a(70), b(110), m(150), s(175), t(185)
    assert(got == Map(
      "big" -> (70L, 0L, 0L), "a" -> (40L, 0L, 70L), "b" -> (40L, 1L, 110L),
      "m" -> (25L, 1L, 150L), "s" -> (10L, 1L, 175L), "t" -> (5L, 1L, 185L)))
    val summary = Compaction.planSummary(
        Compaction.plan(items, "n", "sz", 100L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary == Map(0L -> (2L, 110L), 1L -> (4L, 80L)))
  }

  test("plan invariants: oversized items isolate, totals preserved, bins contiguous") {
    val items = (1L to 200L).map(i => (s"f$i", (i * 37L) % 900L + 1L))
      .toDF("n", "sz")
    val target = 1000L
    val rows = Compaction.plan(items, "n", "sz", target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == items.agg(sum("sz")).head().getLong(0))
    // every bin starts before its quota boundary (exceeds by ≤ last item)
    rows.foreach { case (_, _, bin, start) =>
      assert(start >= bin * target && start < (bin + 1) * target)
    }
    // bins are contiguous in (size desc, name) order
    val ordered = rows.sortBy { case (n, sz, _, _) => (-sz, n) }.map(_._3)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b == a || b == a + 1 })
    // an item beyond target sits alone at its own bin start... spread over
    // the quota grid, nothing shares its bin range
    val big = Seq(("huge", 3500L), ("x", 10L), ("y", 10L)).toDF("n", "sz")
    val bg = Compaction.plan(big, "n", "sz", 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(bg("huge") == (0L, 0L) && bg("x") == (3L, 3500L) && bg("y") == (3L, 3510L))
  }

  test("planFiles: one row per real file, sizes from _metadata, plan covers all") {
    val d = java.nio.file.Files.createTempDirectory("compact").toString
    spark.read.parquet(s"${sf()}/documents.parquet")
      .repartitionByRange(6, col("doc_id"))
      .write.mode("overwrite").parquet(d)
    val table = spark.read.parquet(d)
    val nFiles = table.select(col("_metadata.file_path")).distinct().count()
    val planned = Compaction.planFiles(table, targetBytes = 64 * 1024L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(planned.length == nFiles && nFiles == 6L)
    assert(planned.forall(_._2 > 0L))
    assert(planned.map(_._3).min == 0L)
  }

  test("execute: one file per bin, rows preserved, uncovered files excluded") {
    val d = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    spark.read.parquet(s"${sf()}/documents.parquet")
      .repartitionByRange(6, col("doc_id"))
      .write.mode("overwrite").parquet(d)
    val table = spark.read.parquet(d)
    val planned = Compaction.planFiles(table, targetBytes = 64 * 1024L)
    val audit = Compaction.execute(table, planned, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rewritten = spark.read.parquet(out)
    // multiset preserved (bin is an added column; the payload matches)
    assert(rewritten.count() == table.count())
    assert(rewritten.select(col("doc_id")).except(
      table.select(col("doc_id"))).count() == 0L)
    // exactly one file per bin directory
    val perBin = rewritten
      .groupBy(col("bin").cast("long").as("bin"))
      .agg(countDistinct(col("_metadata.file_path")).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perBin.values.forall(_ == 1L), s"files per bin: $perBin")
    assert(audit.keySet == perBin.keySet && audit.values.sum == table.count())
    // a plan covering only some files must exclude (and count) the rest
    val firstFile = planned.select(col("name")).head().getString(0)
    val partial = Compaction.execute(table,
      planned.where(col("name") === firstFile),
      java.nio.file.Files.createTempDirectory("graft-compact-p").toString)
    assert(partial.collect().map(_.getLong(1)).sum < table.count())
  }
}
