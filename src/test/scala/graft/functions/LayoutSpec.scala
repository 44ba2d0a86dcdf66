package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Sinks

class LayoutSpec extends SparkSpec {

  test("zValue16 interleaves bits; high bits are masked") {
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),
      (0L, 1L, 2L),
      (2L, 3L, 14L),            // a bit1→pos2 (4); b bits0,1→pos1,3 (2+8)
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL),
      (0x10000L, 0L, 0L))       // 17th bit masked away
    val df = spark.createDataFrame(cases).toDF("a", "b", "want")
    val bad = df.where(Layout.zValue16(col("a"), col("b")) =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("zorderedParquet: disjoint z-ranges per file, both dims clustered") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/out"
    // Morton codes cluster best when both dimensions have comparable bit
    // widths — bucket the high-cardinality dimension first (15-bit
    // event_id down to 4 bits, matching the ~4-bit user_id space).
    val ev = graft.GraftSession.readTable(spark, sf(), "events")
      .select(col("event_id"), col("user_id"),
        pmod(col("event_id"), lit(16)).as("event_bucket"))
    Sinks.zorderedParquet(ev, "user_id", "event_bucket", dir, numFiles = 8)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    assert(files.length >= 4, s"expected several files, got ${files.length}")

    val perFile = files.map { f =>
      val d = spark.read.parquet(f)
        .select(Layout.zValue16(col("user_id"), col("event_bucket")).as("z"),
          col("user_id"))
      val r = d.agg(min("z"), max("z"), min("user_id"), max("user_id"),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    assert(perFile.map(_._5).sum == ev.count())
    // range partition + in-file sort ⇒ files own disjoint z intervals
    val sorted = perFile.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1, _, _, _), (lo2, _, _, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // clustering effect: a file's user_id spread is well under the global
    val globalSpread = {
      val r = ev.agg(min("user_id"), max("user_id")).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    val avgSpread = perFile.map(t => (t._4 - t._3).toDouble).sum / perFile.length
    assert(avgSpread < 0.75 * globalSpread,
      s"z-order produced no user_id clustering: avg $avgSpread vs global $globalSpread")
  }

  test("compactionPlan: bin totals, keep threshold, per-dir isolation") {
    import spark.implicits._
    val files =
      (1 to 40).map(i => ("dt=a", f"p-$i%04d", 300L)) ++ // 40×300 = 4 bins
      Seq(("dt=a", "q-big", 5000L),                       // ≥ target: keep
          ("dt=b", "r-1", 900L), ("dt=b", "r-2", 900L))   // own dir's bins
    val out = Layout.compactionPlan(files.toDF("dir", "path", "bytes"),
        "dir", "path", "bytes", targetBytes = 3000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.length == 43, "every input file exactly once")
    val big = out.find(_._2 == "q-big").get
    assert(big._4 == "keep" && big._5.isEmpty)
    // 40 × 300 B at target 3000 → exactly 10 per bin, 4 bins, in path order
    val aBins = out.filter(f => f._1 == "dt=a" && f._4 == "compact")
      .groupBy(_._5.get).view.mapValues(_.map(_._3).sum).toMap
    assert(aBins == Map(0L -> 3000L, 1L -> 3000L, 2L -> 3000L, 3L -> 3000L),
      aBins.toString)
    // dt=b never merges into dt=a's bins; 1800 < target → one bin
    assert(out.filter(_._1 == "dt=b").flatMap(_._5).distinct.toSeq == Seq(0L))
  }
}
