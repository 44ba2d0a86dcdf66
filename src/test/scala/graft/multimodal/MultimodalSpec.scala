package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
    Multimodal.asMediaTable(docs, "doc_id", "blob", "image", "png")
  }

  test("media table carries blob + typed metadata struct") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "data", "meta"))
    val m = media.select("meta.media_type", "meta.format").distinct().collect()
    assert(m.length == 1 && m.head.getString(0) == "image")
  }

  test("decodeImages: deterministic stub stats, blob dropped") {
    val out = Multimodal.decodeImages(media)
    assert(out.schema.fieldNames.toSeq == Seq("media_id", "width", "height", "mean_luma"))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getInt(1) >= 16 && r.getInt(2) >= 16))
    // determinism: same input → same output
    val again = Multimodal.decodeImages(media).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("phashNearDupPairs: byte-local perturbations stay in Hamming range, distant blobs don't pair") {
    val rows = Seq(
      (1L, Array.fill(256)(100.toByte)),                    // base
      (2L, Array.fill(256)(100.toByte)),                    // identical → hamming 0
      (3L, { val a = Array.fill(256)(100.toByte)            // one byte flipped:
             a(5) = 250.toByte; a }),                       // only cell 5 can move
      (4L, Array.fill(256)(50.toByte)))                     // far everywhere
    val df = spark.createDataFrame(rows.map { case (i, b) => (i, b) })
      .toDF("media_id", "blob")
    val media = Multimodal.asMediaTable(df, "media_id", "blob", "image", "png")
    val out = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 0L)
    assert(out.get((1L, 3L)).exists(_ <= 1L)) // ≤ 1 cell moved
    assert(out((2L, 3L)) == out((1L, 3L)))
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // the grid really is byte-local: cell 5 differs, all others equal
    val grids = Multimodal.imageBitGrid(media).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (g1, g3) = (grids(1L), grids(3L))
    assert(g1.zip(g3).zipWithIndex.forall { case ((x, y), i) =>
      if (i == 5) true else x == y })
    assert(g1.length == 64)
  }

  test("videoNearDupByFrames: shared-scene counting, single shared frame is not enough") {
    val a = Array.tabulate(300)(j => ((j * 7) % 251).toByte)
    val b = a.clone; b(10) = 2 // flips frame 0's cell-10 bit (2·131%256=6 ≤ 127)
    val c = Array.tabulate(300)(j => ((j * 11 + 3) % 251).toByte)
    val d = a.take(64) ++ Array.tabulate(236)(j => ((j * 13 + 5) % 251).toByte)
    val df = spark.createDataFrame(Seq((1L, a), (2L, b), (3L, c), (4L, d)))
      .toDF("media_id", "blob")
    val media = Multimodal.asMediaTable(df, "media_id", "blob", "video", "mp4")
    val out = Multimodal.videoNearDupByFrames(media, window = 64, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // videos 1/2 share frames 1..4 (frame 0 damaged); 4 shares ONLY
    // frame 0 with 1 (< minShared); 3 shares nothing
    assert(out == Map((1L, 2L) -> 4L))
    val frames = Multimodal.videoFrameGrids(media, 64)
      .where(col("media_id") === 1).collect()
    assert(frames.length == 5) // 300 bytes → 4 full + 1 partial frame
  }

  test("resizeImages: schema preserved, meta dims updated, deterministic") {
    val out = Multimodal.resizeImages(media, 64, 64)
    assert(out.schema == Multimodal.mediaSchema)
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val m = r.getStruct(2)
      m.getInt(2) == 64 && m.getInt(3) == 64 &&
        r.getAs[Array[Byte]](1).length == 64 * 64 / 64
    })
    val again = Multimodal.resizeImages(media, 64, 64).collect()
    assert(rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap ==
      again.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap)
  }

  test("extractFeatures yields ANN-ready fixed-dim embeddings") {
    val out = Multimodal.extractFeatures(media, 16)
    val rows = out.collect()
    assert(rows.forall(_.getSeq[Float](1).length == 16))
  }

  test("sampleFrames: one row per sampled offset") {
    val withDur = media.withColumn("meta",
      struct(col("meta.media_type"), col("meta.format"), col("meta.width"),
        col("meta.height"), lit(100L).as("duration_ms"), col("meta.sample_rate")))
    val frames = Multimodal.sampleFrames(withDur.limit(3), 40L)
    // duration 100ms sampled every 40ms → offsets 0,40,80 per media row
    assert(frames.count() == 9)
  }
}
