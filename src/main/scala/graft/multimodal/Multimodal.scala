package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travel as opaque
  * `binary` columns next to typed metadata structs; decode/feature
  * operators run distributed via mapPartitions in a batch-friendly shape.
  *
  * The actual codecs are STUBBED (this environment ships no image/audio
  * libraries): [[StubCodec]] derives deterministic fake pixels/samples
  * from the bytes, so the Spark-side plumbing — schema, batching,
  * partitioning, output contract — is real and testable, and a real codec
  * drops in by replacing one function.
  *
  * Scale notes: binary payloads dominate row size, so operators here never
  * shuffle the blob — metadata-only projections go through Catalyst
  * column pruning (a scan that needs only `meta` never reads `data`
  * from parquet), and per-row derived features are emitted without the
  * original bytes unless asked.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png/jpg/wav/mp4/...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** Canonical multimodal table schema: id + blob + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("data", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Deterministic fake codec: all "decode" outputs are pure functions of
    * the input bytes (xxhash-seeded), standing in for libjpeg/ffmpeg.
    */
  object StubCodec {
    /** "Decode" an image: returns (width, height, meanLuma) derived
      * deterministically from the bytes. Replace with a real decoder.
      */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 16 + math.abs(h % 1024)
      val ht = 16 + math.abs((h / 1024) % 1024)
      val luma = math.abs(h % 256).toDouble
      (w, ht, luma)
    }

    /** "Resize" an image: deterministic output bytes sized w*h/64 derived
      * from the input (stand-in for decode→scale→encode). Replace with a
      * real scaler.
      */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, w * h / 64)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = (if (bytes.length == 0) 0
                  else bytes(i % bytes.length) ^ (i & 0x7f)).toByte
        i += 1
      }
      out
    }

    /** "Extract" an nDims-dim feature vector from media bytes: a
      * deterministic projection (stand-in for a CNN/audio embedder).
      */
    def featureVector(bytes: Array[Byte], nDims: Int): Array[Float] = {
      val out = new Array[Float](nDims)
      var i = 0
      while (i < nDims) {
        var acc = 1125899906842597L
        var j = i
        while (j < bytes.length) { acc = 31 * acc + bytes(j); j += nDims }
        out(i) = ((acc % 1000).toFloat) / 1000.0f
        i += 1
      }
      out
    }

    /** "Sample" frame offsets from a video duration: every `everyMs`. */
    def frameOffsets(durationMs: Long, everyMs: Long): Seq[Long] =
      if (durationMs <= 0) Seq.empty
      else 0L.to(durationMs - 1).by(math.max(everyMs, 1L))

    /** "Decode" to a `cells`-cell luma grid: cell c = odd-weighted
      * byte-stripe sum (mod 256) over positions ≡ c — weight 2t+1 for
      * the t-th byte of the stripe, so the cell is a tiny polynomial
      * hash of its stripe (an UNweighted sum collapses small-vocabulary
      * corpora into a document-length detector — measured: 12k spurious
      * hamming-0 grid pairs at sf0.1 vs 8 true duplicate texts).
      * Deliberately LOCAL — perturbing one byte changes one cell — so
      * perceptual-hash locality is exercised end-to-end even though the
      * pixels are fake; a real decoder's downscaled grayscale grid drops
      * in here.
      */
    def lumaGrid(bytes: Array[Byte], cells: Int): Array[Int] = {
      val out = new Array[Int](cells)
      var j = 0
      while (j < bytes.length) {
        val c = j % cells
        out(c) = (out(c) + (bytes(j) & 0xff) * (2 * (j / cells) + 1)) % 256
        j += 1
      }
      // final odd-multiplier spread: without it a single-byte ASCII
      // stripe is always < 128 (printable range), biasing short docs to
      // all-zero bits and colliding them wholesale
      var c = 0
      while (c < cells) { out(c) = out(c) * 131 % 256; c += 1 }
      out
    }
  }

  /** Wrap raw blobs + minimal metadata into the canonical media schema. */
  def asMediaTable(df: DataFrame, idCol: String, bytesCol: String,
                   mediaType: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("data"),
      struct(
        lit(mediaType).as("media_type"), lit(format).as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Distributed decode: batch-shaped mapPartitions emitting derived image
    * stats per media row — the plumbing a Pandas-UDF/mapInPandas decode
    * would use, minus the Python. Output drops the blob by design.
    *
    * Null-payload policy (all operators here): rows with a null blob are
    * DROPPED before the codec runs — fabricating stats for missing media
    * (or NPE-ing the task) are both worse; quarantine nulls upstream if
    * they need accounting.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, luma) = StubCodec.decodeImage(r.getAs[Array[Byte]]("data"))
          Row(r.getLong(0), w, h, luma)
        }
      }(Encoders.row(outSchema))
  }

  /** Distributed resize: emits a transformed blob plus updated meta dims —
    * the full payload-in/payload-out shape (decode → scale → re-encode in
    * a real codec; here the stub derives the output bytes
    * deterministically from input bytes + target dims). The blob is
    * transformed in place per partition and never shuffled.
    */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame =
    media.select("media_id", "data", "meta").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val in = r.getAs[Array[Byte]]("data")
          val out = StubCodec.resizeImage(in, width, height)
          val m = if (r.isNullAt(2)) null else r.getStruct(2)
          val meta =
            if (m == null) Row(null, null, width, height, null, null)
            else Row(m.get(0), m.get(1), width, height, m.get(4), m.get(5))
          Row(r.getLong(0), out, meta)
        }
      }(Encoders.row(mediaSchema))

  /** Distributed feature extraction → embedding column, ANN-ready. */
  def extractFeatures(media: DataFrame, nDims: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), StubCodec.featureVector(r.getAs[Array[Byte]]("data"), nDims).toSeq)
        }
      }(Encoders.row(outSchema))
  }

  /** Perceptual-hash bit grid per media row: the 64-cell [[StubCodec
    * .lumaGrid]] thresholded at mid-gray (averageHash with a FIXED
    * threshold — bit c depends only on cell c, so byte-local
    * perturbations flip at most their own bits; a mean-relative
    * threshold would couple every bit to every byte). Output
    * (media_id, bits) with `bits` a 64-char '0'/'1' string — trivially
    * band-sliceable and engine-portable. Blob never leaves the map task.
    */
  def imageBitGrid(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val cells = StubCodec.lumaGrid(r.getAs[Array[Byte]]("data"), 64)
          Row(r.getLong(0), cells.map(c => if (c > 127) '1' else '0').mkString)
        }
      }(Encoders.row(outSchema))
  }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance —
    * the multimodal counterpart of banded SimHash text dedup: pigeonhole
    * banding ((maxHamming+1) bands; ≤ maxHamming differing bits leave ≥ 1
    * band identical) generates candidates as a band-key EQUI-join, never
    * an all-pairs scan; the exact Hamming check runs only on candidates.
    *
    * Scale shape: grids are 64-bit-sized rows (blobs stay in their map
    * task), band keys are ≤ 16-char slices, candidates are hash-join
    * blocked; the quadratic risk is confined to identical-key buckets
    * (true near-dup clusters). Returns (id_a, id_b, hamming), id_a <
    * id_b, hamming ≤ maxHamming.
    */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(bands >= 1 && 64 % bands == 0,
      s"maxHamming+1 must divide 64: $maxHamming")
    val width = 64 / bands
    val g = imageBitGrid(media)
    val banded = g.select(col("media_id"), col("bits"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"),
          substring(col("bits"), b * width + 1, width).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("bits"),
        col("bk.b").as("band"), col("bk.key").as("key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        col("x.bits").as("__ba"), col("y.bits").as("__bb"))
      .distinct() // a pair can match in several bands
    val ham = size(filter(
      zip_with(split(col("__ba"), ""), split(col("__bb"), ""),
        (x, y) => x =!= y), b => b)).cast("long")
    cand.select(col("id_a"), col("id_b"), ham.as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Per-frame perceptual bit grids for video rows: the blob splits into
    * `window`-byte frames (stub stand-in for decode → frame extraction;
    * the last partial frame included, empty blobs yield zero frames) and
    * each frame gets its [[StubCodec.lumaGrid]] bit string. Frame
    * locality mirrors real video: damage to one region damages its frame
    * and no other. Output (media_id, frame, bits); blobs never leave the
    * map task.
    */
  def videoFrameGrids(media: DataFrame, window: Int = 64): DataFrame = {
    require(window >= 1, s"window must be positive: $window")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("data")
          val id = r.getLong(0)
          val nFrames = (bytes.length + window - 1) / window
          (0 until nFrames).iterator.map { f =>
            val slice = java.util.Arrays.copyOfRange(bytes, f * window,
              math.min((f + 1) * window, bytes.length))
            val cells = StubCodec.lumaGrid(slice, 64)
            Row(id, f.toLong,
              cells.map(c => if (c > 127) '1' else '0').mkString)
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Video near-dup by shared scene signatures: two videos pair when
    * they share ≥ `minShared` DISTINCT frame bit-grids — the frame-level
    * containment test (re-encoded/trimmed copies keep most scenes
    * byte-identical under a real decoder; here the planted-perturbation
    * regime). Candidate generation is the signature EQUI-join (the
    * inverted-index shape: a frame signature is the posting key), never
    * frames × frames; per-video signatures dedup BEFORE the join. A
    * boilerplate signature shared by thousands of videos would make its
    * bucket quadratic — at crawl scale prune high-df signatures first
    * (the [[graft.functions.Corpus.removeFrequentUnits]] lever; the
    * df-pruned tfidf join is the same move).
    */
  def videoNearDupByFrames(media: DataFrame, window: Int = 64,
                           minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be positive: $minShared")
    val sig = videoFrameGrids(media, window)
      .select(col("media_id"), col("bits")).distinct()
    sig.as("x").join(sig.as("y"),
        col("x.bits") === col("y.bits") &&
          col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Frame sampling for video rows: one output row per sampled offset.
    * Media with null or non-positive duration (images, malformed rows)
    * produce ZERO frames — not a phantom frame at offset 0.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media
      .select(col("media_id"), coalesce(col("meta.duration_ms"), lit(0L)).as("dur"))
      .where(col("dur") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("dur") - 1,
          lit(math.max(everyMs, 1L)))).as("frame_ms"))
}
