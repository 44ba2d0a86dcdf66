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

  /** Pluggable image codec surface: the decode/resize/grid contract every
    * image operator here programs against. [[StubCodec]] (the default —
    * deterministic byte-derived outputs, what the DuckDB oracles mirror)
    * and [[ImageIoCodec]] (real PNG/BMP/GIF decoding via the JDK's
    * javax.imageio — true dimensions, true pixel means) implement it;
    * operators take the codec as a parameter, so swapping in a real
    * decoder changes NO plumbing and touches NO oracle.
    */
  trait ImageCodec extends Serializable {
    /** Decode: (width, height, mean luma). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double)
    /** Decode → scale to (w, h) → re-encode. */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    /** `cells`-cell luma grid (values 0..255) — the perceptual-hash input. */
    def lumaGrid(bytes: Array[Byte], cells: Int): Array[Int]
  }

  /** Deterministic fake codec: all "decode" outputs are pure functions of
    * the input bytes (xxhash-seeded), standing in for libjpeg/ffmpeg.
    */
  object StubCodec extends ImageCodec {
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

  /** Real image codec on the JDK's javax.imageio — PNG/BMP/GIF (and JPEG
    * where the JDK ships the plugin) decode to true dimensions and true
    * pixel statistics; resize goes decode → bilinear scale → PNG
    * re-encode. Selectable per operator call; [[StubCodec]] stays the
    * default so every existing DuckDB oracle (which mirrors the stub's
    * byte math) is untouched. Undecodable bytes throw
    * IllegalArgumentException naming the media — fail loudly, don't
    * fabricate pixels (quarantine upstream, the null-payload policy).
    */
  object ImageIoCodec extends ImageCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"ImageIoCodec: undecodable image bytes (${bytes.length} bytes)")
      img
    }
    /** Rec.601 luma from sRGB, matching the classic perceptual-hash
      * pipelines: 0.299 R + 0.587 G + 0.114 B.
      */
    private def luma(rgb: Int): Double =
      0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      val img = read(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += luma(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      (w, h, sum / (w.toLong * h))
    }
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = read(bytes)
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    def lumaGrid(bytes: Array[Byte], cells: Int): Array[Int] =
      imageGrid(read(bytes), cells)

    /** Block-averaged luma grid of a decoded frame — shared with
      * [[GifCodec]], which decodes its own frames but grids them the
      * same way (identical grids for identical pixels is what makes a
      * still image and its 1-frame video agree).
      */
    private[multimodal] def imageGrid(img: java.awt.image.BufferedImage,
                                      cells: Int): Array[Int] = {
      val side = math.sqrt(cells.toDouble).toInt
      require(side * side == cells,
        s"lumaGrid cells must be a perfect square for a real decoder: $cells")
      // average the lumas of each cell's pixel block over the ORIGINAL
      // pixels (integer block edges; trailing remainder folds into the
      // last block) — the canonical aHash/pHash downscale step
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](cells)
      var cy = 0
      while (cy < side) {
        val y0 = cy * h / side
        val y1 = if (cy == side - 1) h else (cy + 1) * h / side
        var cx = 0
        while (cx < side) {
          val x0 = cx * w / side
          val x1 = if (cx == side - 1) w else (cx + 1) * w / side
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < math.max(y1, y0 + 1) && y < h) {
            var x = x0
            while (x < math.max(x1, x0 + 1) && x < w) {
              sum += luma(img.getRGB(x, y)); n += 1; x += 1
            }
            y += 1
          }
          out(cy * side + cx) = if (n == 0) 0 else (sum / n).toInt
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** Pluggable video codec surface: bytes → one luma grid per frame —
    * the contract the video near-dup operators program against.
    * [[VideoStub]] (default — fixed-size byte windows ARE the frames,
    * what the DuckDB oracles mirror) and [[GifCodec]] (real multi-frame
    * decode of animated GIF via the JDK's imageio sequence reader)
    * implement it; swapping in the real decoder changes no plumbing and
    * touches no oracle (the image/audio-codec convention).
    */
  trait VideoCodec extends Serializable {
    /** Per-frame `cells`-cell luma grids, in frame order. */
    def frameGrids(bytes: Array[Byte], cells: Int): Seq[Array[Int]]
  }

  /** Deterministic video "codec": the blob splits into `window`-byte
    * frames (last partial frame included, empty blobs yield zero
    * frames) and each frame grids via [[StubCodec.lumaGrid]]. Frame
    * locality mirrors real video: damage to one region damages its
    * frame and no other.
    */
  final case class VideoStub(window: Int = 64) extends VideoCodec {
    require(window >= 1, s"window must be positive: $window")
    def frameGrids(bytes: Array[Byte], cells: Int): Seq[Array[Int]] = {
      val nFrames = (bytes.length + window - 1) / window
      (0 until nFrames).map { f =>
        StubCodec.lumaGrid(java.util.Arrays.copyOfRange(bytes, f * window,
          math.min((f + 1) * window, bytes.length)), cells)
      }
    }
  }

  /** Real multi-frame video decode for animated GIF — the one moving-
    * picture container the JDK decodes natively, exercising the actual
    * production shape (container → frame iterator → per-frame grid)
    * without shipping ffmpeg. Frames are the decoder's rasters, gridded
    * exactly like [[ImageIoCodec]] grids a still (identical pixels →
    * identical grid, so a still and its 1-frame GIF agree). Caveat,
    * stated not hidden: rasters are NOT composited against previous
    * frames — a delta-encoded GIF's partial frames fingerprint as their
    * deltas (fine for near-dup: identical encodes still collide;
    * re-encodes should be compared through [[ImageIoCodec]] stills).
    * Undecodable bytes throw, naming the media — the fail-loud policy.
    */
  object GifCodec extends VideoCodec {
    def frameGrids(bytes: Array[Byte], cells: Int): Seq[Array[Int]] = {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      require(readers.hasNext, "GifCodec: JDK has no GIF reader")
      val reader = readers.next()
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(in, false, true)
        val n = reader.getNumImages(true)
        if (n <= 0)
          throw new IllegalArgumentException(
            s"GifCodec: no decodable frames (${bytes.length} bytes)")
        (0 until n).map(i => ImageIoCodec.imageGrid(reader.read(i), cells))
      } catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"GifCodec: undecodable video bytes (${bytes.length} bytes)", e)
      } finally {
        reader.dispose()
        in.close()
      }
    }
  }

  /** Real raw-video container decode for YUV4MPEG2 (.y4m) — the
    * uncompressed interchange format every ffmpeg/x264 pipeline can
    * emit, parsed directly from its published layout (one ASCII header
    * line `YUV4MPEG2 W<w> H<h> ...`, then per frame an ASCII `FRAME`
    * line followed by planar Y, Cb, Cr data). No codec library: the Y
    * plane IS the luma raster, so each frame grids by block-averaging
    * raw plane bytes with [[ImageIoCodec.imageGrid]]'s exact edge
    * conventions (integer block edges, trailing remainder folds into
    * the last block) — a flat-gray frame of value v grids to all-v,
    * and two containers of the same frames fingerprint identically.
    * Supported chroma taggings: C420* (any suffix), C422, C444, Cmono —
    * chroma planes are sized and SKIPPED (near-dup fingerprints are
    * luma-only, the pHash convention). Truncated or non-Y4M bytes
    * throw, naming the defect — the fail-loud WavCodec/GifCodec policy.
    */
  object Y4mCodec extends VideoCodec {
    private val Magic = "YUV4MPEG2"

    /** (width, height, bytes per frame's chroma planes). */
    private[multimodal] def parseHeader(header: String): (Int, Int, Int) = {
      val parts = header.split(' ')
      require(parts.nonEmpty && parts(0) == Magic,
        s"Y4mCodec: not a YUV4MPEG2 stream (header '${header.take(20)}')")
      var w = -1; var h = -1; var chroma = "420"
      parts.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'C' => chroma = p.substring(1)
          case _   => () // F (rate), I (interlace), A (aspect), X: ignored
        }
      }
      require(w > 0 && h > 0, s"Y4mCodec: missing/bad W/H ($w x $h)")
      val cw = (w + 1) / 2
      val ch = (h + 1) / 2
      val chromaBytes =
        if (chroma.startsWith("420")) 2 * cw * ch
        else if (chroma.startsWith("422")) 2 * cw * h
        else if (chroma.startsWith("444")) 2 * w * h
        else if (chroma.startsWith("mono")) 0
        else throw new IllegalArgumentException(
          s"Y4mCodec: unsupported chroma sampling C$chroma")
      (w, h, chromaBytes)
    }

    def frameGrids(bytes: Array[Byte], cells: Int): Seq[Array[Int]] = {
      def lineEnd(from: Int): Int = {
        var i = from
        while (i < bytes.length && bytes(i) != '\n') i += 1
        require(i < bytes.length, "Y4mCodec: unterminated header line")
        i
      }
      val hEnd = lineEnd(0)
      val (w, h, chromaBytes) =
        parseHeader(new String(bytes, 0, hEnd, "US-ASCII"))
      val frameBytes = w * h + chromaBytes
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var off = hEnd + 1
      while (off < bytes.length) {
        val fEnd = lineEnd(off)
        val fLine = new String(bytes, off, fEnd - off, "US-ASCII")
        require(fLine == "FRAME" || fLine.startsWith("FRAME "),
          s"Y4mCodec: expected FRAME marker at offset $off, got '${fLine.take(10)}'")
        require(fEnd + 1 + frameBytes <= bytes.length,
          s"Y4mCodec: truncated frame at offset $off " +
            s"(need $frameBytes plane bytes)")
        out += planeGrid(bytes, fEnd + 1, w, h, cells)
        off = fEnd + 1 + frameBytes
      }
      require(out.nonEmpty, s"Y4mCodec: no frames (${bytes.length} bytes)")
      out.toSeq
    }

    /** [[ImageIoCodec.imageGrid]] over a raw luma plane: identical
      * block edges and remainder folding, value = the plane byte.
      */
    private def planeGrid(bytes: Array[Byte], off: Int, w: Int, h: Int,
                          cells: Int): Array[Int] = {
      val side = math.sqrt(cells.toDouble).toInt
      require(side * side == cells,
        s"lumaGrid cells must be a perfect square for a real decoder: $cells")
      val out = new Array[Int](cells)
      var cy = 0
      while (cy < side) {
        val y0 = cy * h / side
        val y1 = if (cy == side - 1) h else (cy + 1) * h / side
        var cx = 0
        while (cx < side) {
          val x0 = cx * w / side
          val x1 = if (cx == side - 1) w else (cx + 1) * w / side
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < math.max(y1, y0 + 1) && y < h) {
            var x = x0
            while (x < math.max(x1, x0 + 1) && x < w) {
              sum += (bytes(off + y * w + x) & 0xff); n += 1; x += 1
            }
            y += 1
          }
          out(cy * side + cx) = if (n == 0) 0 else (sum / n).toInt
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  /** Pluggable audio codec surface: bytes → mono 16-bit PCM samples —
    * the contract every audio operator programs against. [[AudioStub]]
    * (default — raw bytes ARE the stream, what the DuckDB oracles
    * mirror) and [[WavCodec]] (real RIFF/WAVE parsing — header-located
    * data chunk, channel mixdown) implement it; swapping in the real
    * decoder changes no plumbing and touches no oracle (the image-codec
    * convention).
    */
  trait AudioCodec extends Serializable {
    def pcmSamples(bytes: Array[Byte]): Array[Int]
  }

  /** Deterministic audio "codec": raw bytes ARE the PCM stream (16-bit
    * little-endian signed samples — stub framing standing in for a
    * WAV/FLAC decoder; a trailing odd byte is ignored). Byte-LOCAL like
    * [[StubCodec.lumaGrid]]: one byte feeds one sample feeds one band,
    * so perturbation locality is exercised end-to-end and the banded
    * fingerprint math is DuckDB-expressible (the oracle mirrors it).
    */
  object AudioStub extends AudioCodec {
    /** Bytes → 16-bit LE signed samples (−32768..32767). */
    def pcmSamples(bytes: Array[Byte]): Array[Int] = {
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val raw = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
        out(i) = if (raw >= 32768) raw - 65536 else raw
        i += 1
      }
      out
    }

    /** `cells`-band fingerprint over the sample stream — the 16-bit
      * analog of [[StubCodec.lumaGrid]]: band c accumulates the odd-
      * weighted samples of its stripe (weight 2t+1 for the t-th sample
      * of the stripe) PLUS a length-keyed offset `n·(c+1)` (n = sample
      * count), in floor-mod 65536, then spreads by ×131 mod 65536.
      * floorMod, not `%`: sample sums go negative and the band value
      * must stay in [0, 65536) for the threshold bit to mean anything
      * (and for the SQL mirror `((x % 65536) + 65536) % 65536` to
      * agree).
      *
      * The length term is the bucket-explosion guard: without it every
      * stream shorter than `cells` samples leaves its tail bands at an
      * identical 0, and the banded near-dup join inherits one shared
      * all-zero band key per short-doc cohort (measured at sf0.1: a
      * 524-doc bucket, 156k candidate pairs — 35× the image path).
      * Mixing n into every band partitions those cohorts by length
      * while keeping byte-locality intact: a same-length perturbation
      * shifts identical offsets on both sides, so one flipped sample
      * still moves exactly one band.
      */
    def bandFingerprint(samples: Array[Int], cells: Int): Array[Int] = {
      val acc = new Array[Long](cells)
      var i = 0
      while (i < samples.length) {
        val c = i % cells
        acc(c) += samples(i).toLong * (2L * (i / cells) + 1L)
        i += 1
      }
      val n = samples.length.toLong
      val out = new Array[Int](cells)
      var c = 0
      while (c < cells) {
        out(c) = java.lang.Math.floorMod(
          java.lang.Math.floorMod(acc(c) + n * (c + 1L), 65536L) * 131L,
          65536L).toInt
        c += 1
      }
      out
    }
  }

  /** Real RIFF/WAVE codec — no external libraries, the container format
    * is a chunk walk: `RIFF….WAVE`, an `fmt ` chunk (PCM format tag,
    * channel count, sample rate, bits/sample), a `data` chunk holding
    * the interleaved samples. Supports 16-bit PCM; multi-channel audio
    * mixes down to mono by per-frame channel average (truncating toward
    * zero — deterministic integer math). Malformed or non-PCM16 bytes
    * fail loudly (the ImageIoCodec policy — never fabricate samples).
    */
  object WavCodec extends AudioCodec {
    /** (sampleRate, channels, bitsPerSample, dataOffset, dataLength). */
    def parseHeader(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
      require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
        s"WavCodec: not a RIFF/WAVE stream (${bytes.length} bytes)")
      var off = 12
      var rate = -1; var ch = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
        val id = tag(off)
        val size = u32(off + 4)
        if (id == "fmt ") {
          require(size >= 16 && off + 8 + 16 <= bytes.length,
            "WavCodec: truncated fmt chunk")
          val fmt = u16(off + 8)
          require(fmt == 1, s"WavCodec: only PCM supported (format tag $fmt)")
          ch = u16(off + 10)
          rate = u32(off + 12)
          bits = u16(off + 22)
          require(bits == 16, s"WavCodec: only 16-bit PCM supported ($bits)")
          require(ch >= 1, s"WavCodec: bad channel count $ch")
        } else if (id == "data") {
          dataOff = off + 8
          dataLen = math.min(size, bytes.length - dataOff)
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        off += 8 + size + (size & 1)
      }
      require(rate > 0, "WavCodec: missing fmt chunk")
      require(dataOff >= 0, "WavCodec: missing data chunk")
      (rate, ch, bits, dataOff, dataLen)
    }

    /** Mono 16-bit samples: per-frame average over channels. */
    def pcmSamples(bytes: Array[Byte]): Array[Int] = {
      val (_, ch, _, dataOff, dataLen) = parseHeader(bytes)
      val frames = dataLen / (2 * ch)
      val out = new Array[Int](frames)
      var f = 0
      while (f < frames) {
        var sum = 0
        var c = 0
        while (c < ch) {
          val o = dataOff + 2 * (f * ch + c)
          val raw = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
          sum += (if (raw >= 32768) raw - 65536 else raw)
          c += 1
        }
        out(f) = sum / ch
        f += 1
      }
      out
    }

    /** Typed metadata from the header: (sampleRate, channels, nSamples,
      * durationMs) — the decode-stats entry point.
      */
    def describe(bytes: Array[Byte]): (Int, Int, Long, Long) = {
      val (rate, ch, _, _, dataLen) = parseHeader(bytes)
      val frames = dataLen.toLong / (2L * ch)
      (rate, ch, frames, frames * 1000L / rate)
    }
  }

  /** Distributed WAV decode: per-row header stats — the audio analog of
    * [[decodeImages]]. Output (media_id, sample_rate, channels,
    * n_samples, duration_ms); blobs never leave the map task.
    */
  def decodeWavMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val (rate, ch, n, ms) = WavCodec.describe(r.getAs[Array[Byte]]("data"))
          Row(r.getLong(0), rate, ch, n, ms)
        }
      }(Encoders.row(outSchema))
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
  def decodeImages(media: DataFrame,
                   codec: ImageCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, luma) = codec.decodeImage(r.getAs[Array[Byte]]("data"))
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
  def resizeImages(media: DataFrame, width: Int, height: Int,
                   codec: ImageCodec = StubCodec): DataFrame =
    media.select("media_id", "data", "meta").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val in = r.getAs[Array[Byte]]("data")
          val out = codec.resizeImage(in, width, height)
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
  def imageBitGrid(media: DataFrame,
                   codec: ImageCodec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val cells = codec.lumaGrid(r.getAs[Array[Byte]]("data"), 64)
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
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        codec: ImageCodec = StubCodec): DataFrame =
    bitsNearDupPairs(imageBitGrid(media, codec), maxHamming)

  /** Pigeonhole-banded Hamming near-dup over ANY (media_id, bits)
    * 64-bit-string table — the candidate-generation/verify core shared
    * by [[phashNearDupPairs]] (image) and [[audioNearDupPairs]]:
    * (maxHamming+1) bands guarantee ≤ maxHamming differing bits leave
    * ≥ 1 band identical, candidates come from the band-key EQUI-join
    * (never all-pairs), and the exact Hamming check runs only on
    * candidates. Returns (id_a, id_b, hamming), id_a < id_b.
    */
  private def bitsNearDupPairs(g: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(bands >= 1 && 64 % bands == 0,
      s"maxHamming+1 must divide 64: $maxHamming")
    val width = 64 / bands
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

  /** 64-band audio fingerprint per media row: [[AudioStub.pcmSamples]]
    * (16-bit LE framing over the raw blob) → [[AudioStub
    * .bandFingerprint]] → threshold at mid-range (bit c = band c ≥
    * 32768; fixed threshold for the same bit-locality reason as
    * [[imageBitGrid]]). Output (media_id, bits), a 64-char '0'/'1'
    * string; blobs never leave the map task.
    */
  def audioBitFingerprint(media: DataFrame,
                          codec: AudioCodec = AudioStub): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.map { r =>
          val bands = AudioStub.bandFingerprint(
            codec.pcmSamples(r.getAs[Array[Byte]]("data")), 64)
          Row(r.getLong(0),
            bands.map(b => if (b > 32767) '1' else '0').mkString)
        }
      }(Encoders.row(outSchema))
  }

  /** Near-duplicate audio pairs by banded fingerprint Hamming distance —
    * [[phashNearDupPairs]]' discipline on the PCM stream: a re-encoded
    * or lightly corrupted copy perturbs few samples, so few bands flip,
    * and pigeonhole banding recalls it from the band-key equi-join.
    * Returns (id_a, id_b, hamming), id_a < id_b, hamming ≤ maxHamming.
    */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        codec: AudioCodec = AudioStub): DataFrame =
    bitsNearDupPairs(audioBitFingerprint(media, codec), maxHamming)

  /** Per-frame perceptual bit grids for video rows: the blob splits into
    * `window`-byte frames (stub stand-in for decode → frame extraction;
    * the last partial frame included, empty blobs yield zero frames) and
    * each frame gets its [[StubCodec.lumaGrid]] bit string. Frame
    * locality mirrors real video: damage to one region damages its frame
    * and no other. Output (media_id, frame, bits); blobs never leave the
    * map task.
    */
  def videoFrameGrids(media: DataFrame, window: Int = 64): DataFrame =
    videoFrameGridsWith(media, VideoStub(window))

  /** [[videoFrameGrids]] against an explicit [[VideoCodec]] — the real-
    * decoder entry point ([[GifCodec]] for animated GIF). Same output
    * contract: (media_id, frame, bits); blobs never leave the map task.
    */
  def videoFrameGridsWith(media: DataFrame, codec: VideoCodec,
                          cells: Int = 64): DataFrame = {
    require(cells >= 1, s"cells must be positive: $cells")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("data")
          val id = r.getLong(0)
          codec.frameGrids(bytes, cells).iterator.zipWithIndex.map {
            case (grid, f) =>
              Row(id, f.toLong,
                grid.map(c => if (c > 127) '1' else '0').mkString)
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
                           minShared: Int = 2): DataFrame =
    videoNearDupByFramesWith(media, VideoStub(window), minShared)

  /** [[videoNearDupByFrames]] against an explicit [[VideoCodec]]. */
  def videoNearDupByFramesWith(media: DataFrame, codec: VideoCodec,
                               minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be positive: $minShared")
    val sig = videoFrameGridsWith(media, codec)
      .select(col("media_id"), col("bits")).distinct()
    sig.as("x").join(sig.as("y"),
        col("x.bits") === col("y.bits") &&
          col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }

  /** Per-window banded audio fingerprints — [[videoFrameGrids]]' shape
    * on the sample stream: the PCM samples split into `windowSamples`-
    * sample windows (last partial included, empty blobs yield zero
    * windows) and each window gets its [[AudioStub.bandFingerprint]]
    * bit string. Window locality mirrors real audio: damage to one
    * region damages its window and no other. Output (media_id, window,
    * bits); blobs never leave the map task.
    */
  def audioWindowFingerprints(media: DataFrame,
                              windowSamples: Int = 32,
                              codec: AudioCodec = AudioStub): DataFrame = {
    require(windowSamples >= 1, s"windowSamples must be positive: $windowSamples")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("window", LongType, nullable = false),
      StructField("bits", StringType, nullable = false)))
    media.select("media_id", "data").where(col("data").isNotNull)
      .mapPartitions { it =>
        it.flatMap { r =>
          val samples = codec.pcmSamples(r.getAs[Array[Byte]]("data"))
          val id = r.getLong(0)
          val nW = (samples.length + windowSamples - 1) / windowSamples
          (0 until nW).iterator.map { w =>
            val slice = java.util.Arrays.copyOfRange(samples,
              w * windowSamples,
              math.min((w + 1) * windowSamples, samples.length))
            val bands = AudioStub.bandFingerprint(slice, 64)
            Row(id, w.toLong,
              bands.map(b => if (b > 32767) '1' else '0').mkString)
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Audio near-dup by shared window signatures — the
    * [[videoNearDupByFrames]] containment discipline on the sample
    * stream: two audio rows pair when they share ≥ `minShared` DISTINCT
    * window fingerprints (trimmed/partially corrupted copies keep most
    * windows byte-identical under the byte-local framing). Candidates =
    * signature EQUI-join (inverted-index shape), per-row signatures
    * dedup before the join; prune high-df signatures at crawl scale
    * (the removeFrequentUnits lever).
    */
  def audioNearDupByWindows(media: DataFrame, windowSamples: Int = 32,
                            minShared: Int = 2,
                            codec: AudioCodec = AudioStub): DataFrame = {
    require(minShared >= 1, s"minShared must be positive: $minShared")
    val sig = audioWindowFingerprints(media, windowSamples, codec)
      .select(col("media_id"), col("bits")).distinct()
    sig.as("x").join(sig.as("y"),
        col("x.bits") === col("y.bits") &&
          col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared_windows"))
      .where(col("shared_windows") >= minShared)
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
