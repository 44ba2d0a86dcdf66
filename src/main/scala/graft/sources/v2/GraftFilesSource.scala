package graft.sources.v2

import java.util.zip.GZIPInputStream

import scala.collection.JavaConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-files` — a DataSource V2 connector with the reference engine's
  * file-source semantics, re-expressed as Spark connector machinery:
  *
  *  - **1 file = 1 input partition** (the reference's one-PartitionLoader-
  *    per-file round-robin, reference datasource/file/file_datasource.go:19-63,
  *    cluster/coordinator.go:144-150) — Spark's scheduler does the
  *    round-robin.
  *  - **Whole-file Decoder hook** (`option("codec", "gzip"|"auto"|"none")`)
  *    — the `Decoder func([]byte) ([]byte, error)` analogue
  *    (file_datasource.go:31-48), applied per file in the reader,
  *    streaming-decoded under a decompressed-size guard
  *    (`option("maxFileSize", bytes)`, default 2 GiB).
  *  - **Planning-time file skipping**: path filters (`=`, prefix, suffix,
  *    contains) push into the scan and drop whole files BEFORE any
  *    partition is scheduled — at 100 TB the difference between "list and
  *    skip" and "schedule a task per file to discard its rows".
  *  - **Metadata-only scans**: column pruning reaches the reader; a query
  *    over (path, length, mtime) never opens a single file.
  *
  * Schema: `path string, length long, mtime timestamp, content binary`.
  *
  * Usage: `spark.read.format("graft-files").load(dir + "/&#42;.jsonl.gz")`.
  */
class GraftFilesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-files"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFilesTable.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftFilesTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftFilesTable {
  val SCHEMA: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("mtime", TimestampType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class GraftFilesTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  private val paths: Seq[String] = {
    // `load(path)` lands in "paths" (json array) or "path"; a real JSON
    // parse — paths may legally contain commas/quotes
    val multi = Option(options.get("paths")).map { js =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }
    val resolved = multi.getOrElse(Option(options.get("path")).map(Seq(_))
      .getOrElse(Seq.empty))
    require(resolved.nonEmpty && resolved.forall(_.nonEmpty),
      "graft-files: no path given — use load(path)")
    resolved
  }
  private val codec: String = Option(options.get("codec")).getOrElse("auto")
  // guard against a file (or its gzip expansion) OOMing an executor —
  // whole-file rows are the connector's contract, so the bound is on the
  // DECOMPRESSED size and fails loud instead of dying on heap. Hard cap:
  // a BinaryType cell is one JVM byte array, so nothing above the VM
  // array limit can ever be admitted.
  private val maxFileSize: Long = {
    val arrayLimit = (Int.MaxValue - 16).toLong
    val v = Option(options.get("maxFileSize")).map(_.toLong).getOrElse(arrayLimit)
    require(v > 0 && v <= arrayLimit,
      s"graft-files: maxFileSize must be in (0, $arrayLimit] — a whole-file " +
        s"row cannot exceed the JVM array limit: $v")
    v
  }
  // File packing: 1 file = 1 InputPartition is the reference's
  // PartitionLoader shape, but at the realistic 100 TB corpus shape
  // (millions of small files) it floods the scheduler with one task per
  // file. `maxFilesPerPartition` / `maxBytesPerPartition` bin consecutive
  // files (in listing order) into one InputPartition up to either bound;
  // the defaults (1 file, unbounded bytes) keep the reference semantics.
  private val maxFilesPerPartition: Int = {
    val v = Option(options.get("maxFilesPerPartition")).map(_.toInt).getOrElse(1)
    require(v >= 1, s"graft-files: maxFilesPerPartition must be >= 1: $v")
    v
  }
  private val maxBytesPerPartition: Long = {
    val v = Option(options.get("maxBytesPerPartition")).map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(v > 0, s"graft-files: maxBytesPerPartition must be positive: $v")
    v
  }

  override def name(): String = s"graft-files(${paths.mkString(",")})"
  override def schema(): StructType = GraftFilesTable.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFilesScanBuilder(paths, codec, maxFileSize,
      maxFilesPerPartition, maxBytesPerPartition)
}

class GraftFilesScanBuilder(paths: Seq[String], codec: String, maxFileSize: Long,
                            maxFilesPerPartition: Int = 1,
                            maxBytesPerPartition: Long = Long.MaxValue)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = GraftFilesTable.SCHEMA
  private var pushed: Array[Filter] = Array.empty

  /** Accept path-column filters the listing can evaluate; everything else
    * stays with Spark (returned as post-scan residue).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, keep) = filters.partition {
      case EqualTo("path", _: String) => true
      case StringStartsWith("path", _) => true
      case StringEndsWith("path", _) => true
      case StringContains("path", _) => true
      case _ => false
    }
    pushed = take
    keep
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // Driver-side listing + skipping: files failing a pushed path filter
    // never become partitions.
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val all: Seq[FileStatus] = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
        .flatMap(st => if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st))
        .filter(_.isFile)
    }
    def keep(path: String): Boolean = pushed.forall {
      case EqualTo("path", v: String) => path == v
      case StringStartsWith("path", v) => path.startsWith(v)
      case StringEndsWith("path", v) => path.endsWith(v)
      case StringContains("path", v) => path.contains(v)
      case _ => true
    }
    val files = all.map(st => GraftFilePartition(
        st.getPath.toUri.toString, st.getLen, st.getModificationTime))
      .filter(f => keep(f.path))
      .sortBy(_.path)
    // ship the DRIVER's hadoop conf to the readers — an executor-side
    // `new Configuration()` would drop spark.hadoop.* settings (s3a
    // credentials, fs impls, kerberos), failing at read time for any
    // filesystem that needed them at listing time
    val confProps = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    GraftFilesScan(files, required, codec, pushed.map(_.toString), confProps,
      maxFileSize, maxFilesPerPartition, maxBytesPerPartition)
  }
}

/** One surviving file. mtimeMs is epoch millis. */
case class GraftFilePartition(path: String, length: Long, mtimeMs: Long)

/** One scheduled task: a size-binned run of consecutive files (a single
  * file under the default packing limits).
  */
case class GraftFilesPack(files: Seq[GraftFilePartition]) extends InputPartition

case class GraftFilesScan(files: Seq[GraftFilePartition], required: StructType,
                          codec: String, pushedDesc: Array[String],
                          confProps: Array[(String, String)],
                          maxFileSize: Long,
                          maxFilesPerPartition: Int = 1,
                          maxBytesPerPartition: Long = Long.MaxValue)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft-files nFiles=${files.length} " +
      s"ReadColumns=[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters=[${pushedDesc.mkString(", ")}]"

  /** Greedy sequential binning in listing (path) order: a pack closes
    * when the next file would push it past `maxFilesPerPartition` or
    * `maxBytesPerPartition` (listed — i.e. compressed — bytes; a pack
    * always admits at least one file, so a single oversized file still
    * reads, guarded per-file by `maxFileSize`). Deterministic: same
    * listing → same packs on any cluster.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val packs = Seq.newBuilder[GraftFilesPack]
    var cur = Vector.empty[GraftFilePartition]
    var curBytes = 0L
    files.foreach { f =>
      val over = cur.nonEmpty &&
        (cur.length >= maxFilesPerPartition || curBytes + f.length > maxBytesPerPartition)
      if (over) { packs += GraftFilesPack(cur); cur = Vector.empty; curBytes = 0L }
      cur :+= f
      curBytes += f.length
    }
    if (cur.nonEmpty) packs += GraftFilesPack(cur)
    packs.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftFilesReaderFactory(required, codec, confProps, maxFileSize)
}

case class GraftFilesReaderFactory(required: StructType, codec: String,
                                   confProps: Array[(String, String)],
                                   maxFileSize: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftFileReader(partition.asInstanceOf[GraftFilesPack], required,
      codec, confProps, maxFileSize)
}

/** Emits one row per file in the pack. Opens each file ONLY if `content`
  * was not pruned away — metadata-only scans do zero I/O beyond the
  * listing.
  */
class GraftFileReader(pack: GraftFilesPack, required: StructType,
                      codec: String, confProps: Array[(String, String)],
                      maxFileSize: Long)
    extends PartitionReader[InternalRow] {

  private var idx = 0
  private var row: InternalRow = _

  /** Streams the (possibly gzip) content into ONE sized buffer — the
    * gzip path decodes straight off the file stream, so the compressed
    * bytes are never buffered alongside the decompressed copy — and
    * enforces `maxFileSize` on the DECOMPRESSED size as it goes: an
    * oversized file (or a gzip bomb) fails with a clear error at the
    * bound instead of OOMing the executor after the fact.
    */
  private def readBytes(file: GraftFilePartition): Array[Byte] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val hp = new Path(new java.net.URI(file.path))
    val fs = hp.getFileSystem(conf)
    def drainGuarded(in: java.io.InputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, math.min(file.length, 1L << 20).toInt))
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > maxFileSize)
          throw new IllegalStateException(
            s"graft-files: ${file.path} exceeds maxFileSize=$maxFileSize " +
              "bytes (decompressed) — raise option(\"maxFileSize\", ...) or " +
              "exclude the file")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    }
    val in = fs.open(hp)
    val gz = codec == "gzip" || (codec == "auto" && file.path.endsWith(".gz"))
    // the gzip wrapper must itself be closed (not just the file stream):
    // its Inflater holds native memory that otherwise lingers until GC —
    // one leak per gzip file read on long-lived executors
    val stream: java.io.InputStream =
      if (gz) {
        try new GZIPInputStream(in)
        catch { case e: Throwable => in.close(); throw e }
      } else in
    try drainGuarded(stream) finally stream.close()
  }

  override def next(): Boolean =
    if (idx >= pack.files.length) false
    else {
      val file = pack.files(idx)
      val values = required.fields.map(_.name).map {
        case "path" => UTF8String.fromString(file.path)
        case "length" => file.length
        case "mtime" => file.mtimeMs * 1000L // micros
        case "content" => readBytes(file)
      }
      row = InternalRow.fromSeq(values.toIndexedSeq)
      idx += 1
      true
    }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
