package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-gen` — the reference engine's `memorystream` source as a real
  * DataSource V2 [[MicroBatchStream]] connector.
  *
  * The reference drives streaming from N generator functions, each pulling
  * `batchSize` records per micro-batch, forever (reference
  * datasource/memorystream/memorystream_datasource.go:10-44,
  * memorystream_datasource_partitionloader.go:24-38). Here that contract
  * is: `numPartitions` generators × `batchSize` rows per generator per
  * epoch, emitted as (part, batch, seq, v) with `v` a deterministic
  * xxhash-style mix of (part, batch, seq) — so replays of an epoch
  * reproduce the SAME rows, which is what lets the checkpoint + an
  * idempotent sink give exactly-once end-to-end (the reference offers no
  * replay determinism — generators are arbitrary closures).
  *
  * Offsets are epoch counters advanced through the admission-control
  * contract — next epoch = engine-supplied start + 1 — so the stream is
  * stateless and restart-safe (micro-batch cadence is the trigger's, as
  * in the reference's per-cycle loop, plan_executor.go:108-110).
  *
  * Usage: `spark.readStream.format("graft-gen")
  *   .option("numPartitions", 4).option("batchSize", 100).load()`.
  *
  * User generators (the reference's arbitrary-closure parity,
  * memorystream_datasource.go:10-44): register a function on the driver
  * and name it in the read —
  * {{{
  *   GraftGenSource.registerGenerator("mygen",
  *     (part, epoch, seq) => s"row-\$part-\$epoch-\$seq".getBytes)
  *   spark.readStream.format("graft-gen").option("generator", "mygen").load()
  * }}}
  * The schema becomes (part, batch, seq, payload binary). The function is
  * resolved from the registry on the DRIVER at plan time and ships with
  * the input partitions, so executors never consult the registry. Replay
  * exactly-once then depends on the USER function being deterministic in
  * (part, epoch, seq) — same contract the built-in splitmix generator
  * satisfies; a wall-clock- or RNG-dependent generator forfeits it (the
  * reference has the same caveat, it just never states it).
  */
class GraftGenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftGenTable.schemaFor(options)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftGenTable(new CaseInsensitiveStringMap(properties))
}

/** Driver-side registry of named user generators: (part, epoch, seq) →
  * payload bytes. Serializable-by-construction (Scala function literals
  * are), shipped inside [[GenPartition]]s to the executors.
  */
object GraftGenSource {
  type Generator = (Int, Long, Long) => Array[Byte]
  private val generators =
    new java.util.concurrent.ConcurrentHashMap[String, Generator]()
  def registerGenerator(name: String, f: Generator): Unit =
    generators.put(name, f)
  private[v2] def generator(name: String): Generator =
    Option(generators.get(name)).getOrElse(throw new IllegalArgumentException(
      s"graft-gen: no generator registered under '$name' — call " +
        "GraftGenSource.registerGenerator(name, f) on the driver first"))
}

object GraftGenTable {
  val SCHEMA: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("batch", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** With a user generator the value column is its payload bytes. */
  val USER_SCHEMA: StructType = StructType(Seq(
    StructField("part", IntegerType, nullable = false),
    StructField("batch", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  def schemaFor(options: CaseInsensitiveStringMap): StructType =
    if (options.containsKey("generator")) USER_SCHEMA else SCHEMA
}

class GraftGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val numPartitions = options.getInt("numPartitions", 2)
  private val batchSize = options.getInt("batchSize", 10)
  // resolve the user generator NOW, on the driver, where the registry
  // lives — the function object itself rides to executors in the plan
  private val userGen: Option[GraftGenSource.Generator] =
    Option(options.get("generator")).map(GraftGenSource.generator)
  require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
  // batchSize <= 0 would still emit one row per epoch through the reader's
  // advance-then-emit loop — reject instead of silently misbehaving
  require(batchSize > 0, s"batchSize must be positive: $batchSize")

  override def name(): String = s"graft-gen($numPartitions x $batchSize)"
  override def schema(): StructType = GraftGenTable.schemaFor(options)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftGenTable.schemaFor(options)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftGenStream(numPartitions, batchSize, userGen)
      }
    }
}

/** Epoch-counter offset. */
case class GenOffset(epoch: Long) extends Offset {
  override def json(): String = epoch.toString
}

class GraftGenStream(numPartitions: Int, batchSize: Int,
                     userGen: Option[GraftGenSource.Generator] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  // Restart safety: the engine polls for a new latest offset BEFORE any
  // checkpointed offset is handed back through deserializeOffset, so an
  // in-memory counter starting at 0 would rewind a recovered query (plan
  // a backwards (57, 1] batch, then re-emit history under NEW batchIds —
  // duplicating everything despite the idempotent sink; pinned by the
  // restart test in GraftGenSourceSpec). SupportsAdmissionControl is the
  // contract built for this: latestOffset(start, _) receives the restored
  // start offset, so the stream stays STATELESS — next epoch = start + 1,
  // whatever run this is.
  override def initialOffset(): Offset = GenOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GenOffset(start.asInstanceOf[GenOffset].epoch + 1)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")
  override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].epoch
    val e = end.asInstanceOf[GenOffset].epoch
    (0 until numPartitions)
      .map(p => GenPartition(p, s, e, batchSize, userGen): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory
}

/** One generator's rows for epochs (start, end]. `gen`, when present, is
  * the user generator resolved on the driver — it serializes with the
  * partition (Scala function literals are Serializable), so executors
  * never need the registry.
  */
case class GenPartition(part: Int, start: Long, end: Long, batchSize: Int,
                        gen: Option[GraftGenSource.Generator] = None)
    extends InputPartition

object GenReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var batch = gp.start // rows cover epochs (start, end]
      private var seq = gp.batchSize.toLong // forces first advance
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (seq + 1 >= gp.batchSize) { batch += 1; seq = -1L }
        if (batch > gp.end) false
        else {
          seq += 1
          row = gp.gen match {
            case Some(f) => InternalRow(gp.part, batch, seq, f(gp.part, batch, seq))
            case None => InternalRow(gp.part, batch, seq, mix(gp.part, batch, seq))
          }
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }

  /** Deterministic 64-bit mix (splitmix64 finalizer) — replays of an
    * epoch regenerate identical values on any executor.
    */
  private[sources] def mix(part: Int, batch: Long, seq: Long): Long = {
    var z = part.toLong * 0x9E3779B97F4A7C15L + batch * 0xBF58476D1CE4E5B9L +
      seq * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
