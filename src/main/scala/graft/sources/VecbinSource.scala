package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Vecbin

/** DataSourceV2 for the reference's vecbin64 format — the idiomatic
  * `spark.read.format("vecbin").load(path)` surface over the same
  * byte-compatible decode as [[graft.io.Vecbin.read]] (header contract:
  * `/root/reference/include/nvdb/vecbin_format.h:7-29`; strict validation
  * `src/vector_dataset.cpp:67-70`).
  *
  * Scale design, expressed in V2 terms instead of an RDD:
  *  - `planInputPartitions` splits the dense id range into fixed-width
  *    row slices (the mmap-window analogue); each task seeks once and
  *    streams its slice sequentially.
  *  - Column pruning pushes into the reader: a query that selects only
  *    `id` never touches the payload bytes (the i8 flavor likewise skips
  *    its scale sidecar when unprojected) — the DSv2 equivalent of
  *    parquet's ReadSchema pruning, impossible to express in the RDD path.
  *  - Readers open per-partition handles closed on task completion.
  *
  * Option `partitions` (default 32) controls the split count, as in
  * [[Vecbin.read]].
  */
class VecbinSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "vecbin"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VecbinSource.schemaFor(VecbinSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new VecbinTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object VecbinSource {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "vecbin source requires a path: .load(\"/file.vecbin\")")
    p
  }

  private[sources] def schemaFor(path: String): StructType = {
    val h = Vecbin.readHeader(path)
    h.dtype match {
      case Vecbin.DtypeF32 => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
      case Vecbin.DtypeF16 => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("bits", ArrayType(ShortType, containsNull = false), nullable = false)))
      case Vecbin.DtypeI8 => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
        StructField("scale", FloatType, nullable = false)))
    }
  }
}

class VecbinTable(path: String) extends Table with SupportsRead {
  private lazy val header = Vecbin.readHeader(path)
  override def name(): String = s"vecbin:$path"
  override def schema(): StructType = VecbinSource.schemaFor(path)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VecbinScanBuilder(path, header, schema(),
      options.getInt("partitions", 32))
}

class VecbinScanBuilder(path: String, header: Vecbin.Header, full: StructType,
                        partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new VecbinScan(path, header, required, partitions)
}

/** One partition = one dense id slice [start, end). */
case class VecbinPartition(start: Long, end: Long) extends InputPartition

class VecbinScan(path: String, header: Vecbin.Header, schema: StructType,
                 partitions: Int) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"vecbin $path dtype=${header.dtype} dim=${header.dim} " +
      s"count=${header.count} cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = header.count
    val parts = math.max(1, math.min(partitions.toLong, n)).toInt
    val step = (n + parts - 1) / parts
    (0 until parts).map { p =>
      VecbinPartition(p * step, math.min((p + 1L) * step, n))
    }.filter(ip => ip.start < ip.end).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VecbinReaderFactory(path, header, schema.fieldNames)
}

class VecbinReaderFactory(path: String, header: Vecbin.Header,
                          cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[VecbinPartition]
    new VecbinPartitionReader(path, header, cols, part.start, part.end)
  }
}

/** Sequential reader over an id slice: seeks once, then streams rows.
  * Only the projected columns are decoded (or even read): an id-only scan
  * never touches the payload; an i8 scan without `scale` skips the
  * sidecar seeks.
  */
class VecbinPartitionReader(path: String, header: Vecbin.Header,
                            cols: Array[String], start: Long, end: Long)
    extends PartitionReader[InternalRow] {

  private val bpe = header.dtype match {
    case Vecbin.DtypeF32 => 4
    case Vecbin.DtypeF16 => 2
    case _ => 1
  }
  private val needPayload = cols.exists(c => c == "vec" || c == "bits" || c == "codes")
  private val rowBytes = header.dim * bpe

  private var id = start - 1
  private lazy val file = {
    val f = new java.io.RandomAccessFile(path, "r")
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => f.close()))
    f
  }
  private val rowBuf = new Array[Byte](rowBytes)
  private val scaleBuf = new Array[Byte](4)

  override def next(): Boolean = { id += 1; id < end }

  override def get(): InternalRow = {
    val values = new Array[Any](cols.length)
    var payload: java.nio.ByteBuffer = null
    if (needPayload) {
      file.seek(64L + id * rowBytes)
      file.readFully(rowBuf)
      payload = java.nio.ByteBuffer.wrap(rowBuf)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
    var i = 0
    while (i < cols.length) {
      values(i) = cols(i) match {
        case "id" => id
        case "vec" =>
          val v = new Array[Float](header.dim)
          payload.asFloatBuffer().get(v)
          new GenericArrayData(v)
        case "bits" =>
          val v = new Array[Short](header.dim)
          payload.asShortBuffer().get(v)
          new GenericArrayData(v)
        case "codes" =>
          new GenericArrayData(java.util.Arrays.copyOf(rowBuf, header.dim))
        case "scale" =>
          file.seek(64L + header.count * header.dim + id * 4L)
          file.readFully(scaleBuf)
          java.nio.ByteBuffer.wrap(scaleBuf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
      }
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
