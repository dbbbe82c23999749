package graft.io

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Byte-compatible reader/writer for the reference's on-disk formats
  * (S2/S5/S6/S7): vecbin64 (`/root/reference/include/nvdb/
  * vecbin_format.h:7-29` — 64-byte packed little-endian header
  * {magic 'NVDBVEC1', version=1, dtype, dim, reserved, count} + payload,
  * int8 payload followed by per-row float scales) and gtbin
  * (`include/nvdb/gtbin_format.h:8-35` — {magic 'NVDBGT01', version,
  * metric, k, dim, Q, N} + uint32 ids[Q*k]).
  *
  * A user migrating from the reference can ingest their existing files
  * directly; everything downstream consumes the same columns the Parquet
  * loaders produce.
  *
  * Scale shape: rows are fixed-width, so the read distributes as id-range
  * partitions, each task seeking to its offset and streaming sequentially
  * — the Spark analogue of the reference's mmap windows. The writers are
  * single-file export utilities (the reference's files are single-node
  * artifacts); they stream via toLocalIterator and never hold the table
  * in driver memory.
  *
  * Strict validation mirrors `src/vector_dataset.cpp:67-70`: magic,
  * version, dtype, and exact file size.
  */
object Vecbin {

  val MagicVec = 0x4E56444256454331L // "NVDBVEC1" (LE on disk)
  val MagicGt = 0x4E56444247543031L // "NVDBGT01"
  val DtypeF32 = 1
  val DtypeF16 = 2
  val DtypeI8 = 3

  final case class Header(dtype: Int, dim: Int, count: Long)

  /** Open the partition's file handle with a task-completion close: a
    * partially consumed iterator (limit/take/failed task) never drains
    * `hasNext`, so a drain-time close alone would leak the handle until GC.
    * The drain-time close stays as the fast path; close() is idempotent.
    */
  private def openPartitionFile(path: String): RandomAccessFile = {
    val f = new RandomAccessFile(path, "r")
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => f.close()))
    f
  }

  private def bytesPerElem(dtype: Int): Int = dtype match {
    case DtypeF32 => 4
    case DtypeF16 => 2
    case DtypeI8 => 1
    case d => throw new IllegalArgumentException(s"unsupported dtype $d")
  }

  def readHeader(path: String): Header = {
    val f = new RandomAccessFile(path, "r")
    try {
      val buf = new Array[Byte](64)
      f.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val magic = bb.getLong
      require(magic == MagicVec, f"bad magic 0x$magic%016x")
      val version = bb.getInt
      require(version == 1, s"unsupported version $version")
      val dtype = bb.getInt
      val dim = bb.getInt
      bb.getInt // reserved0
      val count = bb.getLong
      val expected = 64L + count * dim * bytesPerElem(dtype) +
        (if (dtype == DtypeI8) count * 4L else 0L)
      require(f.length() == expected,
        s"size mismatch: file ${f.length()} != expected $expected")
      Header(dtype, dim, count)
    } finally f.close()
  }

  /** Distributed read: (id, vec) for f32, (id, bits) for f16,
    * (id, codes, scale) for i8 — the same column shapes the engine's
    * Parquet tables use.
    */
  def read(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    val h = readHeader(path)
    val bpe = bytesPerElem(h.dtype)
    val dim = h.dim
    val dtype = h.dtype
    val count = h.count
    val schema = dtype match {
      case DtypeF32 => StructType(Seq(StructField("id", LongType, false),
        StructField("vec", ArrayType(FloatType, false), false)))
      case DtypeF16 => StructType(Seq(StructField("id", LongType, false),
        StructField("bits", ArrayType(ShortType, false), false)))
      case DtypeI8 => StructType(Seq(StructField("id", LongType, false),
        StructField("codes", ArrayType(ByteType, false), false),
        StructField("scale", FloatType, false)))
    }
    val rows = spark.range(0, count, 1, math.min(partitions, math.max(count, 1)).toInt)
      .rdd.mapPartitions { ids =>
        val f = openPartitionFile(path)
        val rowBuf = new Array[Byte](dim * bpe)
        val it = ids.map { id =>
          f.seek(64L + id * dim * bpe)
          f.readFully(rowBuf)
          val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
          dtype match {
            case DtypeF32 =>
              val v = new Array[Float](dim)
              bb.asFloatBuffer().get(v)
              Row(id, v.toSeq)
            case DtypeF16 =>
              val v = new Array[Short](dim)
              bb.asShortBuffer().get(v)
              Row(id, v.toSeq)
            case DtypeI8 =>
              val codes = java.util.Arrays.copyOf(rowBuf, dim)
              f.seek(64L + count * dim + id * 4L)
              val sb = new Array[Byte](4)
              f.readFully(sb)
              val scale = ByteBuffer.wrap(sb).order(ByteOrder.LITTLE_ENDIAN).getFloat
              Row(id, codes.toSeq, scale)
          }
        }
        new Iterator[Row] { // close the file when the partition drains
          def hasNext: Boolean = { val h = it.hasNext; if (!h) f.close(); h }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def writeHeader(f: java.io.DataOutputStream, dtype: Int, dim: Int,
                          count: Long): Unit = {
    val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(MagicVec).putInt(1).putInt(dtype).putInt(dim).putInt(0).putLong(count)
    f.write(bb.array())
  }

  /** Default row cap for the single-file exporters. */
  val DefaultMaxExportRows: Long = 10000000L

  /** Driver-bottleneck guard for the single-file exporters: they funnel
    * the whole table through one `toLocalIterator` — byte-compatible
    * tooling parity with the reference's files, NOT a scale path. Pointing
    * one at a big table silently serializes the cluster through the
    * driver, so beyond the cap this refuses loudly. The 100 TB paths are
    * parquet ([[graft.io.QuantizedTables]]) or, for a deliberate large
    * export, raising `graft.vecbin.maxExportRows`.
    */
  private def guardExport(count: Long, path: String): Unit = {
    val cap = sys.props.get("graft.vecbin.maxExportRows").map(_.toLong)
      .getOrElse(DefaultMaxExportRows)
    require(count <= cap,
      s"single-file export of $count rows to $path exceeds the driver-side " +
        s"cap of $cap. This writer streams every row through the driver — " +
        "use the parquet path for large tables, or raise the " +
        "graft.vecbin.maxExportRows system property for a deliberate export.")
  }

  /** Single-file export (id-ordered). `df` columns per dtype as in [[read]].
    * Int8 scales stream to a sidecar buffer then append (4 bytes/row).
    */
  def write(df: DataFrame, path: String, dtype: Int): Unit = {
    val dim = dtype match {
      case DtypeI8 => df.selectExpr("size(codes)").head().getInt(0)
      case DtypeF16 => df.selectExpr("size(bits)").head().getInt(0)
      case _ => df.selectExpr("size(vec)").head().getInt(0)
    }
    val count = df.count()
    guardExport(count, path)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try {
      writeHeader(out, dtype, dim, count)
      val sorted = df.orderBy("id")
      val scales = new java.io.ByteArrayOutputStream()
      val it = sorted.toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val bb = ByteBuffer.allocate(dim * bytesPerElem(dtype))
          .order(ByteOrder.LITTLE_ENDIAN)
        dtype match {
          case DtypeF32 => r.getSeq[Float](1).foreach(bb.putFloat)
          case DtypeF16 => r.getSeq[Short](1).foreach(bb.putShort)
          case DtypeI8 =>
            r.getSeq[Byte](1).foreach(bb.put)
            val sb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
              .putFloat(r.getFloat(2))
            scales.write(sb.array())
        }
        out.write(bb.array())
      }
      if (dtype == DtypeI8) out.write(scales.toByteArray)
    } finally out.close()
  }

  /** Legacy raw12 reader (`src/vector_dataset.cpp:10-22,97-118`):
    * {u32 count, u32 reserved, u32 dim} little-endian + f32 payload.
    * Same distributed id-range read as vecbin64.
    */
  def readRaw12(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    val f = new RandomAccessFile(path, "r")
    val (count, dim) = try {
      val buf = new Array[Byte](12)
      f.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val count = bb.getInt.toLong & 0xffffffffL
      bb.getInt // reserved
      val dim = bb.getInt
      require(dim > 0, s"bad raw12 dim $dim")
      require(f.length() == 12L + count * dim * 4L,
        s"raw12 size mismatch: ${f.length()} != ${12L + count * dim * 4L}")
      (count, dim)
    } finally f.close()
    val rows = spark.range(0, count, 1, math.min(partitions.toLong, math.max(count, 1)).toInt)
      .rdd.mapPartitions { ids =>
        val fi = openPartitionFile(path)
        val rowBuf = new Array[Byte](dim * 4)
        val it = ids.map { id =>
          fi.seek(12L + id * dim * 4L)
          fi.readFully(rowBuf)
          val v = new Array[Float](dim)
          ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer().get(v)
          Row(id, v.toSeq)
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) fi.close(); h }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, false),
      StructField("vec", ArrayType(FloatType, false), false))))
  }

  /** raw12 export (single-file, id-ordered). */
  def writeRaw12(df: DataFrame, path: String): Unit = {
    val dim = df.selectExpr("size(vec)").head().getInt(0)
    val count = df.count()
    guardExport(count, path)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try {
      // the header count is u32 — mirror readRaw12's strict validation
      // instead of silently truncating a >2^32-row table into a corrupt file
      require(count <= 0xffffffffL,
        s"raw12 count field is u32; table has $count rows")
      val hb = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      hb.putInt(count.toInt).putInt(0).putInt(dim)
      out.write(hb.array())
      val it = df.orderBy("id").toLocalIterator()
      while (it.hasNext) {
        val bb = ByteBuffer.allocate(dim * 4).order(ByteOrder.LITTLE_ENDIAN)
        it.next().getSeq[Float](1).foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }

  // ---- gtbin ----

  final case class GtHeader(metric: Int, k: Int, dim: Int, q: Long, n: Long)

  /** Read gtbin → (qid, gt_ids) with full header validation. */
  def readGt(spark: SparkSession, path: String): DataFrame = {
    val f = new RandomAccessFile(path, "r")
    val h = try {
      val buf = new Array[Byte](64)
      f.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      require(bb.getLong == MagicGt, "bad gtbin magic")
      require(bb.getInt == 1, "unsupported gtbin version")
      val metric = bb.getInt
      val k = bb.getInt
      val dim = bb.getInt
      val q = bb.getLong
      val n = bb.getLong
      require(f.length() == 64L + q * k * 4L,
        s"gtbin size mismatch: ${f.length()} != ${64L + q * k * 4L}")
      GtHeader(metric, k, dim, q, n)
    } finally f.close()
    val k = h.k
    val rows = spark.range(0, h.q, 1, 8).rdd.mapPartitions { qids =>
      val fi = openPartitionFile(path)
      val buf = new Array[Byte](k * 4)
      val it = qids.map { q =>
        fi.seek(64L + q * k * 4L)
        fi.readFully(buf)
        val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        Row(q, (0 until k).map(_ => bb.getInt.toLong & 0xffffffffL))
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h2 = it.hasNext; if (!h2) fi.close(); h2 }
        def next(): Row = it.next()
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("qid", LongType, false),
      StructField("gt_ids", ArrayType(LongType, false), false))))
  }

  /** Write (qid, gt_ids) → gtbin (metric 1 = DotEquivalentL2). */
  def writeGt(gt: DataFrame, path: String, k: Int, dim: Int,
              nBase: Long, metric: Int = 1): Unit = {
    graft.ops.Search.requireGroundTruth(gt, k)
    val q = gt.count()
    guardExport(q, path)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 20))
    try {
      val bb = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(MagicGt).putInt(1).putInt(metric).putInt(k).putInt(dim)
        .putLong(q).putLong(nBase)
      out.write(bb.array())
      val it = gt.orderBy("qid").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val ids = r.getSeq[Long](1)
        val rb = ByteBuffer.allocate(k * 4).order(ByteOrder.LITTLE_ENDIAN)
        ids.foreach(id => rb.putInt(id.toInt))
        out.write(rb.array())
      }
    } finally out.close()
  }
}
