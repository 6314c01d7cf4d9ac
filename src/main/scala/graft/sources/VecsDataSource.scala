package graft.sources

import java.io.DataInputStream
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Spark DataSource V2 for the reference's native vector file formats
  * (fvecs / ivecs: repeated `[int32 dim][dim × {float32|int32}]`
  * little-endian records; see /root/reference/python/utils/io.py and
  * /root/reference/inc/utils/IO.hpp load_vecs).
  *
  * Usage: `spark.read.format("fvecs").load(path)` →
  * `(file string, row_id bigint, vec array<float>)` (ivecs →
  * array<int>). `row_id` is the record index *within its file*; the
  * stable vector identity across a multi-file corpus is (file, row_id).
  * One InputPartition per file; a vector corpus at scale is stored as
  * many files, so parallelism follows the file layout.
  */
/** Path handling shared by every vector-file source in this package. */
private[sources] object VecsFiles {
  /** DataFrameReader passes a single path as `path` and 2+ paths as a
    * JSON-encoded string array in `paths`. */
  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { s =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(s, classOf[Array[String]]).toSeq
    }
    Option(options.get("path")).toSeq ++ multi
  }

  /** THE (file, row_id, vec) schema of every vector source — one
    * definition for the fvecs/ivecs and fbin/ibin families, so a
    * schema evolution can never make them silently disagree. */
  def vecSchema(isFloat: Boolean): StructType =
    StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("vec", ArrayType(if (isFloat) FloatType else IntegerType,
        containsNull = false), nullable = false)))

  /** Expand a file-or-directory path to its data files, RECURSIVELY
    * (per-shard subdirectory layouts are the norm for multi-TB vector
    * corpora — a one-level listing would silently return a subset),
    * skipping job markers / checksums (_SUCCESS, .crc, dotfiles) and
    * any subtree under a skipped directory name, sorted by path. */
  def listDataFiles(
      hadoopConf: org.apache.hadoop.conf.Configuration,
      p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val path = new Path(p)
    val fs = path.getFileSystem(hadoopConf)
    def skip(n: String): Boolean = n.startsWith("_") || n.startsWith(".")
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filterNot(c => skip(c.getPath.getName)).flatMap(walk)
      else Seq(st)
    val root = fs.getFileStatus(path)
    walk(root).sortBy(_.getPath.toString)
  }
}

abstract class VecsProviderBase(isFloat: Boolean) extends TableProvider with DataSourceRegister {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VecsFiles.vecSchema(isFloat)
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new VecsTable(schema, properties.asScala.toMap, isFloat, shortName())
}

class FvecsProvider extends VecsProviderBase(isFloat = true) {
  override def shortName(): String = "fvecs"
}
class IvecsProvider extends VecsProviderBase(isFloat = false) {
  override def shortName(): String = "ivecs"
}

class VecsTable(tableSchema: StructType, props: Map[String, String], isFloat: Boolean, fmt: String)
    extends Table with SupportsRead {
  override def name(): String = s"$fmt(${props.getOrElse("path", "")})"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VecsScanBuilder(tableSchema, VecsFiles.resolvePaths(options), isFloat)
  override def schema(): StructType = tableSchema // columns() derives from this
}

class VecsScanBuilder(schema: StructType, paths: Seq[String], isFloat: Boolean)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hadoopConf = spark.sessionState.newHadoopConf()
    paths.flatMap { p =>
      VecsFiles.listDataFiles(hadoopConf, p)
        .map(f => VecsPartition(f.getPath.toString, f.getLen): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    new VecsReaderFactory(isFloat, conf)
  }
}

case class VecsPartition(file: String, length: Long) extends InputPartition

class VecsReaderFactory(isFloat: Boolean, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VecsPartition]
    new VecsPartitionReader(p, isFloat, conf)
  }
}

class VecsPartitionReader(p: VecsPartition, isFloat: Boolean, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(p.file)
  private val in: DataInputStream = new DataInputStream(
    new java.io.BufferedInputStream(path.getFileSystem(conf.value).open(path), 1 << 16))
  private val fileName = org.apache.spark.unsafe.types.UTF8String.fromString(p.file)
  private var bytesRead = 0L
  private var rowId = -1L
  private var current: InternalRow = _

  /** Read one record's payload into a little-endian buffer. */
  private def readRecord(dim: Int): java.nio.ByteBuffer = {
    val buf = new Array[Byte](dim * 4)
    in.readFully(buf)
    bytesRead += buf.length
    java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
  }

  private def readLeInt(): Int = {
    val b0 = in.read(); val b1 = in.read(); val b2 = in.read(); val b3 = in.read()
    if ((b0 | b1 | b2 | b3) < 0) throw new java.io.EOFException()
    bytesRead += 4
    (b3 << 24) | (b2 << 16) | (b1 << 8) | b0
  }

  /** Loud ceiling on a single record's dim: a negative or absurd value
    * means the file is not in this format (e.g. an .fbin count header
    * read as an fvecs dim, or a truncated record) — fail with the file
    * named instead of NegativeArraySizeException / a multi-GB alloc. */
  private val MaxDim = 1 << 20

  override def next(): Boolean = {
    if (bytesRead >= p.length) return false
    val dim = readLeInt()
    if (dim <= 0 || dim > MaxDim)
      throw new java.io.IOException(
        s"${p.file}: record dim $dim at offset ${bytesRead - 4} is outside " +
          s"(0, $MaxDim] — not a valid fvecs/ivecs stream (an .fbin/.ibin " +
          "file read as fvecs shows up exactly like this)")
    rowId += 1
    val bb = readRecord(dim)
    if (isFloat) {
      val arr = new Array[Float](dim)
      var i = 0
      while (i < dim) { arr(i) = bb.getFloat(); i += 1 }
      current = InternalRow(fileName, rowId, ArrayData.toArrayData(arr))
    } else {
      val arr = new Array[Int](dim)
      var i = 0
      while (i < dim) { arr(i) = bb.getInt(); i += 1 }
      current = InternalRow(fileName, rowId, ArrayData.toArrayData(arr))
    }
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---------------------------------------------------------------------------
// fbin / ibin: the big-ANN distribution format — one [int32 n][int32 d]
// header, then n·d little-endian elements row-major
// (/root/reference/python/utils/io.py:33-41 read_ibin/read_fbin).
// Unlike fvecs (per-record dim prefix), rows have a FIXED stride, so a
// single huge file splits into row-range partitions: at 100 TB a corpus
// shipped as a handful of giant .fbin files still scans with full
// cluster parallelism. Split size follows spark.sql.files
// .maxPartitionBytes (override per-read with option("splitBytes", n)).
// ---------------------------------------------------------------------------

abstract class BinProviderBase(isFloat: Boolean) extends TableProvider with DataSourceRegister {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VecsFiles.vecSchema(isFloat)
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new BinTable(schema, properties.asScala.toMap, isFloat, shortName())
}

class FbinProvider extends BinProviderBase(isFloat = true) {
  override def shortName(): String = "fbin"
}
class IbinProvider extends BinProviderBase(isFloat = false) {
  override def shortName(): String = "ibin"
}

class BinTable(tableSchema: StructType, props: Map[String, String], isFloat: Boolean, fmt: String)
    extends Table with SupportsRead {
  override def name(): String = s"$fmt(${props.getOrElse("path", "")})"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = org.apache.spark.sql.SparkSession.active
    val splitBytes = Option(options.get("splitBytes")).map(_.toLong)
      .getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
    new BinScanBuilder(tableSchema, VecsFiles.resolvePaths(options), isFloat,
      math.max(1L, splitBytes))
  }
  override def schema(): StructType = tableSchema
}

class BinScanBuilder(schema: StructType, paths: Seq[String], isFloat: Boolean, splitBytes: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hadoopConf = spark.sessionState.newHadoopConf()
    paths.flatMap { p =>
      VecsFiles.listDataFiles(hadoopConf, p).flatMap { f =>
        // read the tiny header on the driver to plan row-range splits
        val fs = f.getPath.getFileSystem(hadoopConf)
        val in = fs.open(f.getPath)
        val (n, d) =
          try {
            val b = new Array[Byte](8)
            in.readFully(0L, b)
            val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            (bb.getInt(), bb.getInt())
          } finally in.close()
        // bound d the way the fvecs reader bounds per-record dims
        // (MaxDim rule): a huge header dim means this is NOT an
        // fbin/ibin file (e.g. an fvecs file read as fbin — its first
        // 8 bytes are [dim][float-bits], so "n" is small but "d" is a
        // float's bit pattern ~1e9, which would overflow the Int
        // buffer size dim*4 on the executor); fail here with the file
        // named. Also cross-check the advertised size against the
        // actual file length so a truncated file fails at plan time.
        require(n >= 0 && (n == 0 || (d > 0 && d <= (1 << 20))),
          s"${f.getPath}: invalid fbin/ibin header (n=$n, d=$d) — dim must " +
            s"be in (0, ${1 << 20}] (an fvecs/ivecs file read as fbin/ibin " +
            "shows up exactly like this)")
        require(n == 0 || 8L + n.toLong * d.toLong * 4L <= f.getLen,
          s"${f.getPath}: header advertises n=$n rows of dim $d " +
            s"(${8L + n.toLong * d.toLong * 4L} bytes) but the file is " +
            s"${f.getLen} bytes — truncated or not fbin/ibin")
        if (n == 0) Seq.empty
        else {
          val rowBytes = d.toLong * 4
          val rowsPerSplit = math.max(1L, splitBytes / rowBytes)
          (0L until n.toLong by rowsPerSplit).map { start =>
            BinPartition(f.getPath.toString, d, start,
              math.min(rowsPerSplit, n - start)): InputPartition
          }
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    new BinReaderFactory(isFloat, conf)
  }
}

/** One row-range of one fbin/ibin file: rows [rowStart, rowStart+rowCount). */
case class BinPartition(file: String, dim: Int, rowStart: Long, rowCount: Long)
    extends InputPartition

class BinReaderFactory(isFloat: Boolean, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BinPartitionReader(partition.asInstanceOf[BinPartition], isFloat, conf)
}

class BinPartitionReader(p: BinPartition, isFloat: Boolean, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val path = new Path(p.file)
  private val stream = path.getFileSystem(conf.value).open(path)
  // a seek past EOF (truncated file, stale plan) throws DURING
  // construction — close the just-opened stream on the way out, or
  // the descriptor leaks once per failed partition × task retries
  // (PartitionReader.close() is never called on a half-built reader)
  try stream.seek(8L + p.rowStart * p.dim * 4L)
  catch { case e: Throwable => stream.close(); throw e }
  private val in = new DataInputStream(new java.io.BufferedInputStream(stream, 1 << 16))
  private val fileName = org.apache.spark.unsafe.types.UTF8String.fromString(p.file)
  private var produced = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (produced >= p.rowCount) return false
    val buf = new Array[Byte](p.dim * 4)
    in.readFully(buf)
    val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rowId = p.rowStart + produced
    current =
      if (isFloat) {
        val arr = new Array[Float](p.dim)
        var i = 0
        while (i < p.dim) { arr(i) = bb.getFloat(); i += 1 }
        InternalRow(fileName, rowId, ArrayData.toArrayData(arr))
      } else {
        val arr = new Array[Int](p.dim)
        var i = 0
        while (i < p.dim) { arr(i) = bb.getInt(); i += 1 }
        InternalRow(fileName, rowId, ArrayData.toArrayData(arr))
      }
    produced += 1
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

/** Driver-side writers for small outputs (queries, ground truth) in
  * the reference's formats — the counterparts of python write_fvecs /
  * write_ivecs — plus a DataFrame exporter (cvt_data.py's conversion
  * role). */
object VecsIO {
  /** Export a vector column to one local fvecs file, ordered by
    * `idCol` (driver-side: intended for query sets / ground truth /
    * sampled corpora, like the reference's conversion scripts). */
  def exportFvecs(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(idCol), col(vecCol)).orderBy(idCol)
      .collect().iterator
      .map(r => r.getSeq[Float](1).toArray)
    writeFvecs(path, rows)
  }

  def writeFvecs(path: String, rows: Iterator[Array[Float]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try rows.foreach { v =>
      writeLeInt(out, v.length)
      // raw bits: a non-canonical NaN payload must roundtrip bit-exact
      v.foreach(f => writeLeInt(out, java.lang.Float.floatToRawIntBits(f)))
    } finally out.close()
  }
  def writeIvecs(path: String, rows: Iterator[Array[Int]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try rows.foreach { v => writeLeInt(out, v.length); v.foreach(writeLeInt(out, _)) }
    finally out.close()
  }
  /** Export a vector column to one local fbin file (io.py write
    * counterpart of read_fbin), ordered by `idCol`. */
  def exportFbin(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(idCol), col(vecCol)).orderBy(idCol)
      .collect().map(r => r.getSeq[Float](1).toArray)
    writeFbin(path, rows.toSeq)
  }

  // header + streamed rows — no intermediate copy of the payload
  def writeFbin(path: String, rows: Seq[Array[Float]]): Unit =
    withBinHeader(path, rows.map(_.length)) { out =>
      // raw bits: non-canonical NaN payloads must roundtrip bit-exact
      rows.foreach(_.foreach(f => writeLeInt(out, java.lang.Float.floatToRawIntBits(f))))
    }

  def writeIbin(path: String, rows: Seq[Array[Int]]): Unit =
    withBinHeader(path, rows.map(_.length))(out =>
      rows.foreach(_.foreach(writeLeInt(out, _))))

  private def withBinHeader(path: String, lengths: Seq[Int])(
      body: java.io.DataOutputStream => Unit): Unit = {
    val d = lengths.headOption.getOrElse(0)
    require(lengths.forall(_ == d), "fbin/ibin rows must share one dimension")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try { writeLeInt(out, lengths.length); writeLeInt(out, d); body(out) } finally out.close()
  }

  private def writeLeInt(out: java.io.DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
