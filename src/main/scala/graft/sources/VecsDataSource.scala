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
abstract class VecsProviderBase(isFloat: Boolean) extends TableProvider with DataSourceRegister {
  private def elemType: DataType = if (isFloat) FloatType else IntegerType
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("row_id", LongType, nullable = false),
      StructField("vec", ArrayType(elemType, containsNull = false), nullable = false)))
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
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // DataFrameReader passes a single path as `path` and 2+ paths as a
    // JSON-encoded string array in `paths`
    val multi = Option(options.get("paths")).toSeq.flatMap { s =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(s, classOf[Array[String]]).toSeq
    }
    val paths = Option(options.get("path")).toSeq ++ multi
    new VecsScanBuilder(tableSchema, paths, isFloat)
  }
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
      val path = new Path(p)
      val fs = path.getFileSystem(hadoopConf)
      val files =
        if (fs.getFileStatus(path).isDirectory)
          fs.listStatus(path).toSeq.filter { f =>
            // skip job markers / checksums (_SUCCESS, .crc, dotfiles)
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        else Seq(fs.getFileStatus(path))
      files.sortBy(_.getPath.toString)
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

  override def next(): Boolean = {
    if (bytesRead >= p.length) return false
    val dim = readLeInt()
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
      v.foreach(f => writeLeInt(out, java.lang.Float.floatToIntBits(f)))
    } finally out.close()
  }
  def writeIvecs(path: String, rows: Iterator[Array[Int]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    try rows.foreach { v => writeLeInt(out, v.length); v.foreach(writeLeInt(out, _)) }
    finally out.close()
  }
  private def writeLeInt(out: java.io.DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
}
