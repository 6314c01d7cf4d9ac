package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 C10): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as per-partition batch transforms.
  *
  * The decode kernels are STUBBED (no image/audio libs in this
  * environment) with a clearly-marked deterministic fake; the Spark
  * plumbing — binary schema, typed Dataset transform, partition-wise
  * batching, metadata struct — is real and tested. Swapping
  * [[decodeStub]] for a JNI/OpenCV call changes no query shape.
  */
object Multimodal {
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Int,
      format: String,
      width: Int,
      height: Int,
      channels: Int)

  /** Synthesize an opaque binary payload column from text (the test
    * corpus has no real media; payload bytes are the UTF-8 text). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decode: derive deterministic fake metadata from the payload
    * bytes. A real implementation would parse the container header. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length
    val fmt = (id % 3) match {
      case 0 => "img"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(id, len, fmt, 64 + (len % 640), 64 + (len % 480),
      if (fmt == "audio") 1 else 3)
  }

  /** Typed per-partition decode pass (the mapInPandas analogue in
    * Scala): batches stay columnar until the iterator, kernels run
    * once per row without per-row task overhead. */
  def decode(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs)
      // null payloads (null-text docs: encode null-propagates) are
      // excluded, the frameRows rule — the kernel dereferences bytes
      .filter(col("payload").isNotNull)
      .select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodeStub(id, p) })
  }

  /** STUB frame sampling: pick every `stride`-th 16-byte "frame". */
  def sampleFrames(spark: SparkSession, docs: DataFrame, stride: Int = 4): DataFrame = {
    import spark.implicits._
    withPayload(docs)
      .filter(col("payload").isNotNull) // the frameRows rule
      .select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        p.grouped(16).zipWithIndex.collect {
          case (frame, i) if i % stride == 0 => (id, i, frame.length)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** STUB feature extraction: deterministic byte-histogram embedding
    * (dim buckets over byte values + byte bigrams, L2-normalized). A
    * real implementation would run a vision/audio encoder over the
    * decoded frames; the output schema (vec_id, embedding:
    * array<float>) is exactly what IVFIndex.build / KnnExact consume,
    * so swapping the encoder changes no downstream plan — this is the
    * multimodal → similarity-search bridge. */
  def featureExtract(spark: SparkSession, docs: DataFrame, dim: Int = 64): DataFrame = {
    import spark.implicits._
    withPayload(docs)
      .filter(col("payload").isNotNull) // the frameRows rule
      .select(col("doc_id").cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < p.length) {
          v((p(i) & 0xff) % dim) += 1f
          // bigram term so reorderings of the same bytes differ
          if (i > 0) v(((p(i - 1) & 0xff) * 31 + (p(i) & 0xff)) % dim) += 0.5f
          i += 1
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        (id, if (n == 0) v else v.map(x => (x / n).toFloat))
      }).toDF("vec_id", "embedding")
  }

  /** c36 query: deterministic frame sampling — the video/audio
    * "decode + frame-sample" plumbing with the decode step expressed
    * over fixed-size units of the payload (every [[stride]]-th
    * [[width]]-unit frame, each fingerprinted). Frames are CHARACTER
    * slices here so the oracle is expressible in ANSI SQL on both
    * engines (DuckDB 1.0 has no BLOB substring); the byte-frame
    * variant is [[sampleFrames]], spec-pinned. A real media decoder
    * replaces the slice with a codec call — the plan shape (scan →
    * sequence + explode → per-frame project) is exactly what ships:
    * 100% codegen, NO udf, NO shuffle — frame explosion is a narrow
    * map, so at 100 TB this runs at scan speed with output
    * partitioning inherited from the input files. Null payloads are
    * excluded (nothing to decode); empty payloads produce one empty
    * frame (the header frame a decoder would still emit). */
  def frameQuery(spark: SparkSession, docs: DataFrame,
      width: Int = 16, stride: Int = 4): DataFrame =
    frameRows(docs, width, stride).orderBy("doc_id", "frame_idx")

  /** The un-ordered frame plan shared by c36 and [[frameDedup]] (c47)
    * — the trailing orderBy is harness cosmetics c47's aggregation
    * must not inherit. */
  private def frameRows(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    // last frame index via integer arithmetic shared with the oracle:
    // ceil(len/width) - 1, floored at 0 (floor() on an exact small
    // quotient — identical in IEEE on both engines)
    val lastFrame = greatest(
      floor((length(col("text")) + lit(width - 1)) / lit(width)).cast(IntegerType) - 1,
      lit(0))
    val frame = col("text").substr(
      col("frame_idx") * lit(width) + lit(1), lit(width))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lastFrame, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(encode(frame, "UTF-8")).as("frame_md5"),
        length(frame).as("frame_len"))
  }

  /** Flag threshold for [[frameDedup]]: a doc more than half of whose
    * sampled frames are cross-doc duplicates is a re-upload/minor-edit
    * candidate. */
  val FrameDupMax = 0.5

  /** c47: cross-document FRAME dedup — the video-pipeline form of
    * c24's span dedup: a sampled-frame fingerprint held by ≥ 2
    * distinct docs marks duplicated content (re-uploads and trims
    * share frame content even when container bytes differ; frame-hash
    * dedup is the standard first pass of multimodal corpus prep). Per
    * doc with a payload: frames sampled, cross-doc-duplicated frames,
    * ratio, flag at [[FrameDupMax]].
    *
    * Scale: the frame table is c36's zero-shuffle narrow map; the dup
    * set is ONE keyed aggregation on the fingerprint (map-side
    * combined min/max — never pairwise, never a window), and the
    * count-back join is keyed on the same fingerprint. The flag
    * compares the UNROUNDED ratio (the rounded column is output
    * cosmetics), mirrored exactly by the oracle. */
  def frameDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val frames = frameRows(docs, width = 16, stride = 4)
      .select(col("doc_id"), col("frame_md5"))
    val dup = frames.groupBy("frame_md5")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") < col("mx"))
      .select(col("frame_md5"), lit(1).as("is_dup"))
    frames.join(dup, Seq("frame_md5"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(IntegerType).as("n_frames"),
        sum(coalesce(col("is_dup"), lit(0))).cast(IntegerType).as("n_dup_frames"))
      .withColumn("dup_frame_ratio",
        round(col("n_dup_frames").cast(DoubleType) / col("n_frames"), 6))
      .withColumn("flagged",
        (col("n_dup_frames").cast(DoubleType) / col("n_frames") > FrameDupMax)
          .cast(IntegerType))
      .select("doc_id", "n_frames", "n_dup_frames", "dup_frame_ratio", "flagged")
      .orderBy("doc_id")
  }

  /** c10 query: binary plumbing with SQL-checkable outputs (payload
    * length, md5, stub metadata — all deterministic). */
  def metaQuery(spark: SparkSession, docs: DataFrame): DataFrame =
    withPayload(docs).select(
        col("doc_id"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("payload_md5"),
        (lit(64) + length(col("payload")) % 640).as("width"),
        (lit(64) + length(col("payload")) % 480).as("height"))
      .orderBy("doc_id")
}
