package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: images/audio/video
  * travel as opaque `binary` columns with typed metadata, and per-record
  * operations (decode, feature-extract, resize, frame-sample) run as
  * partition-batched functions over typed Datasets.
  *
  * The actual codec step is STUBBED ([[StubDecoder]] — the container has no
  * image/audio libraries); everything around it is real and tested: the
  * schema contract, the partition-batched execution shape (expensive
  * decoder init amortized once per partition — the pattern a JNI/FFmpeg
  * binding needs), deterministic outputs, and the binary-column plumbing.
  * Swapping in a real decoder changes one constructor.
  *
  * Scale notes: binary payloads ride the scan partition; nothing here
  * shuffles. `spark.sql.files.maxPartitionBytes` should be sized down when
  * payloads are large (a 128 MB split of 5 MB images is ~25 records — fine;
  * the risk is row-group skew, mitigated by writing media tables with
  * smaller row groups).
  */
object Multimodal {

  /** A media record: id + raw bytes + declared kind ("image"|"audio"|…). */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, duration_ms: Long,
                           fingerprint: String)

  /** Decoder contract: one instance per partition (init may be expensive). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in for the codec: derives fake dimensions from the
    * md5 of the byte content (stable across runs/JVMs, and reproducible in
    * SQL on any engine with an md5 function — which is what lets the
    * driver's DuckDB oracle hash-check this path instead of a rows-only
    * check). A real implementation would parse the container header
    * instead — the call shape is identical. The digest instance is the
    * "expensive per-partition init" stand-in: built once per partition
    * (transient — never serialized from the driver), reused per record.
    */
  final class StubDecoder extends MediaDecoder {
    @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
    override def decode(r: MediaRecord): MediaFeatures = {
      md.reset()
      val fp = md.digest(r.bytes).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(fp.substring(0, 15), 16) // 60-bit positive
      MediaFeatures(r.media_id, r.kind, r.bytes.length,
        width = (h % 1920).toInt + 1,
        height = ((h >> 11) % 1080).toInt + 1,
        duration_ms = if (r.kind == "image") 0L else (h % 600000L),
        fingerprint = fp)
    }
  }

  /** Partition-batched decode: decoder constructed once per partition, then
    * streamed over the iterator (no per-row init, no driver collect).
    */
  def decodeFeatures(media: Dataset[MediaRecord],
                     mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      val decoder = mkDecoder() // once per partition — amortized heavy init
      it.map(decoder.decode)
    }(Encoders.product[MediaFeatures])

  /** Deterministic frame sampling: pick every `stride`-th byte offset as a
    * stand-in for keyframe selection; emits (media_id, frame_no, offset).
    * Real video sampling swaps the offset computation for codec keyframes —
    * the explode/partition shape is the same.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    val df = media.toDF()
    // zero-byte payloads sample no frames (sequence(0, -1) would count
    // DOWN in Spark and a bare greatest() guard emitted a phantom frame
    // at offset 0 for empty media)
    val offsets = when(length(col("bytes")) > 0,
      sequence(lit(0), length(col("bytes")) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col("media_id"), posexplode(offsets))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "byte_offset")
  }

  /** Column-level binary feature extraction (codegen'd built-ins — no UDF):
    * byte length, 8-byte header fingerprint, content hash. This is the
    * cheap metadata pass that runs before any decode at 100 TB.
    */
  def binaryStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)))
      .withColumn("header_hex", lower(substring(hex(col(binCol)), 1, 16)))
      .withColumn("content_md5", md5(col(binCol)))

  /** Aspect-preserving resize planning over a decoded-features table: fit
    * each record into a `boxW`×`boxH` box without upscaling, emitting the
    * scale factor, output dimensions, and the estimated RGB byte size.
    * This is the bookkeeping half of a resize stage — pure codegen'd
    * arithmetic (double divide/multiply + floor, IEEE-identical across
    * engines); the byte-level resample itself belongs to the (stubbed)
    * decoder. At 100 TB this plan drives batch sizing and storage
    * budgeting before any pixel is touched.
    */
  def resizePlan(features: DataFrame, boxW: Int, boxH: Int): DataFrame = {
    val scale = least(least(
      lit(boxW).cast("double") / col("width"),
      lit(boxH).cast("double") / col("height")), lit(1.0))
    features
      .withColumn("scale", scale)
      .withColumn("out_width",
        greatest(lit(1), floor(col("width") * col("scale")).cast("int")))
      .withColumn("out_height",
        greatest(lit(1), floor(col("height") * col("scale")).cast("int")))
      .withColumn("est_out_bytes",
        col("out_width").cast("long") * col("out_height") * lit(3L))
  }
}
