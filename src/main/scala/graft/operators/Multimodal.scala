package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The Spark-side shape is real and tested — schema, partitioning, the
  * batched `mapPartitions` stage (Scala's analog of a pandas-batch UDF: one
  * iterator per partition, so per-partition codec state is amortized across
  * rows). The codec itself is a clearly-marked STUB: this container has no
  * image/audio libraries, so `stubDecode` derives deterministic fake features
  * from the bytes. Swapping in a real decoder changes only that function.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      checksum: Long, features: Array[Float])

  /** Deterministic media table derived from documents: payload = UTF-8 bytes
    * of the text, kind round-robins image/audio/video. Stands in for a real
    * parquet-of-blobs table; schema and scale behavior are identical.
    */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — a real implementation would hand `payload` to an image/
    * audio codec here (per-partition init, batch decode). The fake is
    * deterministic: byte count, a rolling checksum, and the first 16 bytes
    * scaled to floats stand in for decoded features/embeddings.
    */
  def stubDecode(m: MediaRow): MediaFeatures = {
    var checksum = 1469598103934665603L // FNV offset basis
    var i = 0
    while (i < m.payload.length) {
      checksum = (checksum ^ (m.payload(i) & 0xFF)) * 1099511628211L
      i += 1
    }
    val features = Array.tabulate(math.min(16, m.payload.length)) { j =>
      (m.payload(j) & 0xFF) / 255.0f
    }
    MediaFeatures(m.doc_id, m.kind, m.payload.length, checksum, features)
  }

  /** Batched decode stage: one partition = one codec session. */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codec init would happen once per partition here
      rows.map(stubDecode)
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload (the
    * video-frame analog). Pure column expressions — no UDF.
    */
  def frameSample(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media.select(col("doc_id"), col("kind"),
      filter(
        transform(
          sequence(lit(0), greatest((length(col("payload")) / chunkBytes).cast("int") - 1, lit(0))),
          i => substring(col("payload"), (i * chunkBytes + 1).cast("int"), lit(chunkBytes))),
        (_, i) => i % stride === 0).as("frames"))

  /** "Resize": clamp payloads to `targetBytes` (truncate; right-pad with
    * zero bytes when shorter) and record the original size in metadata —
    * the byte-level shape of a real resize/transcode stage.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame =
    media.select(col("doc_id"), col("kind"),
      length(col("payload")).as("orig_bytes"),
      rpad(substring(col("payload"), 1, targetBytes), targetBytes, Array[Byte](0)).as("payload"))
}
