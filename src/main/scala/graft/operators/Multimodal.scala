package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs batched per partition.
  *
  * The real decode step is STUBBED by design — image/audio codecs are not
  * in this environment — with a deterministic fake (md5-derived bytes +
  * byte-level features), so the Spark-side contract (schema, partitioning,
  * batch shape) is real and tested while the codec is swappable.
  */
object Multimodal {

  /** Typed metadata record for one media payload. */
  final case class MediaMeta(
      doc_id: Long,
      mime: String,
      width: Long,
      height: Long,
      n_bytes: Int,
      byte0: Int)

  /** Attach a deterministic fake payload + metadata to each document:
    * payload = unhex(md5(text)) (16 opaque bytes), dimensions derived
    * from n_chars. At scale this column would come straight from the
    * source parquet/lance files — everything downstream only assumes
    * (binary, metadata struct).
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", unhex(md5(col("text"))))
      .withColumn("mime",
        expr("element_at(array('image/png', 'audio/wav', 'video/mp4'), CAST(doc_id % 3 AS INT) + 1)"))
      .withColumn("width", lit(16L) + col("n_chars") % 64)
      .withColumn("height", lit(16L) + floor(col("n_chars") / lit(64.0)).cast("long") % 64)

  /** Expression-only metadata extraction (codegen'd; oracle-checkable). */
  def meta(documents: DataFrame): DataFrame =
    withPayload(documents).select(
      col("doc_id"), col("mime"), col("width"), col("height"),
      length(col("payload")).as("n_bytes"),
      expr("CAST(conv(substring(md5(text), 1, 2), 16, 10) AS INT)").as("byte0"),
      md5(col("text")).as("checksum"))

  /** Frame sampling for video payloads: every `stride`-th frame index up
    * to the (metadata-derived) frame count, one output row per sampled
    * frame with a deterministic stub frame fingerprint. This is the
    * explode-shaped plumbing a real pipeline runs before per-frame
    * feature extraction — the row multiplication, partitioning, and
    * per-frame identity are real; only the fingerprint is the stub a
    * codec would replace.
    */
  def frameSample(documents: DataFrame, stride: Int): DataFrame =
    withPayload(documents)
      .filter(col("mime") === "video/mp4")
      .withColumn("n_frames", lit(8L) + col("n_chars") % 16)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))))
      .select(
        col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat(md5(col("text")), lit(":"), col("frame_idx").cast("string")))
          .as("frame_md5"))

  /** Resize planning for image payloads: clamp each image into a
    * max-dimension box preserving aspect ratio — the exact integer
    * geometry (scaled dims, scale numerator/denominator, skip flag) a
    * batched resampling kernel consumes. All the decision logic is
    * engine-checkable arithmetic; only the pixel resample itself is the
    * stubbed codec step (out_md5 stands in for the resized payload).
    */
  def resizePlan(documents: DataFrame, maxDim: Long): DataFrame =
    withPayload(documents)
      .filter(col("mime") === "image/png")
      .withColumn("__long", greatest(col("width"), col("height")))
      .withColumn("needs_resize", col("__long") > maxDim)
      .withColumn("out_width",
        when(col("needs_resize"),
          floor((col("width") * maxDim).cast("double") / col("__long").cast("double"))
            .cast("long"))
          .otherwise(col("width")))
      .withColumn("out_height",
        when(col("needs_resize"),
          floor((col("height") * maxDim).cast("double") / col("__long").cast("double"))
            .cast("long"))
          .otherwise(col("height")))
      .select(
        col("doc_id"), col("width"), col("height"),
        col("needs_resize"), col("out_width"), col("out_height"),
        // STUB resample: a codec writes the resized payload here
        md5(concat(md5(col("text")), lit(":"), col("out_width").cast("string"),
          lit("x"), col("out_height").cast("string"))).as("out_md5"))

  /** Batched "decode": the mapPartitions shape a real codec would use
    * (one iterator per partition → reuse a decoder instance across rows).
    * The per-row body is the deterministic stub: a codec would replace
    * ONLY the marked line.
    */
  def decodeBatched(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("mime"), col("width"), col("height"), col("payload"))
      .as[(Long, String, Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        // A real decoder would be constructed once here, per partition.
        rows.map { case (docId, mime, width, height, payload) =>
          // STUB decode: byte-level features instead of codec output.
          val byte0 = payload.headOption.map(b => b & 0xff).getOrElse(0)
          MediaMeta(docId, mime, width, height, payload.length, byte0)
        }
      }
  }
}
