package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, processed in batched
  * `mapPartitions` passes (the Scala analogue of arrow-batched UDFs).
  *
  * The actual media decode is STUBBED (this container ships no image/
  * audio libraries): [[FakeDecoder]] derives deterministic pseudo-metadata
  * from the payload bytes. The Spark-side contract — schema, binary
  * column, batch iteration shape, partition-local decoder state — is real
  * and tested; swapping [[FakeDecoder.decode]] for a JNI/lib call is the
  * only change needed for real media.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
      width: Long, height: Long, frames: Long, checksum: Long)

  /** STUB decoder: pure function of the payload bytes. A real build links
    * an image/audio decoder here; everything around it stays unchanged.
    */
  object FakeDecoder {
    def decode(kind: String, payload: Array[Byte]): (Long, Long, Long) = {
      val n = payload.length.toLong
      // deterministic fake dimensions, stable for the DuckDB oracle:
      val width = 16L + n % 640L
      val height = 16L + (n / 640L) % 480L
      val frames = if (kind == "video") 1L + n % 7L else 1L
      (width, height, frames)
    }
  }

  /** Wrap a text table as fake media payloads (binary column + kind). */
  def payloadsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched feature extraction over the binary column. One decoder
    * "session" per partition (the expensive-init shape real decoders
    * need), rows streamed through it — constant memory, no collect.
    */
  def extractMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (e.g. codec context)
        rows.map { r =>
          val (w, h, f) = FakeDecoder.decode(r.kind, r.payload)
          var sum = 0L
          var i = 0
          while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
          MediaMeta(r.doc_id, r.kind, r.payload.length.toLong, w, h, f, sum)
        }
      }
  }

  /** Deterministic frame sampling for "video" payloads: byte offsets of
    * sampled frames as an array column — the partition/batch plumbing of
    * a frame sampler with the decode itself stubbed to offset math.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 4096): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_offsets",
        sequence(lit(0L), greatest(length(col("payload")).cast("long") - 1, lit(0L)),
          lit(everyNth.toLong)))
      .select(col("doc_id"), size(col("frame_offsets")).as("n_frames"),
        col("frame_offsets"))
}
