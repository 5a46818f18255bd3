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

  /** REAL lib-free header parsers for formats whose metadata is plain
    * byte arithmetic — PNG (IHDR width/height) and WAV (RIFF fmt chunk:
    * channels, sample rate, and sample-frame count from the data chunk).
    * Payloads that aren't recognized fall back to [[FakeDecoder]], so the
    * pipeline handles mixed real/opaque media in one pass.
    */
  object HeaderParsers {
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)

    private val PngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: signature, then the IHDR chunk (always first) carries
      * big-endian width/height at offsets 16/20.
      */
    def png(b: Array[Byte]): Option[(Long, Long)] =
      if (b.length >= 24 && (0 until 8).forall(i => b(i) == PngMagic(i))
          && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some((be32(b, 16), be32(b, 20)))
      else None

    /** WAV: RIFF....WAVE, then chunk walk to `fmt ` (channels, sample
      * rate) and `data` (byte length -> sample frames).
      * @return (channels, sampleRate, frames)
      */
    def wav(b: Array[Byte]): Option[(Long, Long, Long)] = {
      def tag(o: Int, s: String) = o + 4 <= b.length &&
        (0 until 4).forall(i => (b(o + i) & 0xff) == s.charAt(i).toInt)
      if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
      var o = 12
      var channels = 0L
      var rate = 0L
      var bytesPerFrame = 0L
      var dataLen = -1L
      while (o + 8 <= b.length) {
        val size = le32(b, o + 4)
        if (tag(o, "fmt ") && o + 24 <= b.length) {
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          bytesPerFrame = le16(b, o + 20) // block align
        } else if (tag(o, "data")) dataLen = size
        o += 8 + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
        if (size < 0 || size > b.length) return None // corrupt size field
      }
      if (channels > 0 && rate > 0 && dataLen >= 0)
        Some((channels, rate, if (bytesPerFrame > 0) dataLen / bytesPerFrame else 0L))
      else None
    }

    /** Unified metadata: (width, height, frames) with real parses for
      * recognized formats and [[FakeDecoder]] for everything else.
      */
    def decode(kind: String, payload: Array[Byte]): (Long, Long, Long) =
      png(payload).map { case (w, h) => (w, h, 1L) }
        .orElse(wav(payload).map { case (ch, rate, frames) => (ch, rate, frames) })
        .getOrElse(FakeDecoder.decode(kind, payload))
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
          // real header parse for recognized formats, stub otherwise
          val (w, h, f) = HeaderParsers.decode(r.kind, r.payload)
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
