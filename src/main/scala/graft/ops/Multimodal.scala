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
    * byte arithmetic — PNG (IHDR width/height), JPEG (SOFn frame
    * dimensions), WAV (RIFF fmt chunk: channels, sample rate, sample
    * frames), and ISO-BMFF/MP4 (moov/mvhd movie duration). Payloads that
    * aren't recognized fall back to [[FakeDecoder]], so the pipeline
    * handles mixed real/opaque media in one pass.
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

    private def be16(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 8) | (b(o + 1) & 0xffL)

    /** JPEG: SOI marker walk to the first SOFn frame header (C0..CF
      * except C4 DHT / C8 JPG / CC DAC), which carries big-endian
      * height at segment offset +5 and width at +7.
      * @return (width, height)
      */
    def jpeg(b: Array[Byte]): Option[(Long, Long)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var o = 2
      while (o + 4 <= b.length) {
        if ((b(o) & 0xff) != 0xff) return None // marker desync: not a JPEG
        var m = o + 1
        while (m < b.length && (b(m) & 0xff) == 0xff) m += 1 // fill bytes
        if (m >= b.length) return None
        val marker = b(m) & 0xff
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS first
        if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) o = m + 1
        else {
          if (m + 3 > b.length) return None
          val segLen = be16(b, m + 1)
          if (segLen < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (m + 8 > b.length) return None
            return Some((be16(b, m + 6), be16(b, m + 4))) // (width, height)
          }
          o = m + 1 + segLen.toInt
        }
      }
      None
    }

    /** First box with `typ` in b(from until until); returns its CONTENT
      * bounds. Handles size==1 (64-bit largesize) and size==0 (to end).
      */
    private def findBox(b: Array[Byte], from: Int, until: Int,
                        typ: String): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size32 = be32(b, o)
        val isType = (0 until 4).forall(i => (b(o + 4 + i) & 0xff) == typ.charAt(i).toInt)
        val (content, boxEnd) =
          if (size32 == 1L) {
            if (o + 16 > until) return None
            var sz = 0L
            var i = 0
            while (i < 8) { sz = (sz << 8) | (b(o + 8 + i) & 0xffL); i += 1 }
            if (sz < 16 || sz > until - o) return None
            (o + 16, o + sz.toInt)
          } else if (size32 == 0L) (o + 8, until)
          else {
            if (size32 < 8 || size32 > until - o) return None
            (o + 8, o + size32.toInt)
          }
        if (isType) return Some((content, boxEnd))
        o = boxEnd
      }
      None
    }

    /** ISO-BMFF (MP4/MOV/M4A): `moov`/`mvhd` movie header — duration in
      * timescale units, v0 (32-bit fields) and v1 (64-bit) layouts.
      * @return (timescale, durationUnits)
      */
    def bmff(b: Array[Byte]): Option[(Long, Long)] = {
      // sanity: a real stream starts with a box whose type is printable
      // ASCII (usually ftyp); bail fast on arbitrary bytes
      if (b.length < 16) return None
      if (!(4 until 8).forall(i => b(i) >= 0x20 && b(i) < 0x7f)) return None
      findBox(b, 0, b.length, "moov").flatMap { case (mo, mend) =>
        findBox(b, mo, mend, "mvhd").flatMap { case (ho, hend) =>
          val v = b(ho) & 0xff
          if (v == 0 && ho + 20 <= hend)
            Some((be32(b, ho + 12), be32(b, ho + 16)))
          else if (v == 1 && ho + 32 <= hend) {
            var d = 0L
            var i = 0
            while (i < 8) { d = (d << 8) | (b(ho + 24 + i) & 0xffL); i += 1 }
            Some((be32(b, ho + 20), d))
          } else None
        }
      }
    }

    /** Unified metadata: (width, height, frames) with real parses for
      * recognized formats and [[FakeDecoder]] for everything else.
      * BMFF reports (0, 0, whole seconds of movie duration).
      */
    def decode(kind: String, payload: Array[Byte]): (Long, Long, Long) =
      png(payload).map { case (w, h) => (w, h, 1L) }
        .orElse(jpeg(payload).map { case (w, h) => (w, h, 1L) })
        .orElse(wav(payload).map { case (ch, rate, frames) => (ch, rate, frames) })
        .orElse(bmff(payload).map { case (timescale, dur) =>
          (0L, 0L, if (timescale > 0) dur / timescale else 0L)
        })
        .getOrElse(FakeDecoder.decode(kind, payload))
  }

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Long): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** Minimal VALID PNG: signature + IHDR (width/height derived from the
    * payload-body length), correct chunk CRC, body appended as ancillary
    * trailing bytes. 33 header bytes + body.
    */
  private[ops] def pngPayload(body: Array[Byte]): Array[Byte] = {
    val b = body.length.toLong
    val w = 16L + b % 640L
    val h = 16L + (b / 640L) % 480L
    val data = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0) // RGB8
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32
    crc.update(typeAndData)
    Array(0x89.toByte) ++ "PNG".getBytes("US-ASCII") ++
      Array[Byte](0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(data.length.toLong) ++ typeAndData ++ be32(crc.getValue) ++ body
  }

  /** Minimal VALID WAV: RIFF/WAVE + fmt (16-bit PCM, 1-2 channels from
    * the body length, 8 kHz) + data holding the body. 44 header bytes +
    * body; frames = body / blockAlign.
    */
  private[ops] def wavPayload(body: Array[Byte]): Array[Byte] = {
    val b = body.length.toLong
    val channels = 1L + b % 2L
    val rate = 8000L
    val blockAlign = channels * 2L // 16-bit samples
    "RIFF".getBytes("US-ASCII") ++ le32(36L + b) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16L) ++ le16(1L) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(16L) ++
      "data".getBytes("US-ASCII") ++ le32(b) ++ body
  }

  /** Minimal VALID ISO-BMFF: ftyp + moov/mvhd (v0, timescale 1000,
    * duration seconds = 1 + body%7), body as trailing mdat-less junk the
    * box walk never visits. 52 header bytes + body.
    */
  private[ops] def bmffPayload(body: Array[Byte]): Array[Byte] = {
    val b = body.length.toLong
    val seconds = 1L + b % 7L
    val mvhd = be32(28L) ++ "mvhd".getBytes("US-ASCII") ++
      be32(0L) /* v0 + flags */ ++ be32(0L) ++ be32(0L) /* ctime/mtime */ ++
      be32(1000L) /* timescale */ ++ be32(seconds * 1000L) /* duration */
    val moov = be32((8 + mvhd.length).toLong) ++ "moov".getBytes("US-ASCII") ++ mvhd
    val ftyp = be32(16L) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0L)
    ftyp ++ moov ++ body
  }

  /** Wrap a text table as media payloads (binary column + kind): REAL
    * minimal PNG/WAV/BMFF bytes whose header metadata derives
    * deterministically from the text (oracle-expressible), so the
    * downstream metadata pass exercises [[HeaderParsers]], not the stub.
    */
  def payloadsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (id % 3) match {
          case 0 => (id, "image", pngPayload(body))
          case 1 => (id, "audio", wavPayload(body))
          case _ => (id, "video", bmffPayload(body))
        }
      }.toDF("doc_id", "kind", "payload")
  }

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
