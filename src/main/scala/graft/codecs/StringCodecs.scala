package graft.codecs

import graft.core.{BlockReader, BlockWriter, PrefixVarInt}
import java.nio.charset.StandardCharsets.UTF_8

/** One lightweight-compression codec for a chunk of String values.
  * Block wire format: `[id: u8][count: varint][payload…]`; ids 16+.
  */
/** A decoded string column as UTF-8 slices into a shared byte pool —
  * value i is `pool(offsets(i) until offsets(i)+lens(i))`. Zero-copy for
  * raw/dict/RLE blocks (the pool IS the block buffer); FSST decodes into
  * ONE pool allocation per block. Consumers that need Java Strings call
  * [[strings]]; byte-level consumers (columnar vector fill, UTF8String
  * rows, the content digest) use the slices directly and never pay the
  * UTF-8 decode + re-encode round trip a String would cost.
  */
final class Utf8Column(val pool: Array[Byte], val offsets: Array[Int],
                       val lens: Array[Int]) {
  def n: Int = offsets.length
  def string(i: Int): String =
    new String(pool, offsets(i), lens(i), java.nio.charset.StandardCharsets.UTF_8)
  def strings: Array[String] = {
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = string(i); i += 1 }
    out
  }
  /** Byte-equality of value i against a pre-encoded UTF-8 constant. */
  def equalsBytes(i: Int, b: Array[Byte]): Boolean =
    lens(i) == b.length && java.util.Arrays.equals(
      pool, offsets(i), offsets(i) + lens(i), b, 0, b.length)
}

sealed trait StringCodec extends Serializable {
  def id: Byte
  def name: String
  def encode(values: Array[String], n: Int): Array[Byte]
  final def encode(values: Array[String]): Array[Byte] = encode(values, values.length)
  /** Decode a block at buf(off until end) to UTF-8 slices — zero-copy
    * where the layout allows; the single decode implementation per codec
    * (the String form derives from it).
    */
  def decodeUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column
  final def decode(buf: Array[Byte], off: Int, end: Int): Array[String] =
    decodeUtf8(buf, off, end).strings
  final def decode(block: Array[Byte]): Array[String] = decode(block, 0, block.length)

  protected final def header(n: Int, cap: Int): BlockWriter = {
    val w = new BlockWriter(cap)
    w.putByte(id)
    w.putVarint(n.toLong)
    w
  }
  protected final def openReader(buf: Array[Byte], off: Int, end: Int): (BlockReader, Int) = {
    val r = new BlockReader(buf, off, end)
    val gotId = r.getByte()
    require(gotId == id, s"block codec id $gotId, expected $id ($name)")
    val n = r.getVarint()
    require(n >= 0 && n <= LongCodecs.MaxDecodeRows,
      s"implausible row count $n in $name block (cap ${LongCodecs.MaxDecodeRows})")
    (r, n.toInt)
  }
}

/** One-pass string chunk stats with exact sizes for raw/dict/rle and a
  * sample-trained FSST table for size estimation.
  */
final case class StringStats(
    count: Int,
    totalBytes: Long,
    rawBodySize: Long,
    distinct: Int,
    distinctOverflow: Boolean,
    dictBodySize: Long, // -1 if overflowed
    runCount: Int,
    rleBodySize: Long
)

object StringCodecs {

  final val DictCardCap = 1 << 14

  /** UTF-8 encoded length without materializing the bytes — stats must
    * not copy the whole chunk just to learn sizes.
    */
  def utf8Length(s: String): Long = {
    var bytes = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) bytes += 1
      else if (c < 0x800) bytes += 2
      else if (Character.isHighSurrogate(c)) {
        // only a proper surrogate PAIR is 4 bytes; String.getBytes(UTF_8)
        // encodes an unpaired surrogate as a single '?' byte
        if (i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) { bytes += 4; i += 1 }
        else bytes += 1
      }
      else if (Character.isLowSurrogate(c)) bytes += 1 // unpaired -> '?'
      else bytes += 3
      i += 1
    }
    bytes
  }

  def stats(values: Array[String], n: Int): StringStats = {
    require(n > 0, "empty chunk")
    var totalBytes = 0L
    var rawBody = 0L
    var rleBody = 0L
    var runCount = 1
    val seen = new java.util.LinkedHashMap[String, Integer]()
    var overflow = false
    var i = 0
    while (i < n) {
      val b = utf8Length(values(i))
      totalBytes += b
      rawBody += PrefixVarInt.len(b) + b
      if (i > 0 && values(i) != values(i - 1)) runCount += 1
      if (!overflow && !seen.containsKey(values(i))) {
        seen.put(values(i), seen.size)
        if (seen.size > DictCardCap) overflow = true
      }
      i += 1
    }
    // rle body: per run, len varint + bytes + runLen varint
    var start = 0
    i = 1
    while (i <= n) {
      if (i == n || values(i) != values(start)) {
        val b = utf8Length(values(start))
        rleBody += PrefixVarInt.len(b) + b + PrefixVarInt.len((i - start).toLong)
        start = i
      }
      i += 1
    }
    val dictBody =
      if (overflow) -1L
      else {
        val card = seen.size
        var dsz = PrefixVarInt.len(card.toLong).toLong
        val it = seen.keySet().iterator()
        while (it.hasNext) {
          val b = utf8Length(it.next())
          dsz += PrefixVarInt.len(b) + b
        }
        dsz + 1 + BitPacker.packedSize(n, BitPacker.bitsForUnsigned((card - 1).toLong))
      }
    StringStats(n, totalBytes, rawBody, math.min(seen.size, DictCardCap),
      overflow, dictBody, runCount, rleBody)
  }

  private def headerSize(n: Int): Long = 1L + PrefixVarInt.len(n.toLong)

  def sizeOf(codec: StringCodec, st: StringStats): Long = {
    val h = headerSize(st.count)
    codec match {
      case RawStringCodec  => h + st.rawBodySize
      case DictStringCodec => if (st.dictBodySize < 0) Long.MaxValue else h + st.dictBodySize
      case RleStringCodec  => h + PrefixVarInt.len(st.runCount.toLong) + st.rleBodySize
      case FsstStringCodec => Long.MaxValue // priced by trial, see select()
    }
  }

  val exact: Seq[StringCodec] = Seq(RawStringCodec, DictStringCodec, RleStringCodec)

  /** Mutable per-(partition, column) FSST training cache: training costs
    * ~5 sample passes per call, so the engine trains on the FIRST chunk of
    * a column and reuses the table for later chunks of the same partition
    * (sorted partitions are homogeneous), retraining only when the
    * achieved ratio drifts >15% above the ratio measured at training time.
    */
  final class FsstState {
    var table: Fsst.SymbolTable = null
    var trainRatio: Double = Double.MaxValue
  }

  /** Stats-driven selection + encoding in one pass. Raw/dict/rle are
    * priced exactly from stats (no encode needed to price); FSST is
    * priced by a single (train+)encode whose block is returned directly if
    * it wins — the chosen codec is the true minimum among all priced
    * codecs with no duplicated work. Pass a [[FsstState]] to amortize
    * FSST training across the chunks of one partition column.
    */
  def encodeBest(values: Array[String], n: Int, st: StringStats,
                 fsst: FsstState = null): (StringCodec, Array[Byte]) = {
    var best: StringCodec = RawStringCodec
    var bestSize = sizeOf(RawStringCodec, st)
    for (c <- Seq(DictStringCodec, RleStringCodec)) {
      val s = sizeOf(c, st)
      if (s < bestSize) { best = c; bestSize = s }
    }
    // FSST trial gate: worth a train+encode only when the chunk carries
    // real text volume AND no exactly-priced codec already compresses
    // ≥4x (FSST on text rarely beats that; skipping keeps the per-chunk
    // fixed training cost off columns dict/rle already win).
    if (st.totalBytes >= 1024 && bestSize * 4 > st.totalBytes) {
      val fsstBlock =
        if (fsst == null) FsstStringCodec.encode(values, n)
        else if (fsst.table == null) {
          fsst.table = Fsst.train(values, n)
          val b = FsstStringCodec.encodeWith(fsst.table, values, n)
          fsst.trainRatio = b.length.toDouble / math.max(st.totalBytes, 1L)
          b
        } else {
          val b = FsstStringCodec.encodeWith(fsst.table, values, n)
          val ratio = b.length.toDouble / math.max(st.totalBytes, 1L)
          if (ratio <= fsst.trainRatio * 1.15) b
          else { // drifted: this chunk's content no longer matches the table
            fsst.table = Fsst.train(values, n)
            val b2 = FsstStringCodec.encodeWith(fsst.table, values, n)
            fsst.trainRatio = b2.length.toDouble / math.max(st.totalBytes, 1L)
            if (b2.length <= b.length) b2 else b
          }
        }
      if (fsstBlock.length < bestSize) return (FsstStringCodec, fsstBlock)
    }
    (best, best.encode(values, n))
  }

  def select(values: Array[String], n: Int, st: StringStats): StringCodec =
    encodeBest(values, n, st)._1

  def byId(id: Int): StringCodec = id match {
    case 16 => RawStringCodec
    case 17 => DictStringCodec
    case 18 => RleStringCodec
    case 19 => FsstStringCodec
    case x  => throw new IllegalArgumentException(s"unknown string codec id $x")
  }

  def decode(block: Array[Byte]): Array[String] = decodeSlice(block, 0, block.length)

  def decodeSlice(buf: Array[Byte], off: Int, end: Int): Array[String] = {
    require(off >= 0 && off < end && end <= buf.length, "empty or out-of-range block slice")
    byId(buf(off) & 0xff).decode(buf, off, end)
  }

  /** Slice decode to UTF-8 slices (no String materialization). */
  def decodeSliceUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    require(off >= 0 && off < end && end <= buf.length, "empty or out-of-range block slice")
    byId(buf(off) & 0xff).decodeUtf8(buf, off, end)
  }
}

/** Plain layout: per-string byte length varints, then concatenated UTF-8. */
case object RawStringCodec extends StringCodec {
  val id: Byte = 16
  val name = "raw"
  def encode(values: Array[String], n: Int): Array[Byte] = {
    val bytes = new Array[Array[Byte]](n)
    var total = 0L
    var i = 0
    while (i < n) { bytes(i) = values(i).getBytes(UTF_8); total += bytes(i).length; i += 1 }
    val w = header(n, (total + n * 2 + 16).toInt)
    i = 0
    while (i < n) { w.putVarint(bytes(i).length.toLong); i += 1 }
    i = 0
    while (i < n) { w.putBytes(bytes(i)); i += 1 }
    w.result()
  }
  def decodeUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    val (r, n) = openReader(buf, off, end)
    if (n > r.remaining) graft.core.DecodeError.eob() // each len varint >= 1 byte
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val l = r.getVarint()
      require(l >= 0 && l <= Int.MaxValue, s"implausible string length $l")
      lens(i) = l.toInt
      i += 1
    }
    val offs = new Array[Int](n)
    i = 0
    while (i < n) {
      offs(i) = r.position
      r.skip(lens(i)) // bounds-checked; drains + raises on a corrupt length
      i += 1
    }
    new Utf8Column(buf, offs, lens)
  }
}

/** Dictionary: first-seen-order entries, codes bit-packed. */
case object DictStringCodec extends StringCodec {
  val id: Byte = 17
  val name = "dict"
  def encode(values: Array[String], n: Int): Array[Byte] = {
    val codes = new java.util.LinkedHashMap[String, Integer]()
    val codeArr = new Array[Long](n)
    var i = 0
    while (i < n) {
      var c = codes.get(values(i))
      if (c == null) { c = codes.size; codes.put(values(i), c) }
      codeArr(i) = c.longValue()
      i += 1
    }
    val card = codes.size
    val width = BitPacker.bitsForUnsigned((card - 1).toLong)
    val w = header(n, 64 + n)
    w.putVarint(card.toLong)
    val it = codes.keySet().iterator()
    while (it.hasNext) {
      val b = it.next().getBytes(UTF_8)
      w.putVarint(b.length.toLong)
      w.putBytes(b)
    }
    w.putByte(width)
    w.putBytes(BitPacker.pack(codeArr, n, width))
    w.result()
  }
  def decodeUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    val (r, n) = openReader(buf, off, end)
    if (n == 0) return new Utf8Column(buf, new Array[Int](0), new Array[Int](0))
    val cardL = r.getVarint()
    require(cardL >= 1 && cardL <= n && cardL <= r.remaining,
      s"implausible dict cardinality $cardL for $n rows")
    val card = cardL.toInt
    val entryOff = new Array[Int](card)
    val entryLen = new Array[Int](card)
    var i = 0
    while (i < card) {
      val l = r.getVarint()
      require(l >= 0 && l <= Int.MaxValue, s"implausible dict entry length $l")
      entryOff(i) = r.position
      entryLen(i) = l.toInt
      r.skip(entryLen(i))
      i += 1
    }
    val width = r.getByte()
    val codes = BitPacker.unpack(buf, r.position, n, width)
    val offs = new Array[Int](n)
    val lens = new Array[Int](n)
    i = 0
    while (i < n) {
      val c = codes(i)
      require(c >= 0 && c < card, s"dict code $c out of range [0, $card)")
      offs(i) = entryOff(c.toInt)
      lens(i) = entryLen(c.toInt)
      i += 1
    }
    new Utf8Column(buf, offs, lens)
  }
}

/** Run-length: `[runCount varint] (len varint, bytes, runLen varint)*`. */
case object RleStringCodec extends StringCodec {
  val id: Byte = 18
  val name = "rle"
  def encode(values: Array[String], n: Int): Array[Byte] = {
    var runs = 1
    var i = 1
    while (i < n) { if (values(i) != values(i - 1)) runs += 1; i += 1 }
    val w = header(n, n * 4 + 16)
    w.putVarint(runs.toLong)
    var start = 0
    i = 1
    while (i <= n) {
      if (i == n || values(i) != values(start)) {
        val b = values(start).getBytes(UTF_8)
        w.putVarint(b.length.toLong)
        w.putBytes(b)
        w.putVarint((i - start).toLong)
        start = i
      }
      i += 1
    }
    w.result()
  }
  def decodeUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    val (r, n) = openReader(buf, off, end)
    val runsL = r.getVarint()
    require(runsL >= 0 && runsL <= r.remaining, s"implausible RLE run count $runsL")
    val runs = runsL.toInt
    val offs = new Array[Int](n)
    val lens = new Array[Int](n)
    var pos = 0
    var k = 0
    while (k < runs) {
      val sl = r.getVarint()
      require(sl >= 0 && sl <= Int.MaxValue, s"implausible run value length $sl")
      val vOff = r.position
      val vLen = sl.toInt
      r.skip(vLen)
      val lenL = r.getVarint()
      require(lenL >= 0 && lenL <= n - pos, s"RLE run overflows row count ($lenL at $pos/$n)")
      var len = lenL.toInt
      while (len > 0) { offs(pos) = vOff; lens(pos) = vLen; pos += 1; len -= 1 }
      k += 1
    }
    require(pos == n, s"RLE runs covered $pos of $n rows")
    new Utf8Column(buf, offs, lens)
  }
}

/** FSST symbol-table compression (see [[Fsst]]). Layout:
  * `[table][decLen varints][encLen varints][encoded bytes…]` — decoded
  * lengths are kept so decode allocates exactly once per string.
  */
case object FsstStringCodec extends StringCodec {
  val id: Byte = 19
  val name = "fsst"

  def encode(values: Array[String], n: Int): Array[Byte] =
    encodeWith(Fsst.train(values, n), values, n)

  /** Encode with an externally trained (possibly reused) table; the table
    * is always serialized into the block, so decode stays self-contained.
    */
  def encodeWith(table: Fsst.SymbolTable, values: Array[String], n: Int): Array[Byte] = {
    val w = header(n, 64)
    table.writeTo(w)
    val raw = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { raw(i) = values(i).getBytes(UTF_8); i += 1 }
    i = 0
    while (i < n) { w.putVarint(raw(i).length.toLong); i += 1 }
    // encode each string into a scratch, record encoded length, then bytes
    val scratch = new BlockWriter(4096)
    val encLens = new Array[Int](n)
    i = 0
    while (i < n) { encLens(i) = table.encodeInto(raw(i), scratch); i += 1 }
    i = 0
    while (i < n) { w.putVarint(encLens(i).toLong); i += 1 }
    w.putBytes(scratch.result())
    w.result()
  }

  /** Exact block size (one full train+encode; kept for tests). */
  def exactSize(values: Array[String], n: Int): Long =
    encode(values, n).length.toLong

  def decodeUtf8(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    val (r, n) = openReader(buf, off, end)
    val table = Fsst.readTable(r)
    val decLens = new Array[Int](n)
    val encLens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val l = r.getVarint()
      require(l >= 0 && l <= Int.MaxValue, s"implausible decoded length $l")
      decLens(i) = l.toInt
      i += 1
    }
    var totalDec = 0L
    i = 0
    while (i < n) {
      val l = r.getVarint()
      require(l >= 0 && l <= Int.MaxValue, s"implausible encoded length $l")
      encLens(i) = l.toInt
      // max expansion is 8 bytes out per encoded byte (longest symbol)
      require(decLens(i) <= 8L * l, s"decoded length ${decLens(i)} exceeds 8x encoded $l")
      totalDec += decLens(i)
      i += 1
    }
    require(totalDec <= Int.MaxValue - 16,
      s"FSST block claims $totalDec decoded bytes (exceeds one pool)")
    val pool = new Array[Byte](totalDec.toInt)
    val offs = new Array[Int](n)
    var pos = r.position
    var o = 0
    i = 0
    while (i < n) {
      require(encLens(i) <= end - pos, s"encoded bytes overrun block slice")
      offs(i) = o
      table.decodeInto(buf, pos, encLens(i), pool, o, decLens(i))
      pos += encLens(i)
      o += decLens(i)
      i += 1
    }
    new Utf8Column(pool, offs, decLens)
  }
}
