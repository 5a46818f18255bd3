package graft.core

/** Growable byte buffer with a prefix-varint append fast path — the Scala
  * analogue of the reference's `PrefixVarIntBufMut::put_prefix_varint`
  * (reference: src/bytes.rs:20-40). Blocks are allocated with `MaxLen`
  * slack so the hot loop never takes a bounds-checked slow path
  * (reference fast-path contract: src/raw.rs:57-59).
  */
final class BlockWriter(initialCapacity: Int = 4096) {
  private var buf = new Array[Byte](math.max(initialCapacity, 16))
  private var pos = 0

  @inline private def ensure(extra: Int): Unit = {
    if (pos + extra > buf.length) {
      var cap = buf.length << 1
      while (pos + extra > cap) cap <<= 1
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  /** Append one raw u64 as prefix varint (1-byte inline fast path as in
    * reference src/bytes.rs:29-30).
    */
  def putVarint(raw: Long): Unit = {
    ensure(PrefixVarInt.MaxLen)
    if (java.lang.Long.compareUnsigned(raw, PrefixVarInt.Max1ByteTag) <= 0) {
      buf(pos) = raw.toByte
      pos += 1
    } else {
      // ensure(MaxLen) guarantees the word-store fast path is always safe
      pos += PrefixVarInt.encodeMultibyteFast(raw, buf, pos)
    }
  }

  /** Append a signed value zigzag-mapped then varint-coded
    * (reference signed path: src/core.rs:67-70).
    */
  def putSignedVarint(v: Long): Unit = putVarint(PrefixVarInt.zigzagEncode(v))

  def putByte(b: Int): Unit = { ensure(1); buf(pos) = b.toByte; pos += 1 }

  def putBytes(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n)
    System.arraycopy(src, off, buf, pos, n)
    pos += n
  }
  def putBytes(src: Array[Byte]): Unit = putBytes(src, 0, src.length)

  /** Fixed-width little-endian long (used by the bit-packed codecs). */
  def putLongLE(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(pos + i) = (v >>> (8 * i)).toByte; i += 1 }
    pos += 8
  }

  def size: Int = pos
  def result(): Array[Byte] = java.util.Arrays.copyOf(buf, pos)
  def reset(): Unit = pos = 0
}

/** Cursor over an encoded byte block — the Scala analogue of the
  * reference's `PrefixVarIntBuf::get_prefix_varint`
  * (reference: src/bytes.rs:122-146). On `UnexpectedEob` the cursor is
  * drained to the end, matching the reference's iterator-termination
  * contract (reference: src/bytes.rs:44-46).
  */
final class BlockReader(buf: Array[Byte], start: Int, end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  private var pos = start

  def hasRemaining: Boolean = pos < end
  def remaining: Int = end - pos
  def position: Int = pos

  /** Decode the next raw u64. Throws `DecodeError.UnexpectedEob` (after
    * draining the cursor) if the buffer ends mid-value.
    */
  def getVarint(): Long = {
    if (pos >= end) DecodeError.eob()
    val tag = buf(pos) & 0xff
    if (tag <= 0x7f) { pos += 1; tag.toLong }
    else {
      val n = PrefixVarInt.leadingOnes(tag) + 1
      if (pos + n > end) { pos = end; DecodeError.eob() } // drain semantics
      // word-load fast path when ≥ MaxLen bytes remain (reference
      // src/bytes.rs:129-137), byte ladder near the buffer tail
      val v =
        if (pos + PrefixVarInt.MaxLen <= end)
          PrefixVarInt.decodeMultibyteFast(tag, n, buf, pos)
        else PrefixVarInt.decodeMultibyte(tag, buf, pos)
      pos += n
      v
    }
  }

  def getSignedVarint(): Long = PrefixVarInt.zigzagDecode(getVarint())

  def getByte(): Int = {
    if (pos >= end) DecodeError.eob()
    val b = buf(pos) & 0xff
    pos += 1
    b
  }

  /** Advance the cursor without copying (zero-copy slice consumers).
    * Negative n (a corrupt length field) drains and raises Eob like an
    * overlong n — never an out-of-bounds access.
    */
  def skip(n: Int): Unit = {
    if (n < 0 || n > end - pos) { pos = end; DecodeError.eob() }
    pos += n
  }

  def getBytes(n: Int): Array[Byte] = {
    if (n < 0 || n > end - pos) { pos = end; DecodeError.eob() }
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }

  def getLongLE(): Long = {
    if (pos + 8 > end) { pos = end; DecodeError.eob() }
    var v = 0L
    var i = 0
    while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8
    v
  }

  /** Iterator over all remaining varints — the analogue of the
    * reference's `iter_prefix_varint` (reference: src/bytes.rs:148-186);
    * terminates on EOB via the drain semantics above.
    */
  def varintIterator: Iterator[Long] = new Iterator[Long] {
    def hasNext: Boolean = hasRemaining
    def next(): Long = getVarint()
  }

  /** Narrow u32 iterator with the reference's Overflow-then-CONTINUE
    * contract (reference: src/bytes.rs:166-186, test src/tests.rs:296-307):
    * a well-formed value that does not fit u32 yields `Left(Overflow)` but
    * the cursor has consumed the whole encoded value, so iteration
    * continues with the next one; a truncated value yields `Left(Eob)`
    * with the cursor drained, terminating iteration.
    */
  def varintIterator32: Iterator[Either[DecodeError, Long]] =
    new Iterator[Either[DecodeError, Long]] {
      def hasNext: Boolean = hasRemaining
      def next(): Either[DecodeError, Long] =
        try {
          val raw = getVarint() // consumes the full value even on overflow
          if ((raw & 0xffffffff00000000L) != 0L) Left(new DecodeError.Overflow)
          else Right(raw)
        } catch { case e: DecodeError.UnexpectedEob => Left(e) }
    }
}
