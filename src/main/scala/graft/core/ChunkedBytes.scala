package graft.core

/** `Buf`-over-NON-CONTIGUOUS buffers: prefix-varint reads across a
  * sequence of byte chunks, values freely straddling chunk boundaries —
  * the crate's `impl<Inner: Buf> PrefixVarIntBuf` works over `VecDeque`
  * and chunked `Bytes` exactly like this (reference:
  * src/bytes.rs:122-146; boundary tests src/tests.rs over VecDeque).
  * This was the one remaining reference-parity gap after round 4
  * ([[BlockReader]] is single-array; `BufferedVarIntReader` covers
  * streams).
  *
  * Mirrors the reference's structure:
  *  - FAST path when the current chunk has ≥ [[PrefixVarInt.MaxLen]]
  *    bytes of headroom: one in-chunk kernel decode, cursor advance
  *    (reference: `self.chunk().len() >= MAX_LEN` → `raw::decode`);
  *  - SLOW path near a boundary: byte-at-a-time across chunks
  *    (reference: `get_prefix_varint_slow`).
  *
  * Contracts shared with [[BlockReader]]: a truncated value raises
  * [[DecodeError.UnexpectedEob]] with the cursor DRAINED (iteration
  * terminates); the narrow iterator yields `Left(Overflow)` for
  * well-formed too-wide values but CONTINUES past them.
  */
final class ChunkedBytesReader(chunks: Iterator[Array[Byte]]) {

  def this(chunks: Iterable[Array[Byte]]) = this(chunks.iterator)

  private var cur: Array[Byte] = Array.emptyByteArray
  private var pos = 0
  private var drained = false

  /** Ensure `cur` has at least one unread byte; false at end of input. */
  private def ensure(): Boolean = {
    if (drained) return false
    while (pos >= cur.length) {
      if (!chunks.hasNext) return false
      cur = chunks.next()
      pos = 0
    }
    true
  }

  def hasRemaining: Boolean = ensure()

  private def drainEob(): Nothing = {
    drained = true
    cur = Array.emptyByteArray
    pos = 0
    DecodeError.eob()
  }

  private def readByte(): Int = {
    if (!ensure()) drainEob()
    val b = cur(pos) & 0xff
    pos += 1
    b
  }

  /** One prefix varint, boundary-safe. */
  def getVarint(): Long = {
    if (!ensure()) drainEob()
    if (cur.length - pos >= PrefixVarInt.MaxLen) {
      // fast path: whole worst-case value inside the current chunk
      // (decodeValue + tag-derived length — decodePair's Tuple2 return
      // would box a Long per value on this hot path)
      val tag = cur(pos) & 0xff
      val n = if (tag <= 0x7f) 1 else PrefixVarInt.leadingOnes(tag) + 1
      val raw = PrefixVarInt.decodeValue(cur, pos)
      pos += n
      raw
    } else {
      val tag = readByte()
      if (tag <= 0x7f) tag.toLong
      else {
        val n = PrefixVarInt.leadingOnes(tag) + 1
        val scratch = new Array[Byte](n)
        scratch(0) = tag.toByte
        var i = 1
        while (i < n) { scratch(i) = readByte().toByte; i += 1 }
        PrefixVarInt.decodeValue(scratch, 0)
      }
    }
  }

  def varintIterator: Iterator[Long] = new Iterator[Long] {
    def hasNext: Boolean = hasRemaining
    def next(): Long = getVarint()
  }

  /** Narrow u32 iterator: Overflow-then-CONTINUE (the reference's
    * chunked-Buf `iter_prefix_varint::<u32>` contract).
    */
  def varintIterator32: Iterator[Either[DecodeError, Long]] =
    new Iterator[Either[DecodeError, Long]] {
      def hasNext: Boolean = hasRemaining
      def next(): Either[DecodeError, Long] =
        try {
          val raw = getVarint()
          if ((raw & 0xffffffff00000000L) != 0L) Left(new DecodeError.Overflow)
          else Right(raw)
        } catch { case e: DecodeError.UnexpectedEob => Left(e) }
    }
}
