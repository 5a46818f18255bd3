package graft.core

import java.io.{EOFException, InputStream, OutputStream}

/** `java.io` stream adapters for the prefix-varint codec — the analogue
  * of the reference's `std::io` API (reference: src/io.rs:20-60), used by
  * the engine for manifest/spill io off the hot path.
  */
object VarIntStreams {

  /** Encode one raw u64 to a stream; returns bytes written
    * (reference: `write_prefix_varint`, src/io.rs:20-30).
    */
  def write(raw: Long, out: OutputStream): Int = {
    val buf = new Array[Byte](PrefixVarInt.MaxLen)
    val n = PrefixVarInt.encode(raw, buf, 0)
    out.write(buf, 0, n)
    n
  }

  def writeSigned(v: Long, out: OutputStream): Int =
    write(PrefixVarInt.zigzagEncode(v), out)

  /** Decode one raw u64 from a stream: read the tag byte, then exactly
    * `leadingOnes(tag)` more (reference: `read_prefix_varint`,
    * src/io.rs:35-47). EOF before the tag or mid-value raises
    * [[DecodeError.UnexpectedEob]].
    */
  def read(in: InputStream): Long = {
    val tag = in.read()
    if (tag < 0) DecodeError.eob()
    if (tag <= 0x7f) tag.toLong
    else {
      val n = PrefixVarInt.leadingOnes(tag) + 1
      val buf = new Array[Byte](n)
      buf(0) = tag.toByte
      var got = 1
      while (got < n) {
        val r = in.read(buf, got, n - got)
        if (r < 0) DecodeError.eob()
        got += r
      }
      PrefixVarInt.decodeMultibyte(tag, buf, 0)
    }
  }

  def readSigned(in: InputStream): Long = PrefixVarInt.zigzagDecode(read(in))

  /** Drain a stream into values until EOF — the io analogue of the
    * reference's buffer iterator (reference: src/bytes.rs:148-186).
    */
  def iterator(in: InputStream): Iterator[Long] = new Iterator[Long] {
    private var nextTag = in.read()
    def hasNext: Boolean = nextTag >= 0
    def next(): Long = {
      val tag = nextTag
      val v =
        if (tag <= 0x7f) tag.toLong
        else {
          val n = PrefixVarInt.leadingOnes(tag) + 1
          val buf = new Array[Byte](n)
          buf(0) = tag.toByte
          var got = 1
          while (got < n) {
            val r = in.read(buf, got, n - got)
            if (r < 0) DecodeError.eob()
            got += r
          }
          PrefixVarInt.decodeMultibyte(tag, buf, 0)
        }
      nextTag = in.read()
      v
    }
  }
}
