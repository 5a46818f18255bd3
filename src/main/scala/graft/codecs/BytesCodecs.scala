package graft.codecs

import graft.core.{BlockReader, BlockWriter}

/** Decoded float-array column (kind 7): flat float pool + per-row
  * (offset, len) slices — the embedding shape. The reader hands rows
  * out as `Array[Float]` copies only when materialized into Spark rows.
  */
final class FloatsColumn(val pool: Array[Float], val offsets: Array[Int],
                         val lens: Array[Int]) {
  def n: Int = offsets.length
  def slice(i: Int): Array[Float] =
    java.util.Arrays.copyOfRange(pool, offsets(i), offsets(i) + lens(i))
}

/** Block codecs for the two LLM-pipeline column shapes the engine's own
  * table champions (round 7): kind 6 BINARY (opaque media payloads) and
  * kind 7 ARRAY<FLOAT> (embeddings).
  *
  * BINARY (id 32, "bin-raw"): varint n, per-value byte-length varints,
  * concatenated payloads. The same plain layout as [[RawStringCodec]]
  * but over arbitrary bytes — a String round-trip would corrupt invalid
  * UTF-8 sequences, so binary never rides the string codecs. Blobs
  * (compressed media) don't dictionary- or prefix-compress, so raw is
  * the whole suite. Decodes zero-copy into the [[Utf8Column]] slice
  * shape (it is just (pool, offsets, lens) over bytes).
  *
  * ARRAY<FLOAT> (id 33, "f32-raw"): varint n, per-row dim varints, then
  * the packed little-endian IEEE-754 floats. Embedding floats are
  * near-random in the low mantissa bits — raw 4-byte storage is the
  * right baseline (byte-exact, SIMD-friendly bulk decode via a
  * little-endian FloatBuffer view).
  */
object BytesCodecs {

  final val BinRawId = 32
  final val F32RawId = 33
  /** Per-value caps mirror the string path's MaxValueChars discipline. */
  final val MaxBinaryBytes: Int = 64 << 20
  final val MaxFloatDim: Int = 1 << 20

  // ------------------------------------------------------------- binary

  def encodeBinary(vals: Array[Array[Byte]], n: Int): Array[Byte] = {
    var total = 0L
    var i = 0
    while (i < n) { total += vals(i).length; i += 1 }
    val w = new BlockWriter((total + n * 2 + 16).min(Int.MaxValue).toInt)
    w.putByte(BinRawId)
    w.putVarint(n.toLong)
    i = 0
    while (i < n) { w.putVarint(vals(i).length.toLong); i += 1 }
    i = 0
    while (i < n) { w.putBytes(vals(i)); i += 1 }
    w.result()
  }

  /** Zero-copy decode into byte slices over `buf`. */
  def decodeBinary(buf: Array[Byte], off: Int, end: Int): Utf8Column = {
    val r = openReader(buf, off, end, BinRawId)
    val n = readCount(r)
    val lens = new Array[Int](n)
    var i = 0
    while (i < n) {
      val l = r.getVarint()
      require(l >= 0 && l <= MaxBinaryBytes, s"implausible binary length $l")
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
    require(r.remaining == 0, "binary block has trailing bytes")
    new Utf8Column(buf, offs, lens)
  }

  // -------------------------------------------------------- float array

  def encodeFloats(vals: Array[Array[Float]], n: Int): Array[Byte] = {
    var total = 0L
    var i = 0
    while (i < n) { total += vals(i).length; i += 1 }
    val w = new BlockWriter((total * 4 + n * 2 + 16).min(Int.MaxValue).toInt)
    w.putByte(F32RawId)
    w.putVarint(n.toLong)
    i = 0
    while (i < n) { w.putVarint(vals(i).length.toLong); i += 1 }
    val payload = new Array[Byte](
      if (total * 4 > Int.MaxValue) throw new IllegalArgumentException(
        s"float payload overflows a block: $total floats") else (total * 4).toInt)
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    i = 0
    while (i < n) {
      val a = vals(i)
      var j = 0
      while (j < a.length) { bb.putFloat(a(j)); j += 1 }
      i += 1
    }
    w.putBytes(payload)
    w.result()
  }

  def decodeFloats(buf: Array[Byte], off: Int, end: Int): FloatsColumn = {
    val r = openReader(buf, off, end, F32RawId)
    val n = readCount(r)
    val lens = new Array[Int](n)
    val offs = new Array[Int](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val d = r.getVarint()
      require(d >= 0 && d <= MaxFloatDim, s"implausible float-array dim $d")
      lens(i) = d.toInt
      offs(i) = total.toInt
      total += d
      require(total * 4 <= r.remaining,
        "float payload shorter than its declared dims")
      i += 1
    }
    require(total * 4 == r.remaining, "float block has trailing bytes")
    val pool = new Array[Float](total.toInt)
    java.nio.ByteBuffer.wrap(buf, r.position, pool.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asFloatBuffer().get(pool)
    new FloatsColumn(pool, offs, lens)
  }

  // ------------------------------------------------------------ helpers

  private def openReader(buf: Array[Byte], off: Int, end: Int,
                         wantId: Int): BlockReader = {
    require(off >= 0 && off < end && end <= buf.length,
      "empty or out-of-range block slice")
    val r = new BlockReader(buf, off, end)
    val id = r.getByte()
    require(id == wantId, s"unknown bytes-codec id $id (want $wantId)")
    r
  }

  private def readCount(r: BlockReader): Int = {
    val n = r.getVarint()
    require(n >= 0 && n <= LongCodecs.MaxDecodeRows, s"implausible row count $n")
    n.toInt
  }
}
