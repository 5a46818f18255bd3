package graft.codecs

import graft.core.{BlockReader, BlockWriter}

/** FSST-style static symbol-table string compression (Boncz, Neumann,
  * Leis: "FSST: Fast Random Access String Compression", VLDB 2020 —
  * public paper; implemented from scratch, simplified).
  *
  * A per-chunk table of up to 255 symbols (1..8 bytes, codes 0..254) is
  * trained by iterative greedy re-segmentation of a sample; code 255
  * escapes a literal byte. Strings are encoded independently, preserving
  * per-row random access.
  */
object Fsst {

  final val EscapeCode = 255
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8
  final val TrainIterations = 5
  final val SampleCap = 1 << 16 // 64 KiB training sample per chunk

  /** Immutable trained table with longest-match encode lookup. */
  final class SymbolTable(val symbols: Array[Array[Byte]]) extends Serializable {
    // latin-1 key (bijective byte<->char) -> code
    private val lookup = new java.util.HashMap[String, Integer]()
    private var maxLenV = 1
    locally {
      var c = 0
      while (c < symbols.length) {
        lookup.put(key(symbols(c), 0, symbols(c).length), c)
        if (symbols(c).length > maxLenV) maxLenV = symbols(c).length
        c += 1
      }
    }

    /** Code of the exact byte sequence, or -1. */
    def codeOf(b: Array[Byte], off: Int, len: Int): Int = {
      val c = lookup.get(key(b, off, len))
      if (c == null) -1 else c.intValue()
    }

    def maxLen: Int = maxLenV

    @inline private def key(b: Array[Byte], off: Int, len: Int): String = {
      val cs = new Array[Char](len)
      var i = 0
      while (i < len) { cs(i) = (b(off + i) & 0xff).toChar; i += 1 }
      new String(cs)
    }

    /** Greedy longest-match encode of src into w; returns bytes written. */
    def encodeInto(src: Array[Byte], w: BlockWriter): Int = {
      var written = 0
      var i = 0
      val n = src.length
      while (i < n) {
        var len = math.min(maxLenV, n - i)
        var code = -1
        while (len >= 1 && code < 0) {
          val c = lookup.get(key(src, i, len))
          if (c != null) code = c.intValue()
          else len -= 1
        }
        if (code >= 0) {
          w.putByte(code)
          written += 1
          i += len
        } else {
          w.putByte(EscapeCode)
          w.putByte(src(i) & 0xff)
          written += 2
          i += 1
        }
      }
      written
    }

    /** Exact encoded size without materializing (for the selector). */
    def encodedSize(src: Array[Byte]): Int = {
      var size = 0
      var i = 0
      val n = src.length
      while (i < n) {
        var len = math.min(maxLenV, n - i)
        var code = -1
        while (len >= 1 && code < 0) {
          if (lookup.containsKey(key(src, i, len))) code = 0 else len -= 1
        }
        if (code >= 0) { size += 1; i += len }
        else { size += 2; i += 1 }
      }
      size
    }

    def decode(src: Array[Byte], off: Int, encLen: Int, decLen: Int): Array[Byte] = {
      val out = new Array[Byte](decLen)
      var i = off
      val end = off + encLen
      var o = 0
      while (i < end) {
        val c = src(i) & 0xff
        if (c == EscapeCode) {
          out(o) = src(i + 1)
          o += 1
          i += 2
        } else {
          val sym = symbols(c)
          System.arraycopy(sym, 0, out, o, sym.length)
          o += sym.length
          i += 1
        }
      }
      require(o == decLen, s"FSST decode produced $o bytes, expected $decLen")
      out
    }

    def writeTo(w: BlockWriter): Unit = {
      w.putByte(symbols.length)
      var c = 0
      while (c < symbols.length) {
        w.putByte(symbols(c).length)
        w.putBytes(symbols(c))
        c += 1
      }
    }
  }

  def readTable(r: BlockReader): SymbolTable = {
    val n = r.getByte()
    val syms = new Array[Array[Byte]](n)
    var c = 0
    while (c < n) { syms(c) = r.getBytes(r.getByte()); c += 1 }
    new SymbolTable(syms)
  }

  /** Train a symbol table on a sample of the chunk's bytes: start from
    * single-byte frequency, then iteratively re-segment with the current
    * table and promote frequent adjacent-symbol concatenations (gain =
    * frequency x length, as in the FSST paper's bottom-up construction).
    */
  def train(strings: Array[String], n: Int): SymbolTable = {
    // build the bounded sample
    var total = 0
    val sample = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n && total < SampleCap) {
      val b = strings(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val take = math.min(b.length, SampleCap - total)
      sample.write(b, 0, take)
      total += take
      i += 1
    }
    val s = sample.toByteArray
    if (s.isEmpty) return new SymbolTable(Array.empty)

    var table = new SymbolTable(Array.empty)
    var iter = 0
    while (iter < TrainIterations) {
      val gains = new java.util.HashMap[String, Long]()
      // segment the sample with the current table, counting symbols and
      // adjacent-pair concatenations
      var pos = 0
      var prevStart = -1
      var prevLen = 0
      while (pos < s.length) {
        var len = math.min(table.maxLen, s.length - pos)
        var matched = -1
        // longest match against current table (or literal byte)
        while (len >= 1 && matched < 0) {
          if (table.codeOf(s, pos, len) >= 0) matched = len else len -= 1
        }
        val segLen = if (matched > 0) matched else 1
        bump(gains, s, pos, segLen)
        if (prevStart >= 0 && prevLen + segLen <= MaxSymbolLen)
          bump(gains, s, prevStart, prevLen + segLen)
        prevStart = pos
        prevLen = segLen
        pos += segLen
      }
      // take top-255 by gain
      val entries = new java.util.ArrayList(gains.entrySet())
      entries.sort((a, b) => java.lang.Long.compare(b.getValue, a.getValue))
      val m = math.min(MaxSymbols, entries.size)
      val syms = new Array[Array[Byte]](m)
      var k = 0
      while (k < m) {
        syms(k) = latin1Bytes(entries.get(k).getKey)
        k += 1
      }
      table = new SymbolTable(syms)
      iter += 1
    }
    table
  }

  @inline private def latin1Bytes(key: String): Array[Byte] = {
    val out = new Array[Byte](key.length)
    var i = 0
    while (i < key.length) { out(i) = key.charAt(i).toByte; i += 1 }
    out
  }

  @inline private def bump(m: java.util.HashMap[String, Long], s: Array[Byte], off: Int, len: Int): Unit = {
    val cs = new Array[Char](len)
    var i = 0
    while (i < len) { cs(i) = (s(off + i) & 0xff).toChar; i += 1 }
    val k = new String(cs)
    val cur = m.get(k)
    // gain = freq * len: every occurrence saves (len - 1) bytes vs literals,
    // and len weighting matches the paper's apparent-gain heuristic
    m.put(k, (if (cur == null) 0L else cur) + len)
  }
}
